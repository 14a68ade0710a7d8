"""M6: capacity model — ridge regression of max sustainable throughput on
scale-out.

Reference (/root/reference/analytics/app/recoverytime/models.py:20-31):
``RidgeCV()`` fit on (scale_outs -> max_throughput_rates), trained from the
backpressured profile rows only (one capacity ceiling per scale-out, <= 8
rows). sklearn is unavailable; the closed-form LOO-CV ridge in
``phoebe_spark.functions.numeric.ridge_cv`` reproduces RidgeCV's default
alpha grid (0.1, 1, 10) and intercept handling.
"""

from __future__ import annotations

import numpy as np

from phoebe_spark.functions.numeric import ridge_cv


class CapacityModel:
    def __init__(self):
        self.coef: np.ndarray | None = None
        self.intercept: float = 0.0
        self.alpha: float | None = None

    def fit(self, scale_outs, max_throughput_rates) -> None:
        X = np.asarray(scale_outs, dtype=float).reshape(-1, 1)
        y = np.asarray(max_throughput_rates, dtype=float).reshape(-1)
        self.coef, self.intercept, self.alpha = ridge_cv(X, y)

    def predict(self, scale_outs) -> np.ndarray:
        if self.coef is None:
            raise RuntimeError("not fitted")
        X = np.asarray(scale_outs, dtype=float).reshape(-1, 1)
        return X @ self.coef + self.intercept
