"""M8: TWRES baseline — Time Window Resource Elasticity Scaling.

Reference (/root/reference/analytics/app/baselines/models.py:15-77):
- MST curve: y ≈ 1 / [1, 1/x, x, x²] · c fitted with NNLS (``mst_fmap``
  is the elementwise reciprocal of the Vandermonde-ish matrix, so the
  feature columns are [1, x, 1/x, 1/x²]).
- MSTW = MST · time_window_interval.
- predict: sum the forecast workload over the window; pick the minimum
  scale-out with MSTW > load (F6 first-match), else argmax(MSTW - load);
  if current capacity suffices but the latency SLA is violated, bump
  scale_out + 1.
"""

from __future__ import annotations

import numpy as np

from phoebe_spark.functions.numeric import nnls
from phoebe_spark.models.workload import WorkloadForecaster


def mst_fmap(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=float).reshape(-1)
    return 1.0 / np.column_stack([np.ones_like(x), 1.0 / x, x, x**2])


class TwresModel:
    def __init__(self):
        self.mst_coeffs: np.ndarray | None = None

    def fit(self, scale_outs, throughput_rates) -> None:
        A = mst_fmap(scale_outs)
        self.mst_coeffs, _ = nnls(A, np.asarray(throughput_rates, dtype=float).reshape(-1))

    def calculate_mstw(self, scale_outs, time_interval: float) -> np.ndarray:
        return mst_fmap(scale_outs) @ self.mst_coeffs * time_interval

    def min_opt_scale_out(self, throughput: float, min_so: int, max_so: int,
                          time_window_interval: float) -> int:
        test = list(range(min_so, max_so + 1))
        mstw = self.calculate_mstw(test, time_window_interval).reshape(-1)
        over = [i for i, m in enumerate(mstw) if m > throughput]
        if over:
            return test[over[0]]
        return test[int(np.argmax(mstw - throughput))]

    def predict(
        self,
        forecaster: WorkloadForecaster,
        past_ts: np.ndarray,
        past_vals: np.ndarray,
        current_scale_out: int,
        min_scale_out: int,
        max_scale_out: int,
        time_window_interval: int,
        avg_latency: float,
        max_latency_constraint: float,
    ) -> int:
        _, fut_vals = forecaster.predict(past_ts, past_vals, int(time_window_interval))
        pred_throughput = float(np.sum(fut_vals))
        min_opt = self.min_opt_scale_out(
            pred_throughput, min_scale_out, max_scale_out, time_window_interval
        )
        mstw_current = float(self.calculate_mstw([current_scale_out], time_window_interval)[0])
        if pred_throughput >= mstw_current:
            return min_opt
        if avg_latency > max_latency_constraint:
            return current_scale_out + 1
        return min_opt
