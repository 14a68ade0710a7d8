from phoebe_spark.plans.control_loop import (
    best_scale_out,
    best_scale_out_by_min_value,
    optimize_step,
)

__all__ = ["best_scale_out", "best_scale_out_by_min_value", "optimize_step"]
