"""M4-M5: latency model — two-cluster latency classifier + boosted-tree
latency regressor, evaluated on a scale-out candidate grid.

Reference (/root/reference/analytics/app/latency/models.py):
- clustering (``:39-45``): RobustScaler(quantile_range=(0,1)) on latencies ->
  log(max(1, x)) -> Birch(n_clusters=2); cluster ids relabeled so label 0 is
  the low-latency cluster (``:56-84`` orders clusters and checks max(c0) <
  min(c1)).
- regressor (``:47-54``): StandardScaler on (scale_outs, throughput_rates) ->
  GradientBoostingRegressor(max_depth=10, n_estimators=3*len(data)).
- fit (``:86-114``): optional append of previous training data.
- predict/evaluate (``:116-148``): candidate grid over the scale-out range
  (replicated request row), dropDuplicates on scale_outs, regressor predicts
  latency, clusterer predicts class, ResponseFinalizer with restriction=1
  (class must be 'low') marks validity/best.

MLlib mapping (no sklearn in container): Birch -> BisectingKMeans(k=2) —
same two-cluster low/high-latency intent; GradientBoostingRegressor ->
GBTRegressor (maxIter capped; 3*n trees on tiny profile tables is the
reference's intent of "enough capacity to memorize", not a tuned number).
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.clustering import BisectingKMeans
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ESTIMATOR_FACTOR = 3


class LatencyModel:
    def __init__(self):
        self.cluster_model = None
        self.regressor_model = None
        self.scaler_model = None
        self.label_map: dict[int, int] = {}
        self.previous_data: DataFrame | None = None

    # -- fit ---------------------------------------------------------------
    def fit(self, df: DataFrame, append: bool = False) -> None:
        """``df`` columns: scale_outs INT, throughput_rates DOUBLE,
        latencies DOUBLE. With ``append=True`` previous training data is
        concatenated first (latency/models.py:89-90, U1)."""
        if append and self.previous_data is not None:
            df = self.previous_data.unionByName(df)
        df = df.cache()
        n = df.count()
        # Profile tables are O(scale-outs x profiling rounds) rows (the
        # reference trains on ~60-row profiles), but arrive partitioned at
        # the session default — and GBT schedules its boosting jobs per
        # iteration over EVERY input partition, so dozens of iterations x
        # 32 near-empty partitions is pure scheduler overhead. Pack the
        # training rows into ceil(n/5000) partitions (size-derived, not a
        # local[32] constant: a genuinely large profile table keeps its
        # parallelism). Round-12: the pack is a bare narrow coalesce OVER
        # the cached parent — the previous unpersist + re-cache +
        # re-count + rdd.getNumPartitions probe re-materialized the frame
        # a second time and cost ~5 s of m4's ~12 s (phase profile in
        # OPTIMIZATION_r12.md); coalesce never increases partition count,
        # so the guard was redundant.
        target_parts = max(1, -(-n // 5000))
        df = df.coalesce(target_parts)
        self.previous_data = df

        # clustering features: RobustScaler(quantile_range=(0.0, 1.0)) on
        # latencies then log-clamp (latency/models.py:39-45 + :56-58).
        # sklearn quantile_range is in PERCENTILE units: scale = spread
        # between the 0th and 1st percentile, center = median — so the
        # feature is distance-above-median in units of the bottom-1% spread.
        qs = df.agg(
            F.expr("percentile(latencies, 0.0)").alias("q0"),
            F.expr("percentile(latencies, 0.01)").alias("q1"),
            F.expr("percentile(latencies, 0.5)").alias("med"),
        ).collect()[0]
        scale = max(qs["q1"] - qs["q0"], 1e-9)
        feat = df.withColumn(
            "_lat_feat",
            F.log(F.greatest(F.lit(1.0), (F.col("latencies") - F.lit(qs["med"])) / F.lit(scale))),
        )
        assembler = VectorAssembler(inputCols=["_lat_feat"], outputCol="_cl_features")
        feat_v = assembler.transform(feat)
        bkm = BisectingKMeans(k=2, featuresCol="_cl_features", predictionCol="_cluster", seed=42)
        self.cluster_model = bkm.fit(feat_v)

        # relabel so cluster 0 = low latency (latency/models.py:60-84)
        labeled = self.cluster_model.transform(feat_v)
        stats = (
            labeled.groupBy("_cluster")
            .agg(F.min("latencies").alias("mn"), F.max("latencies").alias("mx"))
            .orderBy("mn")
            .collect()
        )
        self.label_map = {int(r["_cluster"]): i for i, r in enumerate(stats)}
        self._cluster_meta = {"q0": qs["q0"], "q1": qs["q1"], "med": qs["med"], "scale": scale}

        # regressor: standard-scale (scale_outs, throughput_rates) -> GBT
        reg_assembler = VectorAssembler(
            inputCols=["scale_outs", "throughput_rates"], outputCol="_raw_features"
        )
        scaler = StandardScaler(
            inputCol="_raw_features", outputCol="_features", withMean=True, withStd=True
        )
        reg_v = reg_assembler.transform(df)
        self.scaler_model = scaler.fit(reg_v)
        scaled = self.scaler_model.transform(reg_v)
        gbt = GBTRegressor(
            featuresCol="_features",
            labelCol="latencies",
            maxDepth=10,
            maxIter=min(ESTIMATOR_FACTOR * n, 200),
            seed=42,
        )
        self.regressor_model = gbt.fit(scaled)

    # -- predict -----------------------------------------------------------
    def _score(self, grid: DataFrame) -> DataFrame:
        """Attach predicted latency + relabeled latency class to a grid with
        columns (scale_outs, throughput_rates)."""
        reg_assembler = VectorAssembler(
            inputCols=["scale_outs", "throughput_rates"], outputCol="_raw_features"
        )
        scored = self.regressor_model.transform(
            self.scaler_model.transform(reg_assembler.transform(grid))
        ).withColumnRenamed("prediction", "latency")
        m = self._cluster_meta
        feat = scored.withColumn(
            "_lat_feat",
            F.log(F.greatest(F.lit(1.0), (F.col("latency") - F.lit(m["med"])) / F.lit(m["scale"]))),
        )
        assembler = VectorAssembler(inputCols=["_lat_feat"], outputCol="_cl_features")
        clustered = self.cluster_model.transform(assembler.transform(feat))
        mapping = F.create_map(
            *[x for k, v in self.label_map.items() for x in (F.lit(k), F.lit(v))]
        )
        return clustered.withColumn("latency_class", mapping[F.col("_cluster")]).select(
            "scale_outs", "throughput_rates", "latency", "latency_class"
        )

    def predict(
        self,
        spark: SparkSession,
        throughput_rate: float,
        min_scale_out: int,
        max_scale_out: int,
        previously_valid: list[int] | None = None,
    ) -> DataFrame:
        """Candidate-grid evaluation (latency/models.py:116-148): replicate
        the request across the scale-out range (J4), dedupe (A14), score,
        and finalize — validity = latency_class < 1, i.e. the candidate must
        fall in the low-latency cluster, AND membership in previously_valid
        (common/schemes.py:47-48); best = first valid by scale_out."""
        grid = (
            spark.range(min_scale_out, max_scale_out + 1)
            .select(F.col("id").cast("int").alias("scale_outs"))
            .withColumn("throughput_rates", F.lit(float(throughput_rate)))
            .dropDuplicates(["scale_outs"])
        )
        scored = self._score(grid)
        valid = F.col("latency_class") < 1
        if previously_valid is not None:
            valid = valid & F.col("scale_outs").isin(*[int(s) for s in previously_valid])
        out = scored.withColumn("is_valid", valid)
        w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        first_valid = F.min(F.when(F.col("is_valid"), F.col("scale_outs"))).over(
            Window.orderBy("scale_outs").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        return out.withColumn(
            "is_best", F.col("is_valid") & (F.col("scale_outs") == first_valid)
        )
