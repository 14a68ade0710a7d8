"""Profile / prediction stores and testdata table loading (SURVEY S4-S6).

The reference keeps profiling results in SQLite tables
(``managers/DataManager.java:150-160`` (profiles DDL), ``:220-228``
(predictions DDL)) and queries them with filtered, ordered SELECTs
(``:183-208, 244-266``). Here they are Spark SQL tables (parquet-backed
temp views locally; saveAsTable on a cluster) with the same column names,
so the reference's SQL runs verbatim through ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROFILES_SCHEMA = (
    "expId INT, genType STRING, jobName STRING, scaleOut INT, "
    "avgLat DOUBLE, avgThr DOUBLE, isBckPres INT, startTs LONG, stopTs LONG"
)

PREDICTIONS_SCHEMA = (
    "expId INT, genType STRING, timestamp LONG, scaleOut INT, "
    "avgThr DOUBLE, avgLat DOUBLE, recTime DOUBLE"
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def create_profile_store(spark: SparkSession, path: str | None = None) -> None:
    """CREATE TABLE IF NOT EXISTS for profiles/predictions
    (``DataManager.java:148-160, 218-228``)."""
    loc = f" LOCATION '{path}'" if path else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS profiles ({PROFILES_SCHEMA}) USING parquet{loc}"
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS predictions ({PREDICTIONS_SCHEMA}) USING parquet{loc}"
    )


def select_profiles(spark: SparkSession, exp_ids: list[int], gen_type: str) -> DataFrame:
    """``SELECT … WHERE expId IN (…) AND genType = ? ORDER BY scaleOut ASC,
    stopTs ASC`` (``DataManager.java:183-208``)."""
    ids = ", ".join(str(int(i)) for i in exp_ids)
    return spark.sql(
        f"SELECT * FROM profiles WHERE expId IN ({ids}) AND genType = '{gen_type}' "
        "ORDER BY scaleOut ASC, stopTs ASC"
    )


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver's parquet tables and register temp views. Filters and
    projections over these push down to the parquet scan (check
    ``PushedFilters`` / ``ReadSchema`` in ``.explain``)."""
    out = {}
    for name in names or TESTDATA_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
