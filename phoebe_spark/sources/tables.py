"""Profile / prediction stores and testdata table loading (SURVEY S4-S6).

The reference keeps profiling results in SQLite tables
(``managers/DataManager.java:150-160`` (profiles DDL), ``:220-228``
(predictions DDL)), inserts per profiling round (``addProfile :172-183``,
``addPrediction :233-242``), deletes by (expId, genType[, isBckPres])
predicate (``initProfiles :162-167``, ``deleteRow :210-214``,
``initPredictions :230``) and reads them back with filtered, ordered
SELECTs (``getProfiles :185-208``, ``getPredictions :244-266``).

Spark-first mapping: every reference delete predicate is exactly
(expId, genType[, isBckPres]) — so the tables are parquet tables
PARTITIONED BY those columns and "DELETE WHERE <predicate>" becomes a
static-partition ``INSERT OVERWRITE`` with empty input, a partition-level
file swap that never rewrites surviving rows. The same layout makes the
reference's ``WHERE expId IN (…) AND genType = ?`` reads partition-pruned:
at 100 TB of accumulated profiles a round touches only its own partition
directories. (``ALTER TABLE … DROP PARTITION`` is metastore-only in this
container's in-memory catalog, hence the overwrite form.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# column order matches the reference DDL; partition columns go last in the
# Spark table schema, SELECT helpers restore the reference order
PROFILE_COLS = (
    "expId", "genType", "jobName", "scaleOut", "avgLat", "avgThr",
    "isBckPres", "startTs", "stopTs",
)
PREDICTION_COLS = (
    "expId", "genType", "timestamp", "scaleOut", "avgThr", "avgLat", "recTime",
)

# reference-order row schemas (DataManager DDL order), used for building
# row DataFrames driver-side
PROFILES_SCHEMA = (
    "expId INT, genType STRING, jobName STRING, scaleOut INT, "
    "avgLat DOUBLE, avgThr DOUBLE, isBckPres INT, startTs LONG, stopTs LONG"
)
PREDICTIONS_SCHEMA = (
    "expId INT, genType STRING, timestamp LONG, scaleOut INT, "
    "avgThr DOUBLE, avgLat DOUBLE, recTime DOUBLE"
)

PROFILES_DDL = (
    "jobName STRING, scaleOut INT, avgLat DOUBLE, avgThr DOUBLE, "
    "startTs LONG, stopTs LONG, expId INT, genType STRING, isBckPres INT"
)
PREDICTIONS_DDL = (
    "timestamp LONG, scaleOut INT, avgThr DOUBLE, avgLat DOUBLE, "
    "recTime DOUBLE, expId INT, genType STRING"
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _ident(gen_type: str) -> str:
    """Validate a genType partition value before SQL interpolation: the
    reference's generator names are simple identifiers (SINE, CARS...);
    anything else (quotes, spaces) would break or inject into the
    statement text."""
    if not gen_type.replace("_", "").replace("-", "").isalnum():
        raise ValueError(f"invalid genType for SQL literal: {gen_type!r}")
    return gen_type


def _in_list(exp_ids: list[int]) -> str:
    """Render an IN (...) list; empty input would otherwise produce the
    invalid SQL `IN ()`."""
    if not exp_ids:
        raise ValueError("exp_ids must be non-empty (empty IN () is invalid SQL)")
    return ", ".join(str(int(i)) for i in exp_ids)


def create_profile_store(spark: SparkSession, path: str | None = None) -> None:
    """CREATE TABLE IF NOT EXISTS for profiles/predictions
    (``DataManager.java:148-160, 218-228``), partitioned by the delete/
    lookup keys."""
    ploc = f" LOCATION '{path}/profiles'" if path else ""
    qloc = f" LOCATION '{path}/predictions'" if path else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS profiles ({PROFILES_DDL}) USING parquet "
        f"PARTITIONED BY (expId, genType, isBckPres){ploc}"
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS predictions ({PREDICTIONS_DDL}) USING parquet "
        f"PARTITIONED BY (expId, genType){qloc}"
    )


def insert_profiles(spark: SparkSession, rows: list[tuple] | DataFrame) -> None:
    """``addProfile`` (``DataManager.java:172-183``): append rows given in
    the reference column order (expId, genType, jobName, scaleOut, avgLat,
    avgThr, isBckPres, startTs, stopTs)."""
    df = rows if isinstance(rows, DataFrame) else spark.createDataFrame(rows, PROFILES_SCHEMA)
    # reorder to table layout (data cols then partition cols)
    df.select(
        "jobName", "scaleOut", "avgLat", "avgThr", "startTs", "stopTs",
        "expId", "genType", "isBckPres",
    ).write.insertInto("profiles", overwrite=False)


def delete_profiles(
    spark: SparkSession, exp_id: int, gen_type: str, is_bck_pres: int | None = None
) -> None:
    """``DELETE FROM profiles WHERE expId=? AND genType=? [AND isBckPres=?]``
    (``DataManager.java:162-167`` without isBckPres, ``:210-214`` with) as a
    partition-level clear: static-partition INSERT OVERWRITE with empty
    input swaps out exactly the matching directories."""
    gen_type = _ident(gen_type)
    flags = [0, 1] if is_bck_pres is None else [int(is_bck_pres)]
    for flag in flags:
        spark.sql(
            "INSERT OVERWRITE TABLE profiles "
            f"PARTITION (expId={int(exp_id)}, genType='{gen_type}', isBckPres={flag}) "
            "SELECT CAST(NULL AS STRING), CAST(NULL AS INT), CAST(NULL AS DOUBLE), "
            "CAST(NULL AS DOUBLE), CAST(NULL AS LONG), CAST(NULL AS LONG) WHERE 1 = 0"
        )


def select_profiles(spark: SparkSession, exp_ids: list[int], gen_type: str) -> DataFrame:
    """``SELECT … WHERE expId IN (…) AND genType = ? ORDER BY scaleOut ASC,
    stopTs ASC`` (``DataManager.java:185-208``). Partition-pruned by
    layout."""
    ids = _in_list(exp_ids)
    cols = ", ".join(PROFILE_COLS)
    return spark.sql(
        f"SELECT {cols} FROM profiles WHERE expId IN ({ids}) AND genType = '{_ident(gen_type)}' "
        "ORDER BY scaleOut ASC, stopTs ASC"
    )


def insert_prediction(
    spark: SparkSession,
    exp_id: int,
    gen_type: str,
    timestamp: int,
    scale_out: int,
    avg_thr: float,
    avg_lat: float,
    rec_time: float,
) -> None:
    """``addPrediction`` (``DataManager.java:233-242``): one decision row
    per rescale evaluation (``Graph.java:275``)."""
    spark.createDataFrame(
        [(int(exp_id), gen_type, int(timestamp), int(scale_out),
          float(avg_thr), float(avg_lat), float(rec_time))],
        PREDICTIONS_SCHEMA,
    ).select(
        "timestamp", "scaleOut", "avgThr", "avgLat", "recTime", "expId", "genType"
    ).write.insertInto("predictions", overwrite=False)


def delete_predictions(spark: SparkSession, exp_id: int, gen_type: str) -> None:
    """``initPredictions(removePrevious=true)`` (``DataManager.java:230``)."""
    spark.sql(
        "INSERT OVERWRITE TABLE predictions "
        f"PARTITION (expId={int(exp_id)}, genType='{_ident(gen_type)}') "
        "SELECT CAST(NULL AS LONG), CAST(NULL AS INT), CAST(NULL AS DOUBLE), "
        "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) WHERE 1 = 0"
    )


def select_predictions(spark: SparkSession, exp_ids: list[int]) -> DataFrame:
    """``SELECT … WHERE expId IN (…) ORDER BY expId ASC, timestamp ASC``
    (``DataManager.java:244-266``)."""
    ids = _in_list(exp_ids)
    cols = ", ".join(PREDICTION_COLS)
    return spark.sql(
        f"SELECT {cols} FROM predictions WHERE expId IN ({ids}) "
        "ORDER BY expId ASC, timestamp ASC"
    )


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver's parquet tables and register temp views. Filters and
    projections over these push down to the parquet scan (check
    ``PushedFilters`` / ``ReadSchema`` in ``.explain``).

    Routed through :func:`phoebe_spark.sources.testdata.load_table` so the
    canonical column contract holds here too — in particular ``events.ts``
    is epoch-nanos BIGINT whatever the parquet's physical timestamp type."""
    from phoebe_spark.sources.testdata import load_table

    out = {}
    for name in names or TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
