from phoebe_spark.sources import jsonl, layout, orc, prometheus, testdata  # noqa: F401
from phoebe_spark.sources.csv import read_timeseries_csv, write_timeseries_csv
from phoebe_spark.sources.tables import (
    PROFILES_SCHEMA,
    PREDICTIONS_SCHEMA,
    create_profile_store,
    delete_predictions,
    delete_profiles,
    insert_prediction,
    insert_profiles,
    load_tables,
    select_predictions,
    select_profiles,
)

__all__ = [
    "read_timeseries_csv",
    "write_timeseries_csv",
    "PROFILES_SCHEMA",
    "PREDICTIONS_SCHEMA",
    "create_profile_store",
    "insert_profiles",
    "delete_profiles",
    "select_profiles",
    "insert_prediction",
    "delete_predictions",
    "select_predictions",
    "load_tables",
]
