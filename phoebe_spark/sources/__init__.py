from phoebe_spark.sources.csv import read_timeseries_csv, write_timeseries_csv
from phoebe_spark.sources.tables import (
    PROFILES_SCHEMA,
    PREDICTIONS_SCHEMA,
    create_profile_store,
    load_tables,
)

__all__ = [
    "read_timeseries_csv",
    "write_timeseries_csv",
    "PROFILES_SCHEMA",
    "PREDICTIONS_SCHEMA",
    "create_profile_store",
    "load_tables",
]
