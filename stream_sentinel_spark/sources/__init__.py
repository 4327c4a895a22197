from stream_sentinel_spark.sources.batch import (
    TABLES,
    events_from_json,
    load_table,
    load_tables,
    register_tables,
)

__all__ = ["TABLES", "load_table", "load_tables", "events_from_json", "register_tables"]
