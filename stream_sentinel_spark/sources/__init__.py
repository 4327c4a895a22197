from stream_sentinel_spark.sources.batch import TABLES, load_table, load_tables, events_from_json

__all__ = ["TABLES", "load_table", "load_tables", "events_from_json"]
