from stream_sentinel_spark.sources.batch import (
    TABLES,
    events_from_json,
    load_table,
    load_tables,
    register_tables,
)
from stream_sentinel_spark.sources.optimize import (
    optimize_parquet_dir,
    recover_optimize,
)
from stream_sentinel_spark.sources.skipping import (
    file_bloom_maps,
    file_zone_maps,
    prune_files,
    prune_files_bloom,
    read_pruned,
    read_pruned_bloom,
    refresh_bloom_maps,
    refresh_zone_maps,
)

__all__ = [
    "TABLES",
    "events_from_json",
    "file_bloom_maps",
    "file_zone_maps",
    "load_table",
    "load_tables",
    "optimize_parquet_dir",
    "prune_files",
    "prune_files_bloom",
    "read_pruned",
    "read_pruned_bloom",
    "recover_optimize",
    "refresh_bloom_maps",
    "refresh_zone_maps",
    "register_tables",
]
