from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    import tempfile

    session = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stream-sentinel-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        # the full suite compiles hundreds of generated stages; the JVM's
        # default 240 MB code cache overflows and JIT stalls make test
        # times swing 3-5x (see bench.py build_spark)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_wh_"))
        .getOrCreate()
    )
    yield session
    session.stop()
