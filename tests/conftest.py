"""Shared fixtures: one session-scoped SparkSession (JVM start is ~20s)."""

import pytest


@pytest.fixture(scope="session")
def spark():
    from horizon_ocr_python_spark.engine.session import build_session

    spark = build_session(master="local[4]", app_name="hsp-tests",
                          shuffle_partitions=8)
    yield spark
    spark.stop()
