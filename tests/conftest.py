"""Shared Spark fixture: one local session per test run."""

import pytest


@pytest.fixture(scope="session")
def spark():
    from navigator_document_parser_spark.config import build_spark

    s = build_spark(
        app_name="ndps-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()
