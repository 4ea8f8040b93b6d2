from __future__ import annotations

import pytest

from entity_resolution_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="er-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_pages(spark):
    from entity_resolution_pipeline_spark.sources.synth import synth_pages

    return synth_pages(spark, 120).cache()


@pytest.fixture(scope="session")
def tiny_extracted(tiny_pages):
    from entity_resolution_pipeline_spark.operators.extract import extract_fields

    return extract_fields(tiny_pages).cache()
