from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")


@pytest.fixture(scope="session")
def spark():
    from fuzzy_dedupe_pipeline_spark.session import get_spark

    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from fuzzy_dedupe_pipeline_spark.synth import generate_pages

    return generate_pages(n_docs=400, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(corpus.pages, schema=schema)
