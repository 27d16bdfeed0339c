"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + extensions).
``oracle_sql()`` — DuckDB-equivalent SQL per query (the t2 gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_connect_storage_cloud_formats_spark.session import apply_session_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full pipeline (envelope → partitioned ORC →
    read-back) followed by an aggregation over the written files."""
    apply_session_confs(spark)
    from kafka_connect_storage_cloud_formats_spark.queries.pipeline_queries import orc_ingest_roundtrip

    return orc_ingest_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_connect_storage_cloud_formats_spark.queries.registry import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from kafka_connect_storage_cloud_formats_spark.queries.registry import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
