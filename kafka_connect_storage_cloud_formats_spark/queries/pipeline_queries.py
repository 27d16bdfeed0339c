"""Oracle-gated queries that exercise the ingest pipeline itself.

These make the core reference semantics (envelope → ORC → read-back,
SURVEY.md §2.1) part of the driver's hash-checked surface: the Spark side
physically writes and re-reads ORC files, the oracle computes the same
aggregate straight from the source table — they match only if the pipeline
is lossless.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_storage_cloud_formats_spark.catalog import load_table
from kafka_connect_storage_cloud_formats_spark.pipeline import IngestPipeline
from kafka_connect_storage_cloud_formats_spark.queries.relational import dsum
from kafka_connect_storage_cloud_formats_spark.sources.kafka_envelope import with_kafka_envelope

EVENTS_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _run_events_pipeline(spark: SparkSession, sf_dir: str, parity: bool) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # modular partitioner so the oracle can reproduce partition assignment in SQL
    env = with_kafka_envelope(
        events,
        topic="events",
        num_partitions=3,
        partition_key="user_id",
        order_col="event_id",
        partitioner="mod",
    )
    # per-process dir (pid token): repeated runs inside one process (bench
    # min-of-2) reuse + overwrite, while a fresh checker process can never
    # read stale files from an earlier run
    out = os.path.join(
        tempfile.gettempdir(),
        f"engine_orc_roundtrip_{'parity' if parity else 'native'}_"
        + os.path.basename(os.path.normpath(sf_dir))
        + f"_{os.getpid()}",
    )
    pipe = IngestPipeline(
        out, EVENTS_VALUE_SCHEMA, flush_size=10_000, parity_naming=parity
    )
    pipe.run_batch(env)
    return pipe.read_back(spark)


def orc_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference pipeline end-to-end (parity naming), then aggregate the
    written ORC files. Matches the oracle only if no row/value was lost."""
    back = _run_events_pipeline(spark, sf_dir, parity=True)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_event_id"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


# NOTE: every integer SUM below is CAST(... AS BIGINT). DuckDB's SUM over an
# integer type yields HUGEINT (int128), which a pandas/arrow fetch renders as
# float64 ("123.0") and breaks the value-hash against Spark's bigint ("123") —
# this was the root cause of all 8 round-1 driver hash mismatches.
ORC_ROUNDTRIP_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def orc_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native sink variant (Hive-style ``partition=N`` layout) with a
    partition-pruned read-back: only topic-partition 1 is scanned."""
    back = _run_events_pipeline(spark, sf_dir, parity=False)
    return (
        back.filter(F.col("partition") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("sum_event_id"))
        .orderBy("event_type")
    )


ORC_PARTITIONED_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events
WHERE user_id % 3 = 1
GROUP BY event_type
ORDER BY event_type
"""


def _format_roundtrip(spark: SparkSession, sf_dir: str, fmt: str, compression: str) -> DataFrame:
    """Write events through a sibling family format and aggregate the
    read-back. JSON/CSV carry only integer/string columns (text float
    round-trips are representation-hazardous by design — columnar formats
    are the value-bearing path)."""
    from kafka_connect_storage_cloud_formats_spark.sinks.formats import (
        read_back,
        write_partitioned,
    )

    events = load_table(spark, sf_dir, "events")
    env = with_kafka_envelope(
        events,
        topic="events",
        num_partitions=3,
        partition_key="user_id",
        order_col="event_id",
        partitioner="mod",
    )
    cols = ["partition", "event_id", "user_id", "event_type"]
    if fmt in ("orc", "parquet"):
        cols.append("value")
    out = os.path.join(
        tempfile.gettempdir(),
        f"engine_{fmt}_roundtrip_"
        + os.path.basename(os.path.normpath(sf_dir))
        + f"_{os.getpid()}",
    )
    write_partitioned(env.select(*cols), out, fmt=fmt, compression=compression)
    back = read_back(spark, out, fmt=fmt)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_event_id"),
        F.countDistinct("user_id").alias("n_users"),
    ]
    if "value" in cols:
        aggs.append(dsum("value").alias("total_value"))
    return back.groupBy("event_type").agg(*aggs).orderBy("event_type")


def parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "parquet", "zstd")


PARQUET_ROUNDTRIP_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "json", "gzip")


JSON_ROUNDTRIP_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""
