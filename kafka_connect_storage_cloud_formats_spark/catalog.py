"""Test-data catalog: load the driver's parquet tables and register SQL views.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file/dir each under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (Spark rejects it
        # natively → read nanos-as-long and rebuild) and as µs TIMESTAMP_NTZ
        # (watermarks/window ops require TIMESTAMP → reinterpret under the
        # UTC session zone, value-identical). Normalize both to TimestampType.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Integer DIV, not `/`: ns epochs exceed 2^53, so double division
            # rounds and shifts some timestamps by ±1 µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # The NTZ→TZ cast reinterprets wall-clock values in the session
            # timezone — value-identical ONLY under UTC. session.py pins it;
            # a caller with a foreign-zone session must not get silently
            # shifted timestamps (nor, per the round-3 advice, have their
            # session timezone mutated behind their back as the old code
            # did) — fail loudly and let the caller choose.
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz != "UTC":
                raise ValueError(
                    f"events.ts is TIMESTAMP_NTZ (UTC wall-clock); reading it "
                    f"under session timezone {tz!r} would shift every value. "
                    'Set spark.sql.session.timeZone=UTC (session.get_spark does).'
                )
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition an UNDER-PARALLEL source up to the session's
    core count — and a no-op otherwise.

    Why: heavy per-row derivations (tokenize→shingle→hash chains over
    documents) run map-side in the scan's parallelism. A source whose
    files can't split (single-row-group parquet, gzip) yields fewer
    partitions than cores, serializing the derivation on one task while
    the rest of the executor idles. The guard makes this a pure local-fix:
    at 100 TB a scan has orders of magnitude more splits than the cluster
    has cores, the condition is false, and NO shuffle is ever added to the
    at-scale plan. The repartition, when it does fire, moves only the
    source rows (cheap by the same premise that made the scan one split).

    Apply at the SCAN, before the derivation — repartitioning the derived
    stream would run the expensive derivation single-threaded first and
    parallelize only what comes after it.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
