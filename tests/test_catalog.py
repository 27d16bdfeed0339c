"""Catalog loader contract: the TIMESTAMP(NANOS) events table must be
read under a UTC session or fail loudly (round-3 advice: never silently
shift values, never silently mutate the caller's session timezone)."""

import pytest

from kafka_connect_storage_cloud_formats_spark.catalog import load_table


def test_events_load_raises_under_foreign_timezone(spark, sf_dir):
    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)
    assert orig == "UTC"  # session factory pins it
    try:
        spark.conf.set(tz_key, "America/New_York")
        with pytest.raises(ValueError, match="UTC"):
            load_table(spark, sf_dir, "events")
        # the loader must not have flipped the session behind our back
        assert spark.conf.get(tz_key) == "America/New_York"
    finally:
        spark.conf.set(tz_key, orig)
    # back under UTC the same call succeeds
    assert load_table(spark, sf_dir, "events").columns


def test_spread_guarded_repartition(spark, sf_dir):
    """spread() redistributes an under-parallel source up to the core
    count, preserves rows exactly, and is a NO-OP when the source already
    meets the session's parallelism (the 100 TB case — it must never add
    a shuffle there)."""
    from kafka_connect_storage_cloud_formats_spark.catalog import spread

    cores = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < cores  # single-row-group fixture
    out = spread(docs)
    assert out.rdd.getNumPartitions() == cores
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # already-parallel source: the SAME DataFrame comes back (no shuffle)
    wide = docs.repartition(cores + 4)
    assert spread(wide) is wide
