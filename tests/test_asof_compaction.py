"""Unit semantics for the as-of join and compaction operators on crafted
micro-inputs — the driver oracle covers them end-to-end on the events
table; these pin the boundary cases the synthetic corpus may never hit
(exact-timestamp ties, keys with no right rows, replayed duplicates)."""

from datetime import datetime

from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.operators.asof import asof_join


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 9, minute)


def test_asof_join_at_or_before_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(5), "early-click"),    # before any purchase → NULL
            (1, _ts(10), "same-instant"),  # exactly at purchase ts → matched (≤)
            (1, _ts(30), "after-two"),     # latest of two purchases wins
            (2, _ts(50), "other-user"),    # user 2 must not see user 1's rows
            (3, _ts(50), "no-purchases"),  # key with no right rows at all
        ],
        "user_id long, ts timestamp, label string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 100.0),
            (1, _ts(20), 200.0),
            (2, _ts(40), 999.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["label"]: r["asof_value"]
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    }
    assert got == {
        "early-click": None,
        "same-instant": 100.0,
        "after-two": 200.0,
        "other-user": 999.0,
        "no-purchases": None,
    }
    # left row count preserved (as-of never multiplies or drops left rows)
    assert asof_join(left, right, on="user_id", ts="ts").count() == left.count()


def test_asof_join_multiple_right_cols(spark):
    left = spark.createDataFrame([(1, _ts(15))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 7.0, "a")], "k long, ts timestamp, v double, tag string"
    )
    row = asof_join(left, right, on="k", ts="ts", right_cols=("v", "tag")).first()
    assert (row["asof_v"], row["asof_tag"]) == (7.0, "a")


def test_latest_per_key_tie_break(spark):
    """Compaction's ordering contract: newest ts wins; same-ts ties resolve
    by event_id DESC (deterministic snapshot)."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [
            (1, 10, _ts(1), "a", 1.0),
            (1, 11, _ts(1), "b", 2.0),  # same ts, higher event_id → winner
            (2, 20, _ts(2), "c", 3.0),  # newest ts wins ...
            (2, 21, _ts(1), "d", 4.0),  # ... even against a higher event_id
        ],
        "user_id long, event_id long, ts timestamp, event_type string, value double",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = {
        r["user_id"]: r["event_id"]
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert latest == {1: 11, 2: 20}


def test_replay_dedup_collapses_double_delivery(spark):
    ev = spark.createDataFrame(
        [(1, "click", 1.0), (2, "click", 2.0), (3, "purchase", 3.0)],
        "event_id long, event_type string, value double",
    )
    replayed = ev.unionAll(ev)
    assert replayed.count() == 6
    once = replayed.dropDuplicates(["event_id"])
    assert once.count() == 3
    assert once.agg(F.sum("value")).first()[0] == 6.0


def test_asof_join_null_semantics(spark):
    """Round-9 review: (a) a right row whose VALUE is NULL is still 'the
    latest right row' — the left reads that NULL, never a stale older
    value; (b) NULL keys never match (SQL equality), so a NULL-key left
    row gets NULL even when NULL-key right rows exist."""
    from kafka_connect_storage_cloud_formats_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 3.0), (None, 3.0)], "k long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None), (None, 1.0, 9.0)],
        "k long, ts double, value double",
    )
    out = {
        (r["k"], r["ts"]): r["asof_value"]
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert out[(1, 3.0)] is None  # latest right row carries NULL — not 5.0
    assert out[(None, 3.0)] is None  # NULL keys never match


def test_asof_join_drops_null_right_timestamps(spark):
    """Round-10 ADVICE: a right row with a NULL timestamp must never be
    carried — the oracle semantics (right.ts <= left.ts) exclude it, but
    Spark's NULLS FIRST ordering would otherwise sort it before every
    left row and serve it as the 'earliest' enrichment."""
    from kafka_connect_storage_cloud_formats_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 3.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, None, 42.0), (1, 5.0, 7.0)], "k long, ts double, value double"
    )
    rows = asof_join(left, right, on="k", ts="ts").collect()
    # the only valid right rows are ts=NULL (excluded) and ts=5.0 (> 3.0,
    # excluded by at-or-before) → no enrichment
    assert rows[0]["asof_value"] is None
