"""Log-compaction operators: keep-latest-per-key and replay dedup.

Kafka's log compaction keeps the newest record per key; an at-least-once
replay delivers the same (topic, partition, offset) record twice. Both are
single-window / single-distinct plans here:

- :func:`events_latest_per_user` — CDC-style compaction: one row per key,
  chosen by event time (ties by event_id). Shuffle on the key; at 100 TB
  this is the standard "latest snapshot from an append log" materialization
  (partial nothing — row_number needs the full key partition, but only the
  key's rows, so skew == hottest key's row count).
- :func:`replay_dedup` — simulates an at-least-once double delivery (input
  unioned with itself) and reduces back to exactly-once by record identity.
  The oracle is the plain aggregate over the source: results match only if
  dedup removed every duplicate — the engine-side guarantee the reference
  gets from deterministic-name overwrite (SURVEY.md §2.1 #15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.catalog import load_table
from kafka_connect_storage_cloud_formats_spark.queries.relational import dsum


def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


EVENTS_LATEST_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
ORDER BY user_id
"""


def replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    replayed = ev.unionAll(ev)  # at-least-once: every record delivered twice
    exactly_once = replayed.dropDuplicates(["event_id"])
    return (
        exactly_once.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_event_id"),
            dsum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


REPLAY_DEDUP_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


COMPACTION_QUERIES = {
    "events_latest_per_user": (events_latest_per_user, EVENTS_LATEST_SQL),
    "replay_dedup": (replay_dedup, REPLAY_DEDUP_SQL),
}
