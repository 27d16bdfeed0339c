"""As-of join: for each left event, the most recent right event at-or-before
it, per key — the canonical timeseries enrichment operator (trade→quote,
click→last-purchase). Spark has no built-in as-of join (SURVEY.md §2.3
lists it among the reference's absent join types too); this implements it
scalably as UNION + per-key ordered window with ``last(..., ignorenulls)``:

    tag rows LEFT/RIGHT → union → window per key ordered by (ts, side)
    → each LEFT row reads the running "last RIGHT value" → filter LEFT.

Scale shape: ONE shuffle (the window partition by key) regardless of table
sizes — no range join explosion, no BroadcastNestedLoopJoin; skew bounded
by the hottest key's row count, same as any per-key window. Right-at-same-
ts sorts before left (side flag) so the join is ≤ (at-or-before) semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.catalog import load_table
from kafka_connect_storage_cloud_formats_spark.queries.relational import dsum


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Generic as-of join. Returns ``left`` columns plus, for each
    ``right_cols`` column c, ``asof_c`` = c of the latest right row with
    ``right.ts <= left.ts`` and equal ``on`` key (NULL if none).

    Tie note: if the right side has MULTIPLE rows at the same (key, ts),
    which one is carried is unspecified — exactly as in the SQL oracle's
    ``ORDER BY ts DESC LIMIT 1``. Callers needing determinism under such
    ties should pre-deduplicate the right side or extend its sort key
    (the driver's events table has no same-(user, ts) purchase pairs at
    any SF — verified round 5).

    NULL semantics (round-9 review — both latent on the shipped corpora
    but wrong for general callers):
    - the carried payload is a one-struct-per-right-row marker, so a
      right row whose VALUE is NULL still counts as "a right row exists"
      and the left row reads that NULL — a bare last(col, ignorenulls)
      skipped it and carried a STALE older value;
    - right rows with a NULL key are dropped before the union (SQL
      equality never matches NULL), so a NULL-key left row gets NULL,
      not an enrichment from the NULL-key "group" the window would
      otherwise form;
    - right rows with a NULL timestamp are dropped too (round-10
      ADVICE): the oracle semantics ``right.ts <= left.ts`` exclude
      them (SQL comparison with NULL is never true), but Spark's
      ``orderBy(ts.asc())`` is NULLS FIRST — an unfiltered NULL-ts
      right row would sort before every left row and be carried as the
      "earliest" enrichment."""
    # unionByName(allowMissingColumns=True) null-fills each side's missing
    # columns with the other side's types — the left side needs no explicit
    # lit(None).cast(...) padding of the __r struct (that is exactly the
    # mechanism already relied on for the right side's missing left columns).
    lt = left.withColumn("__side", F.lit(1))
    rt = (
        right.filter(F.col(on).isNotNull() & F.col(ts).isNotNull())
        .select(
            on,
            ts,
            F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__r"),
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__asof")
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            "*",
            *[F.col("__asof").getField(c).alias(f"asof_{c}") for c in right_cols],
        )
        .drop("__side", "__r", "__asof")
    )


def clicks_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click enriched with the user's most recent at-or-before purchase
    value; per-user aggregate so the output is compact and hash-stable."""
    ev = load_table(spark, sf_dir, "events")
    # no event_id: it was never consumed downstream and every click row
    # would carry it through the as-of window shuffle for nothing
    # (round-9 review; the oracle's CTE drops it identically)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(clicks, purchases, on="user_id", ts="ts", right_cols=("value",))
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.when(F.col("asof_value").isNull(), 1).otherwise(0)).alias(
                "clicks_before_any_purchase"
            ),
            dsum("asof_value").alias("total_asof_value"),
        )
        .orderBy("user_id")
    )


CLICKS_ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
enriched AS (
  SELECT c.user_id,
         (SELECT p.value FROM purchases p
          WHERE p.user_id = c.user_id AND p.ts <= c.ts
          ORDER BY p.ts DESC LIMIT 1) AS asof_value
  FROM clicks c)
SELECT user_id, COUNT(*) AS n_clicks,
       CAST(SUM(CASE WHEN asof_value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS clicks_before_any_purchase,
       CAST(SUM(CAST(asof_value AS DECIMAL(30,6))) AS DOUBLE) AS total_asof_value
FROM enriched
GROUP BY user_id
ORDER BY user_id
"""


ASOF_QUERIES = {
    "clicks_asof_purchase": (clicks_asof_purchase, CLICKS_ASOF_SQL),
}
