"""Relational query pack over the TPC-H-ish testdata.

The reference implements no relational operators (SURVEY.md §2.3) — on Spark
they come from Catalyst. This pack *exercises* them (scan, filter, project,
hash/broadcast join, semi/anti join, hash agg, rollup, window, sort, limit,
JSON extraction) and is the benchmark headline set. Every query has an exact
DuckDB oracle (ORACLE_SQL) used by the driver's t2 gate.

Determinism: double sums depend on accumulation order, so every oracle-
compared aggregate goes through a DECIMAL cast (order-independent exact sum)
and is cast back to DOUBLE — Spark and DuckDB then agree bit-for-bit.
Per-row double arithmetic (e.g. ``price * (1 - discount)``) is IEEE-
deterministic and identical in both engines, so it stays in double.

Scale notes (100 TB posture):
- Filters/projections are expressed on the scan so Catalyst pushes them into
  parquet (verified by tests/test_plans.py).
- Small dimensions (region/nation/supplier/customer/part at any realistic
  scale ratio) are broadcast explicitly: no shuffle of the fact table for
  those joins; lineitem→orders joins shuffle on the join key and benefit
  from AQE skew handling.
- Aggregations are partial (map-side combine) by construction of groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_connect_storage_cloud_formats_spark.catalog import load_table


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double column: sum in DECIMAL,
    emit DOUBLE. Mirrors ``CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: decimal sum → double, divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def maybe_broadcast(df: DataFrame, bounded: bool = False) -> DataFrame:
    """THE broadcast-hint policy for dimension joins at 100 TB posture —
    every relational hint decision flows through here (round-9 review:
    the bounded branch was previously dead while region/nation called
    F.broadcast directly, leaving the policy split across two spellings).

    ``bounded=True`` marks catalog-bounded dimensions whose cardinality is
    fixed at any scale factor (region: 5, nation: 25) — always safe to force.
    SF-scaled dimensions (customer, supplier, part grow linearly with the
    fact table) are returned unhinted: AQE + autoBroadcastJoinThreshold pick
    a broadcast join from runtime stats when the dim is actually small and
    fall back to shuffle join at large SF, where a forced hint would OOM
    the executors."""
    return F.broadcast(df) if bounded else df


# --- Q1: pricing summary (TPC-H Q1 shape: scan+filter+hash agg, 8 aggregates)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (join customer⋈orders⋈lineitem + top-N)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5-style: revenue by nation (5-way join through region)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(nation, bounded=True), cust.c_nationkey == nation.n_nationkey)
        .join(maybe_broadcast(region, bounded=True), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name, r_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
ORDER BY revenue DESC, n_name
"""


# --- window: top-3 orders per customer by totalprice
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
        .orderBy("o_custkey", "rank_in_cust")
    )


TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
  FROM orders
) t
WHERE rank_in_cust <= 3
ORDER BY o_custkey, rank_in_cust
"""


# --- rollup: grouping-set aggregation
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --- semi/anti join: customer order activity
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_orders = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    no_orders = cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_no_urgent"))
        .orderBy("c_mktsegment")
    )


ANTI_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_no_urgent
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- distinct aggregation
def distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_suppkey")
    )


DISTINCT_SQL = """
SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


# --- events: JSON extraction + time bucketing (the streaming table, run as batch)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_ROLLUP_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour, event_type
"""


# --- set operation: union + except over part brands/types
def part_brand_type_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT ALL exercised on real data, tagged by branch so
    the union is observable (not a trivially-reconstructible set): brands
    both big and pricey vs brands big but never pricey. The oracle models
    both branches verbatim (an earlier ``exceptAll(big)`` self-difference
    was provably empty and unmodeled by the oracle; KNOWN_ISSUES r4 #2)."""
    part = load_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") >= 25).select("p_brand").distinct()
    pricey = part.filter(F.col("p_retailprice") > 950).select("p_brand").distinct()
    both = big.intersect(pricey).withColumn("branch", F.lit("both"))
    only_big = big.exceptAll(pricey).withColumn("branch", F.lit("only_big"))
    return both.union(only_big).orderBy("p_brand", "branch")


SETOPS_SQL = """
SELECT p_brand, branch FROM (
  SELECT p_brand, 'both' AS branch FROM (
    SELECT DISTINCT p_brand FROM part WHERE p_size >= 25
    INTERSECT
    SELECT DISTINCT p_brand FROM part WHERE p_retailprice > 950)
  UNION ALL
  SELECT p_brand, 'only_big' AS branch FROM (
    SELECT DISTINCT p_brand FROM part WHERE p_size >= 25
    EXCEPT ALL
    SELECT DISTINCT p_brand FROM part WHERE p_retailprice > 950)
) t
ORDER BY p_brand, branch
"""


# --- q4-shape: correlated EXISTS → left-semi join (late-shipping orders)
def q4_priority_with_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having at least one lineitem shipped after the order date,
    counted by priority. The EXISTS subquery is a LEFT SEMI join: equi on
    orderkey (shuffle key), the date predicate rides as a join filter —
    no row multiplication, no second scan of the probe side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q16-shape: NOT IN (anti join) + COUNT(DISTINCT)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) for mid-size parts, excluding
    suppliers in deficit (NOT IN → broadcast anti join on the tiny excluded
    set; the distinct-count shuffles on the group key)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 10) & (F.col("p_size") <= 30)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    assoc = li.join(bad, "l_suppkey", "left_anti").select("l_partkey", "l_suppkey")
    return (
        assoc.join(maybe_broadcast(part), assoc.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), "p_brand", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 10 AND 30
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY n_suppliers DESC, p_brand, p_size
"""


# --- q17-shape: scalar correlated subquery (per-part average threshold)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 50% of their part's
    average quantity. The correlated scalar subquery becomes a per-part
    aggregate joined back on partkey (one extra shuffle of the small agg,
    not a rescan per row). Threshold avg is decimal-exact → deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy("l_partkey").agg(
        (0.5 * davg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            dsum("l_extendedprice").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_SQL = """
WITH t AS (
  SELECT l_partkey,
         0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity))
           AS qty_threshold
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN t USING (l_partkey)
WHERE l_quantity < qty_threshold
"""


# --- q18-shape: HAVING on a grouped subquery joined back to dimensions
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders whose total quantity exceeds 250 — a tail
    predicate (~1% of orders), so the surviving orderkey set is small;
    AQE turns the join back to orders into a broadcast at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 250
ORDER BY o_totalprice DESC, o_orderkey
"""


# --- q21-shape: EXISTS + NOT EXISTS over the same fact (semi then anti)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped late into multi-supplier orders where NO other
    supplier shipped late: the NOT-EXISTS side is a window count over the
    distinct late pairs (exactly one late supplier in the order), the
    EXISTS side one semi join equi on orderkey with a supplier-inequality
    join filter — the classic Q21 two-subquery semantics without row
    explosion or an anti self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    # `late` feeds two consumers (the candidate base and the NOT-EXISTS
    # side). The plan stays LAZY — building it must run no job (an earlier
    # eager localCheckpoint here executed the most expensive join in the
    # suite at plan-BUILD time and hid the subtree from plan inspection as
    # `Scan ExistingRDD`; KNOWN_ISSUES r4 #1). Both consumers shuffle the
    # identical distinct subtree on the same key, so Spark's ReusedExchange
    # materializes it once at execution time — the sharing the checkpoint
    # bought, without the hidden job or the audit blindness.
    # repartition(l_orderkey) BEFORE the distinct: hash-partitioning on
    # orderkey alone satisfies the (orderkey, suppkey) distinct's
    # clustering requirement AND the window's / semi probe's orderkey
    # partitioning, so the late stream crosses ONE exchange instead of
    # two (r15 optimization, guide §2.4 — same shape as the
    # _covered_positions share in operators/dedup.py). No explicit
    # partition count: AQE sizes it from the map stats.
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
        .repartition("l_orderkey")
        .distinct()
    )
    # NOT EXISTS(other late supplier) ⇔ the order has exactly ONE distinct
    # late (orderkey, suppkey) pair — a window count over `late`, not an
    # anti self-join (round 7: replaces two orderkey re-shuffles of the
    # late table with one; the per-order partition is bounded by
    # suppliers-per-order, single digits at any SF, so the window never
    # skews). The semi probe then reuses the window's orderkey
    # partitioning (its equi-key is orderkey alone; the supplier
    # inequality is a join filter).
    w21 = Window.partitionBy("l_orderkey")
    sole = (
        late.withColumn("n_late", F.count(F.lit(1)).over(w21))
        .filter(F.col("n_late") == 1)
        .drop("n_late")
    )
    # The semi probe needs NO distinct: EXISTS is duplicate-insensitive, so
    # deduplicating the full fact table's (orderkey, suppkey) pairs here
    # was a corpus-scale aggregate bought for nothing (r5: 1.8 → 1.1 s at
    # sf0.1; at 100 TB it removes an entire fact-table shuffle+agg).
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    cand = sole.join(
        l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi"
    )
    return (
        cand.join(maybe_broadcast(sup), cand.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_waits"))
        .orderBy(F.desc("n_waits"), "s_name")
    )


Q21_SQL = """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate)
SELECT s_name, COUNT(*) AS n_waits
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY n_waits DESC, s_name
"""


# --- q2-shape: per-group argmin + join back (cheapest supplier per part)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each mid-size part, the supplier with the lowest account balance
    among suppliers who shipped it (argmin per group via window over the
    part-supplier association, dimension joins broadcast).

    The selective part filter is applied BEFORE the (partkey, suppkey)
    distinct, not after: the join with the filtered dimension is the
    filter, so the distinct's shuffle carries only lineitem pairs for
    p_size=15 parts (~2% of the fact table at any SF) instead of the full
    association — the r2-era shape deduplicated everything first and paid
    a corpus-wide shuffle for rows the join then discarded."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    sup = load_table(spark, sf_dir, "supplier")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(maybe_broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    assoc = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        assoc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("p_partkey")
    )


Q2_SQL = """
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
FROM (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size = 15) t
WHERE rn = 1
ORDER BY p_partkey
"""


# --- q22-shape: global scalar threshold + anti join
def q22_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no recent order (none
    since 2000-01-01): the global average is a decimal-exact 1-row aggregate
    joined in via broadcast cross-join (single lazy plan, no driver-side
    ``.first()`` barrier); "no recent order" is a left-anti join against the
    date-filtered (pushdown) orders scan; grouped by nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = cust.agg(davg("c_acctbal").alias("avg_bal"))
    rich = cust.crossJoin(maybe_broadcast(avg_bal, bounded=True)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    inactive = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        inactive.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_custs"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("c_nationkey")
    )


Q22_SQL = """
WITH a AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
  FROM customer)
SELECT c_nationkey, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
FROM customer, a
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- scalar function gallery: the expression library the reference lacks
def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order priority exercising the scalar library (string,
    date, math, conditional, array) — the reference has NO scalar functions
    (SURVEY.md §2.3); on Spark they are Catalyst built-ins, folded into
    whole-stage codegen. Every expression here is deterministic and
    engine-portable (no locale, no float rounding)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderpriority",
            F.upper(F.substring("o_orderstatus", 1, 1)).alias("status_u"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.length(F.concat_ws("-", "o_orderpriority", "o_orderstatus")).alias("cat_len"),
            F.abs(F.col("o_custkey") - 1000).alias("absdiff"),
            F.greatest(F.col("o_orderkey") % 7, F.col("o_custkey") % 7).alias("gmod"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("nn"),
            F.when(F.col("o_totalprice") > 100000, "big").otherwise("small").alias("bucket"),
            F.floor(F.col("o_totalprice")).cast("long").alias("price_floor"),
        )
        .groupBy("o_orderpriority", "status_u", "yr", "mo", "bucket", "nn")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cat_len").alias("s_len"),
            F.sum("absdiff").alias("s_abs"),
            F.sum("gmod").alias("s_gmod"),
            F.sum("dom").alias("s_dom"),
            F.sum("price_floor").alias("s_floor"),
        )
        .orderBy("o_orderpriority", "status_u", "yr", "mo", "bucket", "nn")
    )


SCALAR_GALLERY_SQL = """
WITH e AS (
  SELECT o_orderpriority,
         upper(substr(o_orderstatus, 1, 1)) AS status_u,
         EXTRACT(year FROM o_orderdate) AS yr,
         EXTRACT(month FROM o_orderdate) AS mo,
         EXTRACT(day FROM o_orderdate) AS dom,
         length(concat_ws('-', o_orderpriority, o_orderstatus)) AS cat_len,
         abs(o_custkey - 1000) AS absdiff,
         greatest(o_orderkey % 7, o_custkey % 7) AS gmod,
         coalesce(nullif(o_orderstatus, 'O'), 'open') AS nn,
         CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket,
         CAST(floor(o_totalprice) AS BIGINT) AS price_floor
  FROM orders)
SELECT o_orderpriority, status_u, yr, mo, bucket, nn,
       COUNT(*) AS n,
       CAST(SUM(cat_len) AS BIGINT) AS s_len,
       CAST(SUM(absdiff) AS BIGINT) AS s_abs,
       CAST(SUM(gmod) AS BIGINT) AS s_gmod,
       CAST(SUM(dom) AS BIGINT) AS s_dom,
       CAST(SUM(price_floor) AS BIGINT) AS s_floor
FROM e
GROUP BY o_orderpriority, status_u, yr, mo, bucket, nn
ORDER BY o_orderpriority, status_u, yr, mo, bucket, nn
"""


# --- cube: full grouping-set lattice
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping sets in one pass —
    Spark expands to a single shuffle with grouping-id, same as the
    rollup query but covering the full lattice."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


ORDERS_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


# --- pivot: long → wide reshaping
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type count matrix via pivot (explicit value list
    so the plan is a single pass — Spark skips the distinct-values probe
    job); missing cells coalesced to 0 to match SQL conditional counts."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.withColumn("hr", F.hour("ts"))
        .groupBy("hr")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return wide.select(
        "hr", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    ).orderBy("hr")


EVENTS_PIVOT_SQL = """
SELECT EXTRACT(hour FROM ts) AS hr,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events
GROUP BY 1 ORDER BY hr
"""


# --- q7-shape: two-nation trade volume (supplier nation ≠ customer nation)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flows between distinct (supplier-nation, customer-nation)
    pairs per year — the two-sided dimension join with an inequality
    filter; both nation joins broadcast, the fact shuffles once per
    dimension key join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(maybe_broadcast(n1, bounded=True), F.col("s_nationkey") == F.col("sk"))
        .join(maybe_broadcast(n2, bounded=True), F.col("c_nationkey") == F.col("ck"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "yr")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS yr,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
ORDER BY supp_nation, cust_nation, yr
"""


# --- q14-shape: conditional aggregate ratio (promo revenue share)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO parts per year: two decimal-exact
    conditional sums divided as doubles (deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("yr"))
        .agg(
            (100.0 * dsum(promo) / dsum(rev)).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("yr")
    )


Q14_SQL = """
SELECT EXTRACT(year FROM l_shipdate) AS yr,
       100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                     AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
         AS promo_share_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY EXTRACT(year FROM l_shipdate)
ORDER BY yr
"""


# --- q19-shape: disjunctive multi-clause predicate
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR of three brand/size/quantity clause bundles —
    the disjunctive-pushdown shape: Catalyst pushes the OR into the scans
    where possible and the broadcast join keeps the fact single-pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
    c1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10)
    c2 = (F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20)
    c3 = (F.col("p_brand") == "Brand#20") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 30)
    return j.filter(c1 | c2 | c3).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#13' AND p_size <= 20 AND l_quantity >= 20)
   OR (p_brand = 'Brand#20' AND p_size <= 30 AND l_quantity >= 30)
"""


# --- q10-shape: returned-item revenue per customer, top-N
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue on returned items (returnflag = 'R'):
    filter pushed to the lineitem scan, broadcast customer/nation, top-N
    via sort+limit after one aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(nation, bounded=True), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- q13-shape: customer order-count distribution (outer join + histogram)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of orders-per-customer including zero-order customers:
    left outer join then two-level aggregation — the histogram-of-groups
    shape."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY n_customers DESC, c_count DESC
"""


# --- q6-shape: single-scan predicate aggregate (forecast revenue change)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The purest pushdown shape: one scan, three pushed predicates, one
    aggregate — no shuffle beyond the final partial-merge."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- q8-shape: market share of one nation within a region per year
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of region-revenue supplied by one nation per year: the ratio
    of a conditional decimal sum over the total — double-dimension join
    through customer-nation-region plus supplier-nation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_c = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    n_s = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_0", rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(maybe_broadcast(n_c, bounded=True), F.col("c_nationkey") == F.col("cnk"))
        .join(maybe_broadcast(n_s, bounded=True), F.col("s_nationkey") == F.col("snk"))
        .join(maybe_broadcast(region, bounded=True), F.col("crk") == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg((dsum(target) / dsum(rev)).alias("mkt_share"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("yr")
    )


Q8_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       CAST(SUM(CAST(CASE WHEN ns.n_name = 'NATION_0'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
         AS mkt_share,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY EXTRACT(year FROM o_orderdate)
ORDER BY yr
"""


# --- q15-shape: top entity vs a computed scalar maximum
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose 1996 revenue equals the maximum supplier revenue —
    the view + scalar-subquery-max shape (two aggregates, one broadcast of
    a single-row max)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    max_rev = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        revenue.join(maybe_broadcast(max_rev, bounded=True), revenue.total_rev == F.col("mx"))
        .join(maybe_broadcast(sup), revenue.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q9 shape: product-type profit by nation and year. The testdata has no
# partsupp table, so "profit" is the discounted revenue (the join/agg shape —
# pattern-filtered part ⋈ lineitem ⋈ supplier ⋈ nation ⋈ orders, grouped by
# (nation, order year) — is what Q9 exercises).
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(maybe_broadcast(nation, bounded=True), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- Q11 shape: "important" keys by value vs a global scalar threshold
# (the testdata has no partsupp; per-part shipped value stands in). TPC-H's
# fixed total-fraction threshold returns 0 rows as part count grows with SF,
# so the threshold is scale-invariant here: parts above MULT × the average
# per-part value. The scalar is folded in as a broadcast 1-row cross-join —
# single lazy plan, no driver collect (same pattern as q22).
Q11_MULT = 1.4


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value")
    )
    threshold = per_part.agg((davg("part_value", 6) * F.lit(Q11_MULT)).alias("thr"))
    return (
        per_part.crossJoin(maybe_broadcast(threshold, bounded=True))
        .filter(F.col("part_value") > F.col("thr"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS part_value
  FROM lineitem GROUP BY l_partkey),
thr AS (
  SELECT CAST(SUM(CAST(part_value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(part_value) * {Q11_MULT} AS thr
  FROM per_part)
SELECT l_partkey, part_value
FROM per_part, thr
WHERE part_value > thr
ORDER BY part_value DESC, l_partkey
"""


# --- Q12 shape: conditional priority counting after a fact-fact join (the
# testdata has no l_shipmode/commitdate; return-flag classes stand in for
# ship modes, late-in-1998 shipping for the date band).
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # when/otherwise, not bare boolean casts: a NULL o_orderpriority makes
    # is_high and ~is_high both NULL, so the sums would skip the row
    # entirely while the oracle's CASE ... ELSE counts it as a low line —
    # latent on this corpus (no NULL priorities) but a hash break on any
    # vintage with one (round-9 review)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0).cast("long")).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- Q20 shape: suppliers of heavily-shipped pattern-matched parts (nested
# agg threshold → semi-join chain; partsupp availability is replaced by
# shipped-quantity totals).
Q20_MIN_QTY = 50


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(maybe_broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_partkey, l_suppkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) > {Q20_MIN_QTY})
ORDER BY s_suppkey
"""


# --- column moments: variance/stddev of the whole-dollar-quantized price.
# Prices are floored to integer dollars so both engines build the power sums
# EXACTLY — as integer-valued DECIMAL sums, not int64: xq² is ~2.5e11, so an
# int64 s2 overflows one priority group at ~3.7e7 rows (orders SF ~125,
# nowhere near the 100 TB posture) and ANSI mode turns that into a crash.
# DECIMAL(38,0) capacity (1e38) carries the sum to ~4e26 rows/group. The
# final decimal→double casts are value-only conversions: bit-identical
# across engines while the sums stay below 2^64 (both correctly round a
# single machine word; SF ~240 for s2), and within 1 ulp beyond — the hash
# gate runs at sf0.01/0.1, far inside the exact envelope. From identical
# double inputs, var = (s2 - s1²/n)/n and sqrt are identical IEEE
# arithmetic. One map-side-combinable aggregation pass — the shape a column
# profiler uses at 100 TB (quantization error is irrelevant for profiling;
# the unquantized mean is already covered by q1/dsum).
def orders_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    xq = F.floor("o_totalprice").cast("long")
    base = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xq.cast("decimal(18,0)")).alias("s1"),
        F.sum((xq * xq).cast("decimal(28,0)")).alias("s2"),
    )
    s1d, s2d, nd = (F.col(c).cast("double") for c in ("s1", "s2", "n"))
    var = (s2d - s1d * s1d / nd) / nd
    return base.select(
        "o_orderpriority",
        "n",
        (s1d / nd).alias("mean_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("std_price"),
    ).orderBy("o_orderpriority")


ORDERS_MOMENTS_SQL = """
WITH base AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         SUM(CAST(floor(o_totalprice) AS DECIMAL(18,0))) AS s1,
         SUM(CAST(floor(o_totalprice) AS DECIMAL(18,0)) * CAST(floor(o_totalprice) AS DECIMAL(18,0))) AS s2
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, n,
       CAST(s1 AS DOUBLE) / n AS mean_price,
       (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n AS var_price,
       sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n) AS std_price
FROM base
ORDER BY o_orderpriority
"""


RELATIONAL_QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "top_orders_per_customer": (top_orders_per_customer, TOP_ORDERS_SQL),
    "orders_rollup": (orders_rollup, ROLLUP_SQL),
    "customers_without_orders": (customers_without_orders, ANTI_JOIN_SQL),
    "distinct_parts_per_supplier": (distinct_parts_per_supplier, DISTINCT_SQL),
    "events_hourly_rollup": (events_hourly_rollup, EVENTS_ROLLUP_SQL),
    "q4_priority_with_late_ship": (q4_priority_with_late_ship, Q4_SQL),
    "q16_supplier_counts": (q16_supplier_counts, Q16_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q21_sole_late_supplier": (q21_sole_late_supplier, Q21_SQL),
    "q2_min_acctbal_supplier": (q2_min_acctbal_supplier, Q2_SQL),
    "q22_rich_inactive_customers": (q22_rich_inactive_customers, Q22_SQL),
    "scalar_function_gallery": (scalar_function_gallery, SCALAR_GALLERY_SQL),
    "orders_cube": (orders_cube, ORDERS_CUBE_SQL),
    "events_pivot_hourly": (events_pivot_hourly, EVENTS_PIVOT_SQL),
    "q7_nation_trade_volume": (q7_nation_trade_volume, Q7_SQL),
    "q14_promo_revenue_share": (q14_promo_revenue_share, Q14_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q10_returned_revenue": (q10_returned_revenue, Q10_SQL),
    "q13_order_count_distribution": (q13_order_count_distribution, Q13_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q8_nation_market_share": (q8_nation_market_share, Q8_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "part_brand_type_setops": (part_brand_type_setops, SETOPS_SQL),
    "q9_product_type_profit": (q9_product_type_profit, Q9_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q12_priority_by_returnflag": (q12_priority_by_returnflag, Q12_SQL),
    "q20_promotion_suppliers": (q20_promotion_suppliers, Q20_SQL),
    "orders_price_moments": (orders_price_moments, ORDERS_MOMENTS_SQL),
}
