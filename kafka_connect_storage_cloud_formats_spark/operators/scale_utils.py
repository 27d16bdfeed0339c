"""Scale utilities: bucketed co-located joins and salt-based skew handling.

These are the two levers SCALE.md points at when a shuffle becomes the
bottleneck at 100 TB:

- **Bucketing**: persist both sides of a recurring join pre-hashed into the
  same number of buckets on the join key → the join reads bucket-aligned
  splits and needs NO shuffle on either side (verified by plan in
  tests/test_scale_utils.py). This is how a fact table joined daily against
  its dimension avoids re-shuffling 100 TB every run.
- **Salting**: a skewed key (one user with 10⁹ events) overloads one
  reducer. ``salted_join`` replicates the small side per salt bucket and
  scatters the big side's hot keys across ``salt_n`` reducers; results are
  identical to the plain join. (AQE's skew-join split handles moderate
  skew automatically; salting is the deterministic heavy hammer.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 16,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` bucketed (and sorted) by the join key. Subsequent
    equi-joins between tables bucketed identically execute shuffle-free."""
    (
        df.write.mode("overwrite")
        .format(fmt)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str]) -> DataFrame:
    """Join two co-bucketed tables (no Exchange on either side when bucket
    specs match; Spark may still SMJ within aligned buckets)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: scatter the big side across ``salt_n``
    sub-keys, replicate the small side once per sub-key. Output equals
    ``big.join(small, key)`` exactly; the shuffle key becomes
    (key, salt) so one hot key spreads over ``salt_n`` reducers.

    Cost: small side × salt_n (keep salt_n ≤ ~32); use only when AQE's
    skew split isn't enough (e.g. a single key > one executor's memory).
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n)).cast("int")
    )
    salts = F.array(*[F.lit(i) for i in range(salt_n)])
    salted_small = small.withColumn("__salt", F.explode(salts))
    out = salted_big.join(salted_small, [key, "__salt"])
    return out.drop("__salt")
