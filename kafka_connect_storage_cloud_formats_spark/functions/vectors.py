"""Vector functions over ``array<float>`` embedding columns.

Pure ``pyspark.sql.functions`` higher-order functions: the arithmetic runs
JVM-side in whole-stage codegen, elementwise in index order (sequential
left-to-right accumulation) — which makes results bit-reproducible across
engines that do the same (DuckDB's list_dot_product), so similarity results
can be oracle-checked exactly.

Scale: these are per-row expressions (no shuffle). A brute-force top-k is a
broadcast-join + window; the IVF variant in operators/similarity.py bounds
the candidate set per query for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
