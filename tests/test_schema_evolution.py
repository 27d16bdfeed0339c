"""Schema evolution: compatibility matrix, projection, rotation + merged
read-back (SURVEY.md stage 3; Connect StorageSchemaCompatibility semantics)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_storage_cloud_formats_spark.pipeline import IngestPipeline
from kafka_connect_storage_cloud_formats_spark.schema_evolution import (
    Compatibility,
    IncompatibleSchemaError,
    SchemaTracker,
    is_compatible,
    project_to_schema,
)

V1 = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)
V2_ADD_NULLABLE = T.StructType(
    [*V1.fields, T.StructField("score", T.DoubleType(), True)]
)
V2_ADD_REQUIRED = T.StructType(
    [*V1.fields, T.StructField("score", T.DoubleType(), False)]
)
V2_TYPE_CHANGE = T.StructType(
    [T.StructField("id", T.IntegerType(), False), T.StructField("name", T.StringType(), False)]
)


def test_compatibility_matrix():
    # NONE = no compatibility CHECKING (Connect semantics): every change is
    # accepted and the tracker rotates — the pre-round-9 reading rejected
    # any change, failing the task under the mode whose point is to never
    # fail on one
    assert is_compatible(V1, V1, Compatibility.NONE)
    assert is_compatible(V1, V2_ADD_NULLABLE, Compatibility.NONE)
    assert is_compatible(V1, V2_TYPE_CHANGE, Compatibility.NONE)
    # BACKWARD: new schema must read old data → added field must be nullable
    assert is_compatible(V1, V2_ADD_NULLABLE, Compatibility.BACKWARD)
    assert not is_compatible(V1, V2_ADD_REQUIRED, Compatibility.BACKWARD)
    # FORWARD: old schema must read new data → additions always fine
    assert is_compatible(V1, V2_ADD_REQUIRED, Compatibility.FORWARD)
    # FULL: both directions
    assert is_compatible(V1, V2_ADD_NULLABLE, Compatibility.FULL)
    assert not is_compatible(V1, V2_ADD_REQUIRED, Compatibility.FULL)
    # type changes never compatible on the six-type checked modes
    for m in (Compatibility.BACKWARD, Compatibility.FORWARD, Compatibility.FULL):
        assert not is_compatible(V1, V2_TYPE_CHANGE, m)
    # a nullable writer cannot serve a NON-nullable reader field (its nulls
    # would land in a file group whose locked schema says NOT NULL)
    v1_nullable_id = T.StructType(
        [T.StructField("id", T.LongType(), True), V1.fields[1]]
    )
    # FORWARD: old readers (V1, id NOT NULL) read new data (nullable id) —
    # must be rejected; the reverse direction (nullable reader) is fine
    assert not is_compatible(V1, v1_nullable_id, Compatibility.FORWARD)
    assert is_compatible(v1_nullable_id, V1, Compatibility.FORWARD)


def test_tracker_none_mode_rotates_on_any_change():
    """Connect's NONE: no checking, rotate on every change."""
    t = SchemaTracker(Compatibility.NONE)
    assert t.observe(V1) == "rotate"
    assert t.observe(V1) == "continue"
    assert t.observe(V2_TYPE_CHANGE) == "rotate"  # even a type change
    assert t.current == V2_TYPE_CHANGE


def test_projection_type_conflict_raises(spark):
    """Connect's SchemaProjector raises on a type conflict; a silent cast
    would turn unparseable values into NULLs."""
    df = spark.range(3).select(
        F.col("id").cast("string").alias("id"),
        F.lit("x").alias("name"),
    )
    with pytest.raises(Exception, match="type conflict"):
        project_to_schema(df, V1)


def test_projection_case_insensitive_resolution(spark):
    """Spark's default analyzer resolves names case-insensitively; the
    projection must too (the old exact lookup silently NULL-filled a
    present column)."""
    df = spark.range(4).select(
        F.col("id"),
        F.lit("n").alias("Name"),  # case differs from the target field
    )
    proj = project_to_schema(df, V1)
    assert proj.columns == ["id", "name"]
    assert proj.filter(F.col("name").isNull()).count() == 0


def test_tracker_rotation_and_rejection():
    t = SchemaTracker(Compatibility.BACKWARD)
    assert t.observe(V1) == "rotate"  # first schema opens a file group
    assert t.observe(V1) == "continue"
    assert t.observe(V2_ADD_NULLABLE) == "rotate"  # upgrade → new file group
    assert t.current == V2_ADD_NULLABLE
    assert t.observe(V1) == "continue"  # old shape still projectable
    with pytest.raises(IncompatibleSchemaError):
        t.observe(V2_TYPE_CHANGE)


def test_projection(spark):
    df = spark.range(5).select(F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    proj = project_to_schema(df, V2_ADD_NULLABLE)
    assert proj.columns == ["id", "name", "score"]
    assert proj.filter(F.col("score").isNull()).count() == 5
    with pytest.raises(Exception):
        project_to_schema(df, V2_ADD_REQUIRED)


def test_evolving_ingest_with_merged_readback(spark, tmp_path):
    """v1 batch, then v2 batch (added nullable column) after rotation; merged
    read-back sees the union schema with nulls for pre-evolution rows —
    the Spark-native equivalent of Connect's rotate-on-schema-change."""
    out = str(tmp_path / "out")
    tracker = SchemaTracker(Compatibility.BACKWARD)

    def mk(n, with_score):
        df = spark.range(n).select(
            F.col("id"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
            F.lit("t").alias("topic"),
            F.lit(0).cast("int").alias("partition"),
            F.col("id").alias("offset"),
        )
        return df.withColumn("score", F.col("id") * 1.5) if with_score else df

    b1, b2 = mk(4, False), mk(3, True)
    assert tracker.observe(V1) == "rotate"
    IngestPipeline(out + "/g1", V1, flush_size=100, parity_naming=True).run_batch(b1)
    assert tracker.observe(V2_ADD_NULLABLE) == "rotate"
    IngestPipeline(out + "/g2", V2_ADD_NULLABLE, flush_size=100, parity_naming=True).run_batch(b2)

    merged = (
        spark.read.format("orc")
        .option("pathGlobFilter", "*.orc")
        .option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .load(out)
    )
    assert merged.count() == 7
    assert merged.filter(F.col("score").isNull()).count() == 4
    assert set(merged.columns) >= {"id", "name", "score"}


def test_evolving_ingest_driver(spark, tmp_path):
    """EvolvingIngest rotates generations on upgrades and projects
    older-shaped batches onto the current schema (null-filled)."""
    from kafka_connect_storage_cloud_formats_spark.pipeline import EvolvingIngest

    def mk(n, offset0, with_score):
        df = spark.range(n).select(
            (F.col("id") + offset0).alias("id"),
            F.concat(F.lit("n"), F.col("id") + offset0).alias("name"),
            F.lit("t").alias("topic"),
            F.lit(0).cast("int").alias("partition"),
            (F.col("id") + offset0).alias("offset"),
        )
        return df.withColumn("score", (F.col("id") * 2.0)) if with_score else df

    # batches aligned to flush boundaries: parity naming is offset-bucket
    # keyed, so same-bucket batches would (by design) idempotently overwrite
    ing = EvolvingIngest(str(tmp_path / "evolve"), flush_size=100)
    ing.ingest(mk(4, 0, False), V1)                   # gen 0, v1
    ing.ingest(mk(3, 100, True), V2_ADD_NULLABLE)     # upgrade → gen 1, v2
    ing.ingest(mk(2, 200, False), V1)                 # v1 again → projected into gen 1
    assert ing.generation == 1

    back = ing.read_back(spark)
    assert back.count() == 9
    # 4 rows from gen0 lack score entirely (merged as null) + 2 projected nulls
    assert back.filter(F.col("score").isNull()).count() == 6
    with pytest.raises(Exception):
        ing.ingest(mk(1, 9, False), V2_TYPE_CHANGE)
