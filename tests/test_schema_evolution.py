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
    assert is_compatible(V1, V1, Compatibility.NONE)
    assert not is_compatible(V1, V2_ADD_NULLABLE, Compatibility.NONE)
    # BACKWARD: new schema must read old data → added field must be nullable
    assert is_compatible(V1, V2_ADD_NULLABLE, Compatibility.BACKWARD)
    assert not is_compatible(V1, V2_ADD_REQUIRED, Compatibility.BACKWARD)
    # FORWARD: old schema must read new data → additions always fine
    assert is_compatible(V1, V2_ADD_REQUIRED, Compatibility.FORWARD)
    # FULL: both directions
    assert is_compatible(V1, V2_ADD_NULLABLE, Compatibility.FULL)
    assert not is_compatible(V1, V2_ADD_REQUIRED, Compatibility.FULL)
    # type changes never compatible on the six-type surface
    for m in Compatibility:
        assert not is_compatible(V1, V2_TYPE_CHANGE, m) or m is Compatibility.NONE and V1 == V2_TYPE_CHANGE


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
