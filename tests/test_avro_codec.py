"""Spec-compliance tests for the pure-Python Avro binary codec,
cross-validated against the JVM Avro library (avro-1.12.1.jar ships on
Spark's classpath even without the spark-avro module) in BOTH directions:
our bytes must decode on the JVM, JVM bytes must decode here."""

import json
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from kafka_connect_storage_cloud_formats_spark.functions.avro_codec import (
    decode_record,
    encode_record,
)
from kafka_connect_storage_cloud_formats_spark.queries.pipeline_queries import (
    EVENTS_VALUE_SCHEMA,
    avro_roundtrip,
)
from kafka_connect_storage_cloud_formats_spark.schema import spark_schema_to_avro

SCHEMA = spark_schema_to_avro(EVENTS_VALUE_SCHEMA)

RECORDS = st.fixed_dictionaries(
    {
        "event_id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "user_id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "event_type": st.text(max_size=40),
        "value": st.one_of(
            st.none(), st.floats(allow_nan=False, width=64, allow_infinity=True)
        ),
        "props": st.one_of(st.none(), st.text(max_size=40)),
    }
)


@settings(max_examples=200, deadline=None)
@given(RECORDS)
def test_python_roundtrip_is_lossless(rec):
    assert decode_record(SCHEMA, encode_record(SCHEMA, rec)) == rec


def _jvm_decode(spark, payload: bytes) -> dict:
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(payload, None)
    rec = reader.read(None, dec)
    out = {}
    for f in ("event_id", "user_id", "event_type", "value", "props"):
        v = rec.get(f)
        # JVM strings arrive as org.apache.avro.util.Utf8
        out[f] = str(v) if v is not None and f in ("event_type", "props") else v
    return out


def _jvm_encode(spark, rec: dict) -> bytes:
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    grec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    for k, v in rec.items():
        grec.put(k, v)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
    writer.write(grec, enc)
    enc.flush()
    return bytes(baos.toByteArray())


SAMPLES = [
    {"event_id": 0, "user_id": 0, "event_type": "", "value": None, "props": None},
    {"event_id": 1, "user_id": -1, "event_type": "click", "value": 1.5, "props": "{}"},
    {
        "event_id": 2**62,
        "user_id": -(2**62),
        "event_type": "päge_view ✓",
        "value": -0.0,
        "props": None,
    },
    {"event_id": -127, "user_id": 63, "event_type": "x" * 300, "value": 1e308, "props": "p"},
]


def test_python_bytes_decode_on_the_jvm(spark):
    for rec in SAMPLES:
        got = _jvm_decode(spark, encode_record(SCHEMA, rec))
        assert got == rec, rec


def test_jvm_bytes_decode_in_python(spark):
    for rec in SAMPLES:
        got = decode_record(SCHEMA, _jvm_encode(spark, rec))
        assert got == rec, rec


def test_avro_roundtrip_query_matches_direct_aggregate(spark, sf_dir):
    """The registered query's whole encode→decode→aggregate chain equals
    the aggregate computed directly on the source (losslessness end-to-end
    through the Spark plan, not just per-record)."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_formats_spark.catalog import load_table
    from kafka_connect_storage_cloud_formats_spark.queries.relational import dsum

    got = {r["event_type"]: r.asDict() for r in avro_roundtrip(spark, sf_dir).collect()}
    want = {
        r["event_type"]: r.asDict()
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("event_id").alias("sum_event_id"),
                dsum("value").alias("total_value"),
            )
            .collect()
        )
    }
    assert got == want
    assert len(got) > 0


def test_nan_payload_fails_loudly_on_encode(spark):
    """A NaN double is indistinguishable from SQL NULL after the
    Arrow→pandas conversion, so the fallback encoder must refuse it rather
    than silently rewrite NaN → null (the JVM to_avro path preserves NaN)."""
    from pyspark.sql.utils import PythonException

    from kafka_connect_storage_cloud_formats_spark.functions.avro_codec import (
        avro_encode_df,
    )

    df = spark.createDataFrame(
        [(1, 2, "t", float("nan"), None)],
        "event_id long, user_id long, event_type string, value double, props string",
    )
    with pytest.raises(Exception, match="NaN"):
        avro_encode_df(df, SCHEMA).collect()


def test_nan_decode_fails_loudly():
    """Mirror guard on decode: Avro bytes carrying a genuine NaN must not
    silently become NULL on the pandas→Arrow return path. The raw
    per-record codec still roundtrips NaN (no Arrow boundary there) — only
    the DataFrame surface refuses."""
    rec = {"event_id": 1, "user_id": 2, "event_type": "t", "value": float("nan"), "props": None}
    data = encode_record(SCHEMA, rec)
    out = decode_record(SCHEMA, data)  # record-level API: lossless
    assert math.isnan(out["value"])


def test_encode_rejects_unsafe_nullable_long_batches(spark):
    """Round-9 review: Arrow renders an int64 column WITH NULLS as float64,
    so values past 2^53 arrive already rounded — int() would silently
    encode the WRONG number. The encoder must refuse loudly; exact values
    below 2^53 (and null-free columns of any magnitude) stay fine."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_formats_spark.functions.avro_codec import (
        avro_decode_df,
        avro_encode_df,
    )
    from kafka_connect_storage_cloud_formats_spark.schema import spark_schema_to_avro

    schema = T.StructType([T.StructField("x", T.LongType(), True)])
    avro = spark_schema_to_avro(schema)

    # null + huge value in ONE BATCH → float64 conversion → refuse
    # (coalesce(1): the hazard is per-Arrow-batch — a null-free batch
    # stays int64 and encodes exactly even at long-max)
    bad = spark.createDataFrame([(9007199254740993,), (None,)], schema).coalesce(1)
    with pytest.raises(Exception, match="2\\^53"):
        avro_encode_df(bad, avro).collect()

    # null + SAFE values round-trip exactly (2^53 - 1: the guard is
    # conservative at exactly 2^53, where a float64 cannot distinguish
    # 2^53 from 2^53 + 1)
    ok = spark.createDataFrame(
        [(9007199254740991,), (None,), (-5,)], schema
    ).coalesce(1)
    back = avro_decode_df(avro_encode_df(ok, avro), avro, schema)
    assert sorted(
        (r["x"] for r in back.collect()), key=lambda v: (v is None, v)
    ) == [-5, 9007199254740991, None]

    # null-FREE column of any magnitude stays int64 end to end
    big = spark.createDataFrame([(9223372036854775807,), (1,)], schema)
    back2 = avro_decode_df(avro_encode_df(big, avro), avro, schema)
    assert sorted(r["x"] for r in back2.collect()) == [1, 9223372036854775807]


@settings(max_examples=200, deadline=None)
@given(st.lists(RECORDS, min_size=1, max_size=40))
def test_vectorized_batch_encode_matches_reference(recs):
    """The NumPy batch encoder (r15 optimization) must produce byte-equal
    payloads to the per-record reference encoder for every record,
    including int64 extremes, unicode strings, and null unions."""
    import numpy as np

    from kafka_connect_storage_cloud_formats_spark.functions.avro_codec import (
        _check_supported,
        _encode_batch,
        _encode_row,
    )

    fields = _check_supported(SCHEMA)
    want = [
        _encode_row(fields, [rec[name] for name, _ in fields]) for rec in recs
    ]
    n = len(recs)
    cols = []
    for name, t in fields:
        base = t[1] if isinstance(t, list) else t
        raw = [rec[name] for rec in recs]
        nulls = np.array([v is None for v in raw])
        if base in ("int", "long"):
            vals = np.fromiter((0 if v is None else v for v in raw), np.int64, n)
        elif base in ("float", "double"):
            vals = np.array([0.0 if v is None else v for v in raw], dtype=np.float64)
        elif base == "boolean":
            vals = np.array([bool(v) for v in raw], dtype=bool)
        else:
            vals = raw
        cols.append((vals, nulls))
    got = _encode_batch(fields, cols, n)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(RECORDS, min_size=1, max_size=40))
def test_vectorized_batch_decode_matches_reference(recs):
    """The NumPy batch decoder must reproduce the per-record reference
    decoder column-for-column (and enforce the same trailing-bytes
    contract, checked separately below)."""
    from kafka_connect_storage_cloud_formats_spark.functions.avro_codec import (
        _check_supported,
        _decode_batch,
        _decode_row,
    )

    fields = _check_supported(SCHEMA)
    payloads = [encode_record(SCHEMA, rec) for rec in recs]
    want: list = [[] for _ in fields]
    for b in payloads:
        _decode_row(fields, b, want)
    got = _decode_batch(fields, payloads)
    assert got == want


def test_vectorized_batch_decode_rejects_trailing_bytes():
    from kafka_connect_storage_cloud_formats_spark.functions.avro_codec import (
        _check_supported,
        _decode_batch,
    )

    fields = _check_supported(SCHEMA)
    rec = {"event_id": 1, "user_id": 2, "event_type": "t", "value": 1.0, "props": None}
    good = encode_record(SCHEMA, rec)
    with pytest.raises(ValueError, match="trailing bytes"):
        _decode_batch(fields, [good, good + b"\x00"])


def test_zero_field_record_rejected():
    import pytest

    from kafka_connect_storage_cloud_formats_spark.functions.avro_codec import (
        encode_record,
    )

    with pytest.raises(ValueError, match="zero-field"):
        encode_record({"type": "record", "name": "r", "fields": []}, {})
