"""Pure-Python Avro BINARY codec for flat Connect-style record schemas.

Implements the public Avro 1.x binary encoding (zigzag-varint longs,
length-prefixed UTF-8 strings, IEEE-754 little-endian floats/doubles,
union-index prefixes, record fields in declaration order) for the subset
of schemas the Connect value path uses: a record of primitive fields,
optionally nullable via ``["null", T]`` unions — exactly what
``schema.spark_schema_to_avro`` emits.

Why it exists: the reference's value chain is Connect→Avro→ORC
(``OrcRecordWriter.java:64,71`` reads Avro-decoded Connect values), but
this container ships no spark-avro module jar, so Spark's own
``to_avro``/``from_avro`` cannot load. This codec makes the Avro leg REAL
anyway — byte-level Avro binary, not a marker row — and is
cross-validated in tests/test_avro_codec.py against the JVM Avro library
(`avro-1.12.1.jar`, already on Spark's classpath) in BOTH directions:
Python-encoded payloads decode with ``GenericDatumReader``, and
JVM-encoded payloads decode with this module. When the spark-avro jar IS
present, the engine prefers the JVM ``to_avro``/``from_avro`` path
(queries/pipeline_queries.py:avro_roundtrip) — this is the fallback, and
a format-boundary codec is inherently per-record on any engine.

Scale shape: invoked through Arrow-batched pandas UDFs
(:func:`avro_encode_udf` / :func:`avro_decode_udf`) — a narrow map over
the event stream, embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import struct
from typing import Any

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _check_supported(schema: dict) -> list[tuple[str, Any]]:
    """Validate the record schema; return [(field_name, field_type), ...]
    where field_type is a primitive name or a ["null", primitive] union."""
    if schema.get("type") != "record":
        raise ValueError(f"unsupported root schema: {schema.get('type')!r}")
    if not schema.get("fields"):
        # legal Avro (every record encodes to b"") but a silent hazard in
        # the Arrow batch paths: zip(*[]) yields NOTHING, so a million-row
        # DataFrame would encode to zero rows with no error (round-9
        # review). The engine's ingest surface requires >= 1 field anyway.
        raise ValueError("zero-field record schemas are not supported")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or t[0] != "null" or t[1] not in _PRIMITIVES:
                raise ValueError(f"unsupported union for field {f['name']!r}: {t}")
        elif t not in _PRIMITIVES:
            raise ValueError(f"unsupported type for field {f['name']!r}: {t}")
        out.append((f["name"], t))
    return out


# --------------------------------------------------------------- primitives
def _write_long(out: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag (arithmetic shift: -1 for negatives)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    z, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _write_value(out: bytearray, t: str, v: Any) -> None:
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(out, int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif t == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    else:  # pragma: no cover - guarded by _check_supported
        raise ValueError(f"unsupported type {t!r}")


def _read_value(buf: bytes, pos: int, t: str) -> tuple[Any, int]:
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("string", "bytes"):
        n, pos = _read_long(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    raise ValueError(f"unsupported type {t!r}")  # pragma: no cover


# ------------------------------------------------------------------ records
def _encode_row(fields: list, row) -> bytes:
    """Encode one record's values (POSITIONAL, field-declaration order)
    against a pre-validated field list — THE per-record encoder, shared by
    the dict-keyed API and the Arrow batch path (round-9 review: the batch
    path previously carried its own near-copy of the union/null logic)."""
    out = bytearray()
    for (name, t), v in zip(fields, row):
        if isinstance(t, list):  # ["null", T]
            if v is None:
                _write_long(out, 0)
            else:
                _write_long(out, 1)
                _write_value(out, t[1], v)
        elif v is None:
            raise ValueError(f"null for non-nullable field {name!r}")
        else:
            _write_value(out, t, v)
    return bytes(out)


def _encode_record_fields(fields: list, values: dict) -> bytes:
    """Dict-keyed wrapper over :func:`_encode_row` (the per-batch hot path
    uses the positional form directly)."""
    return _encode_row(fields, [values.get(name) for name, _ in fields])


def _decode_row(fields: list, data: bytes, cols: list, reject_nan: bool = False) -> None:
    """Decode one record's payload, appending each field's value to its
    per-column list — THE per-record decoder, shared by the dict-keyed API
    and the Arrow batch path. ``reject_nan``: the batch path must refuse a
    decoded NaN double (it would silently become SQL NULL at the
    pandas→Arrow boundary); the plain-Python API can represent NaN and
    keeps it."""
    pos = 0
    for (name, t), col in zip(fields, cols):
        if isinstance(t, list):
            branch, pos = _read_long(data, pos)
            if branch == 0:
                col.append(None)
                continue
            v, pos = _read_value(data, pos, t[1])
        else:
            v, pos = _read_value(data, pos, t)
        if reject_nan and isinstance(v, float) and v != v:
            raise ValueError(
                f"NaN decoded for field {name!r}: not representable "
                "across the Arrow-pandas boundary; use the JVM "
                "from_avro path for NaN payloads"
            )
        col.append(v)
    if pos != len(data):
        raise ValueError(f"trailing bytes: consumed {pos} of {len(data)}")


def _decode_record_fields(fields: list, data: bytes) -> dict:
    cols: list = [[] for _ in fields]
    _decode_row(fields, data, cols)
    return {name: col[0] for (name, _), col in zip(fields, cols)}


def encode_record(schema: dict, values: dict) -> bytes:
    """Encode one record (field-name → python value) to Avro binary."""
    return _encode_record_fields(_check_supported(schema), values)


def decode_record(schema: dict, data: bytes) -> dict:
    """Decode Avro binary back to field-name → python value; validates the
    payload is consumed exactly (a lossy codec would leave trailing bytes)."""
    return _decode_record_fields(_check_supported(schema), data)


# ------------------------------------------------- vectorized batch kernels
# The per-record functions above are THE reference implementation (they are
# what the record-level API serves and what the JVM cross-validation tests
# pin). The Arrow batch path below re-implements exactly the same byte
# layout with NumPy column-at-a-time kernels (guide §4.2 — hand whole
# batches to vectorized native code): the zigzag-varint expansion, the
# IEEE-754 little-endian packs and the union-index prefixes all run as
# array ops, leaving only the per-row byte join / string slice in Python.
# Equality with the per-record path is pinned property-wise and on the real
# corpus in tests/test_avro_codec.py (r15 optimization: the encode+decode
# stage was the heaviest Python CPU in the bench — 16.6 s executor time at
# sf0.1 — and the per-record varint loop was ~10 Python ops per byte).

_U64_ONE = None  # placeholder to keep imports lazy; numpy loaded in helpers


def _zigzag_u64(ns):
    """int64 array → zigzag uint64 array, bit-identical to _write_long's
    ``(n << 1) ^ (n >> 63)`` on Python ints (two's-complement view, so the
    wrap-around semantics match arbitrary-precision XOR exactly)."""
    import numpy as np

    u = ns.astype(np.int64, copy=False).view(np.uint64)
    sign = np.where(ns < 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
    return ((u << np.uint64(1)) ^ sign).astype(np.uint64)


def _varint_pieces(u64) -> list:
    """uint64 zigzag values → list of per-value varint byte strings
    (7-bit groups, little-endian, continuation bit on all but the last) —
    the vectorized twin of _write_long's while loop."""
    import numpy as np

    n = len(u64)
    if n == 0:
        return []
    mat = np.empty((n, 10), dtype=np.uint8)
    cur = u64.copy()
    for j in range(10):
        mat[:, j] = (cur & np.uint64(0x7F)).astype(np.uint8)
        cur >>= np.uint64(7)
    lengths = np.ones(n, dtype=np.int64)
    tmp = u64 >> np.uint64(7)
    while tmp.any():
        lengths += (tmp != np.uint64(0)).astype(np.int64)
        tmp >>= np.uint64(7)
    cont = np.arange(10)[None, :] < (lengths[:, None] - 1)
    mat |= cont.astype(np.uint8) << np.uint8(7)
    flat = mat.tobytes()
    return [flat[10 * i : 10 * i + lengths[i]] for i in range(n)]


def _encode_batch(fields: list, cols: list, n: int) -> list:
    """Vectorized batch encoder: per-field byte-piece columns, then one
    b''.join per row. ``cols`` carries per-field (values, nulls) pairs as
    prepared by avro_encode_df (values: numpy array or python list with
    exact semantics; nulls: boolean numpy array)."""
    import numpy as np

    piece_cols: list[list] = []
    for (name, t), (vals, nulls) in zip(fields, cols):
        is_union = isinstance(t, list)
        base = t[1] if is_union else t
        if not is_union and nulls is not None and nulls.any():
            raise ValueError(f"null for non-nullable field {name!r}")
        if base in ("int", "long"):
            iv = np.asarray(vals, dtype=np.int64)
            body = _varint_pieces(_zigzag_u64(iv))
        elif base in ("float", "double"):
            fmt = "<f4" if base == "float" else "<f8"
            width = 4 if base == "float" else 8
            raw = np.asarray(vals, dtype=np.float64).astype(fmt).tobytes()
            body = [raw[width * i : width * i + width] for i in range(n)]
        elif base == "boolean":
            raw = (np.asarray(vals, dtype=bool)).astype(np.uint8).tobytes()
            body = [raw[i : i + 1] for i in range(n)]
        elif base in ("string", "bytes"):
            if base == "string":
                enc = [
                    b"" if vals[i] is None else str(vals[i]).encode("utf-8")
                    for i in range(n)
                ]
            else:
                enc = [b"" if vals[i] is None else bytes(vals[i]) for i in range(n)]
            lens = _varint_pieces(
                _zigzag_u64(np.fromiter((len(b) for b in enc), np.int64, n))
            )
            body = [lv + b for lv, b in zip(lens, enc)]
        elif base == "null":
            body = [b""] * n
        else:  # pragma: no cover - guarded by _check_supported
            raise ValueError(f"unsupported type {base!r}")
        if is_union:
            # zigzag(0)=b"\x00", zigzag(1)=b"\x02" — the union index prefix
            piece_cols.append(
                [
                    b"\x00" if nulls[i] else b"\x02" + body[i]
                    for i in range(n)
                ]
            )
        else:
            piece_cols.append(body)
    return [b"".join(row) for row in zip(*piece_cols)]


def _vec_read_varint(buf, pos):
    """Vectorized varint reader: (values uint64, new positions). ``pos``
    is mutated-free (a copy advances); per-record shifts diverge once
    lengths differ, exactly like the scalar loop."""
    import numpy as np

    n = len(pos)
    z = np.zeros(n, dtype=np.uint64)
    shift = np.zeros(n, dtype=np.uint64)
    p = pos.copy()
    active_idx = np.arange(n)
    while len(active_idx):
        b = buf[p[active_idx]].astype(np.uint64)
        z[active_idx] |= (b & np.uint64(0x7F)) << shift[active_idx]
        p[active_idx] += 1
        shift[active_idx] += np.uint64(7)
        active_idx = active_idx[(b & np.uint64(0x80)) != 0]
    return z, p


def _unzigzag_i64(z):
    import numpy as np

    neg = np.where(
        (z & np.uint64(1)).astype(bool),
        np.uint64(0xFFFFFFFFFFFFFFFF),
        np.uint64(0),
    )
    return ((z >> np.uint64(1)) ^ neg).view(np.int64)


def _decode_batch(fields: list, payloads: list, reject_nan: bool = False) -> list:
    """Vectorized batch decoder: field-sequential passes maintaining a
    per-record position array over the concatenated payload buffer —
    byte-identical semantics to _decode_row, including the trailing-bytes
    check per record and the NaN refusal of the DataFrame path."""
    import numpy as np

    n = len(payloads)
    cols: list[list] = [[] for _ in fields]
    if n == 0:
        return cols
    lens = np.fromiter((len(b) for b in payloads), np.int64, n)
    ends = np.cumsum(lens)
    starts = ends - lens
    blob = b"".join(payloads)
    buf = np.frombuffer(blob, dtype=np.uint8)
    pos = starts.copy()
    for (name, t), col in zip(fields, cols):
        is_union = isinstance(t, list)
        base = t[1] if is_union else t
        if is_union:
            idx_z, pos = _vec_read_varint(buf, pos)
            branch = _unzigzag_i64(idx_z)
            present = branch != 0
        else:
            present = np.ones(n, dtype=bool)
        pidx = np.nonzero(present)[0]
        out: list = [None] * n
        if base in ("int", "long"):
            z, newp = _vec_read_varint(buf, pos[pidx])
            vals = _unzigzag_i64(z)
            for j, i in enumerate(pidx):
                out[i] = int(vals[j])
            pos[pidx] = newp
        elif base in ("float", "double"):
            width = 4 if base == "float" else 8
            fmt = "<f4" if base == "float" else "<f8"
            gathered = buf[pos[pidx, None] + np.arange(width)]
            vals = gathered.copy().view(fmt).ravel().astype(np.float64)
            if reject_nan and np.isnan(vals).any():
                raise ValueError(
                    f"NaN decoded for field {name!r}: not representable "
                    "across the Arrow-pandas boundary; use the JVM "
                    "from_avro path for NaN payloads"
                )
            for j, i in enumerate(pidx):
                out[i] = float(vals[j])
            pos[pidx] += width
        elif base == "boolean":
            vals = buf[pos[pidx]] != 0
            for j, i in enumerate(pidx):
                out[i] = bool(vals[j])
            pos[pidx] += 1
        elif base in ("string", "bytes"):
            z, newp = _vec_read_varint(buf, pos[pidx])
            slens = _unzigzag_i64(z)
            for j, i in enumerate(pidx):
                s, e = int(newp[j]), int(newp[j] + slens[j])
                raw = blob[s:e]
                out[i] = raw.decode("utf-8") if base == "string" else raw
            pos[pidx] = newp + slens.astype(np.int64)
        elif base != "null":  # pragma: no cover - guarded by _check_supported
            raise ValueError(f"unsupported type {base!r}")
        col.extend(out)
    bad = np.nonzero(pos != ends)[0]
    if len(bad):
        i = int(bad[0])
        raise ValueError(
            f"trailing bytes: consumed {int(pos[i] - starts[i])} of {int(lens[i])}"
        )
    return cols


# ------------------------------------------------------------- Spark surface
def avro_encode_df(df, schema: dict):
    """Arrow-batched encode: DataFrame with the schema's columns → DataFrame
    with a single Avro-binary ``value`` column (``mapInPandas`` — a narrow
    map, no shuffle; per-record byte assembly is inherent to the format).

    NaN payloads fail LOUDLY: after the Arrow→pandas conversion a genuine
    NaN double is indistinguishable from SQL NULL (both surface as NaN in a
    float64 column), so a silent pass would rewrite NaN → null while the
    JVM ``to_avro`` path preserves it. The guard is a JVM-side
    ``assert_true`` column riding the UDF input (mapInPandas receives its
    child's full schema, so the column cannot be pruned away); the encoder
    itself never reads it."""
    import pandas as pd
    from pyspark.sql import functions as F

    fields = _check_supported(schema)

    float_fields = [
        name
        for name, t in fields
        if (t[1] if isinstance(t, list) else t) in ("float", "double")
    ]
    if float_fields:
        cond = None
        for name in float_fields:
            g = F.isnull(F.col(name)) | ~F.isnan(F.col(name))
            cond = g if cond is None else cond & g
        df = df.withColumn(
            "__nan_guard",
            F.coalesce(
                F.assert_true(
                    cond,
                    F.lit(
                        "NaN in a float/double field: not representable across "
                        "the Arrow-pandas boundary (conflates with null); use "
                        "the JVM to_avro path for NaN payloads"
                    ),
                ).cast("int"),
                F.lit(0),
            ),
        )

    int_fields = {
        name
        for name, t in fields
        if (t[1] if isinstance(t, list) else t) in ("int", "long")
    }

    def enc(batches):
        # Vectorized batch path (_encode_batch): columns are materialized
        # once per batch in field-declaration order as (values, nulls)
        # arrays; the zigzag-varint/pack work runs as NumPy array ops and
        # only the per-row byte join stays in Python. Pinned equal to the
        # per-record reference encoder in tests/test_avro_codec.py.
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            cols = []
            for name, t in fields:
                col = pdf[name]
                base = t[1] if isinstance(t, list) else t
                nulls = col.isna().to_numpy()
                if name in int_fields and col.dtype.kind == "f":
                    # Arrow→pandas renders an int64 column WITH NULLS as
                    # float64: values beyond 2^53 have already lost
                    # precision by the time we see them, so int() would
                    # silently encode the WRONG number (round-9 review —
                    # the one pure data-corruption hazard in this codec).
                    # Refuse loudly past the exact-integer range; below
                    # it, float64 round-trips every int exactly.
                    finite = col.dropna()
                    if len(finite) and finite.abs().max() >= 2.0**53:
                        raise ValueError(
                            f"nullable int/long field {name!r} arrived as "
                            f"float64 (a null in the batch forces the "
                            f"Arrow-pandas conversion) with |values| >= "
                            f"2^53: exact encoding is impossible on this "
                            f"path — use the JVM to_avro path or make the "
                            f"field non-nullable"
                        )
                    if len(finite) and not np.array_equal(
                        finite.to_numpy(), np.trunc(finite.to_numpy())
                    ):
                        raise ValueError(
                            f"non-integral values in int/long field {name!r}"
                        )
                    vals = col.fillna(0.0).to_numpy(dtype=np.float64)
                elif base in ("int", "long"):
                    vals = (
                        col.fillna(0).to_numpy(dtype=np.int64)
                        if col.dtype.kind in "if"
                        else np.fromiter(
                            (0 if pd.isna(v) else int(v) for v in col), np.int64, n
                        )
                    )
                elif base in ("float", "double"):
                    vals = col.fillna(0.0).to_numpy(dtype=np.float64)
                elif base == "boolean":
                    vals = col.fillna(False).to_numpy(dtype=bool)
                else:  # string/bytes/null: python objects, nulls as None
                    vals = list(col.astype(object).where(col.notna(), None))
                cols.append((vals, nulls))
            yield pd.DataFrame(
                {"value": _encode_batch(fields, cols, n)}, dtype=object
            )

    return df.mapInPandas(enc, "value binary")


def avro_decode_df(df, schema: dict, spark_struct):
    """Arrow-batched decode: DataFrame with a binary ``value`` column →
    DataFrame typed as ``spark_struct`` (inverse of :func:`avro_encode_df`)."""
    import pandas as pd

    fields = _check_supported(schema)

    def dec(batches):
        # Vectorized batch decoder (_decode_batch): field-sequential
        # varint/pack passes over the concatenated payload buffer,
        # NaN-rejecting on this path (a decoded NaN would silently become
        # SQL NULL at the pandas→Arrow boundary). Pinned equal to the
        # per-record reference decoder in tests/test_avro_codec.py.
        for pdf in batches:
            cols = _decode_batch(fields, list(pdf["value"]), reject_nan=True)
            yield pd.DataFrame(
                {name: col for (name, _), col in zip(fields, cols)}, dtype=object
            )

    return df.mapInPandas(dec, spark_struct)
