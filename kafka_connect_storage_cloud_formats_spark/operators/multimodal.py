"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / frame-sample over ``mapInPandas``.

The container has no media codecs (PIL/librosa/av), so *real* decoding is
stubbed behind :func:`decode_media` (raises ``NotImplementedError``), and a
**deterministic fake decoder** (`payload bytes → uint8 "pixel" array`) backs
every operator — the Spark-side plumbing (BinaryType columns, Arrow batch
iteration, mapInPandas schemas, partition behavior) is real and oracle-
checked. Assets are synthesized from the ``documents`` table: payload =
UTF-8 bytes of ``text`` (ASCII corpus ⇒ byte == codepoint, which is what
lets DuckDB verify byte-level math via ``unicode()``), kind cycles
image/audio/video by ``doc_id % 3``.

Scale notes: every operator is a narrow map over the asset table — no
shuffles except final presentation sorts. ``mapInPandas`` streams Arrow
record batches (``spark.sql.execution.arrow.maxRecordsPerBatch``), so
executor memory is bounded by batch size, not partition size; at 100 TB the
asset table would be bucketed by media_id and the decode stage stays
embarrassingly parallel.

Reference parity note: the reference (kafka-connect-storage-cloud-formats)
has no multimodal surface; these are BASELINE.json north-star extensions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.catalog import load_table

FRAME_STRIDE = 256  # bytes per fake video frame
N_FEATURES = 8


def decode_media(payload: bytes, kind: str):
    """Decode a real image/audio/video payload. NOT IMPLEMENTED — this
    container ships no codecs; production deployments plug PIL / soundfile /
    PyAV in here. All shipped operators use :func:`fake_decode`."""
    raise NotImplementedError(
        f"no codec available for kind={kind!r}; use fake_decode (deterministic test decoder)"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes as a uint8 1-D 'pixel'
    array. Keeps every downstream shape/batch/schema path real."""
    return np.frombuffer(bytes(payload), dtype=np.uint8)


# ------------------------------------------------------------------ catalog
def media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (media_id, kind, payload:binary, text). The binary column
    is the engine's multimodal carrier; `text` rides along only so frame
    oracles can slice it."""
    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        "text",
    )


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata per asset: byte size, inferred image geometry
    (width = ⌈√n⌉, height = ⌈n/width⌉), frame count for videos, payload md5.
    Pure column expressions — whole-stage codegen, no Python."""
    a = media_assets(spark, sf_dir)
    n = F.length("payload").cast("long")
    width = F.ceil(F.sqrt(n.cast("double"))).cast("long")
    return (
        a.select(
            "media_id",
            "kind",
            n.alias("n_bytes"),
            width.alias("width"),
            F.ceil(n.cast("double") / width.cast("double")).cast("long").alias("height"),
            F.when(
                F.col("kind") == "video",
                (F.floor((n - 1) / FRAME_STRIDE) + 1).cast("long"),
            ).alias("n_frames"),
            F.md5("payload").alias("payload_md5"),
        )
        .orderBy("media_id")
    )


MEDIA_CATALOG_SQL = f"""
SELECT doc_id AS media_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ceil(sqrt(CAST(length(text) AS DOUBLE))) AS BIGINT) AS width,
       CAST(ceil(CAST(length(text) AS DOUBLE)
                 / CAST(ceil(sqrt(CAST(length(text) AS DOUBLE))) AS DOUBLE)) AS BIGINT)
         AS height,
       CASE WHEN doc_id % 3 = 2
            THEN (length(text) - 1) // {FRAME_STRIDE} + 1 END AS n_frames,
       md5(text) AS payload_md5
FROM documents
ORDER BY media_id
"""


# ------------------------------------------------- decode stats (mapInPandas)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image pixel statistics through the fake decoder, as exact integer
    sums (no float aggregation → bit-exact at any parallelism)."""
    imgs = media_assets(spark, sf_dir).filter(F.col("kind") == "image").select(
        "media_id", "payload"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [fake_decode(p).astype(np.int64) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_px": [a.size for a in px],
                    "sum_px": [int(a.sum()) for a in px],
                    # empty payload → NULL min/max, matching the oracle's
                    # list_min/list_max of [] (0 would silently diverge)
                    "min_px": [int(a.min()) if a.size else None for a in px],
                    "max_px": [int(a.max()) if a.size else None for a in px],
                }
            )

    schema = "media_id bigint, n_px bigint, sum_px bigint, min_px int, max_px int"
    return imgs.mapInPandas(stats, schema).orderBy("media_id")


IMAGE_DECODE_STATS_SQL = """
WITH px AS (
  SELECT doc_id AS media_id, CASE WHEN length(text) = 0 THEN CAST([] AS INTEGER[]) ELSE [unicode(c) for c in string_split(text, '')] END AS ps
  FROM documents WHERE doc_id % 3 = 0)
SELECT media_id,
       CAST(len(ps) AS BIGINT) AS n_px,
       CAST(coalesce(list_sum(ps), 0) AS BIGINT) AS sum_px,
       CAST(list_min(ps) AS INT) AS min_px,
       CAST(list_max(ps) AS INT) AS max_px
FROM px ORDER BY media_id
"""


# ------------------------------------------------- frame sampling (videos)
def video_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame table for video assets: one row per FRAME_STRIDE-byte frame,
    with the frame's payload-slice md5. `sequence` + `explode` keeps frame
    generation JVM-side; at scale this is the map stage feeding a
    frame-level pipeline (sampling = filter on frame_no % k)."""
    vids = (
        media_assets(spark, sf_dir)
        .filter(F.col("kind") == "video")
        .withColumn("n_bytes", F.length("payload").cast("long"))
    )
    # Guard the empty payload: for n_bytes = 0 the naive bound
    # floor((0-1)/STRIDE) = -1 makes sequence(0, -1) emit a DESCENDING
    # [0, -1] (two bogus frames, one with a negative offset) while the
    # oracle's range(0, 0) correctly emits none — same hazard class as the
    # word_shingles/doc_bigram_novelty short-input bugs.
    idx = F.when(
        F.col("n_bytes") > 0,
        F.sequence(
            F.lit(0).cast("long"), F.floor((F.col("n_bytes") - 1) / FRAME_STRIDE)
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    frames = vids.select("media_id", "text", F.explode(idx).alias("frame_no"))
    return (
        frames.select(
            "media_id",
            "frame_no",
            (F.col("frame_no") * FRAME_STRIDE).alias("frame_offset"),
            F.md5(
                F.encode(
                    F.substring(
                        F.col("text"), (F.col("frame_no") * FRAME_STRIDE + 1).cast("int"), FRAME_STRIDE
                    ),
                    "utf-8",
                )
            ).alias("frame_md5"),
        )
        .orderBy("media_id", "frame_no")
    )


VIDEO_FRAME_INDEX_SQL = f"""
WITH vids AS (
  SELECT doc_id AS media_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 2)
SELECT media_id, i AS frame_no, i * {FRAME_STRIDE} AS frame_offset,
       md5(substr(text, CAST(i * {FRAME_STRIDE} + 1 AS INT), {FRAME_STRIDE})) AS frame_md5
FROM vids, UNNEST(range(0, (n - 1) // {FRAME_STRIDE} + 1)) AS t(i)
ORDER BY media_id, frame_no
"""


# ------------------------------------------- feature extraction (mapInPandas)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-dim integer feature vector per asset, emitted as scalar columns
    f0..f7: f[k] = Σ payload bytes at positions ≡ k (mod 8). Exact ints →
    order-independent; the Arrow batch path is the same one a real embedding
    model would ride. Scalar (not array) output keeps the result hashable by
    any downstream comparator and columnar-prunable at rest."""
    assets = media_assets(spark, sf_dir).select("media_id", "payload")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {"media_id": pdf["media_id"]}
            arrs = [fake_decode(p).astype(np.int64) for p in pdf["payload"]]
            for k in range(N_FEATURES):
                cols[f"f{k}"] = [int(a[k::N_FEATURES].sum()) for a in arrs]
            yield pd.DataFrame(cols)

    schema = "media_id bigint, " + ", ".join(f"f{k} bigint" for k in range(N_FEATURES))
    return assets.mapInPandas(feats, schema).orderBy("media_id")


def _features_sql() -> str:
    sums = ", ".join(
        f"CAST(coalesce(list_sum([ps[CAST(i AS INT)] for i in range(1, len(ps) + 1) "
        f"if (i - 1) % {N_FEATURES} = {k}]), 0) AS BIGINT) AS f{k}"
        for k in range(N_FEATURES)
    )
    return f"""
WITH px AS (
  SELECT doc_id AS media_id, CASE WHEN length(text) = 0 THEN CAST([] AS INTEGER[]) ELSE [unicode(c) for c in string_split(text, '')] END AS ps
  FROM documents)
SELECT media_id, {sums} FROM px ORDER BY media_id
"""


MEDIA_FEATURES_SQL = _features_sql()


THUMB = 4  # thumbnail grid (THUMB × THUMB blocks)


def image_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each image to a 4×4 block-sum thumbnail through the fake
    decoder, emitted as scalar cells t0..t15: pixel (r,c) of the ⌈√n⌉-wide
    grid lands in block (r·4÷height, c·4÷width); each cell is the exact
    integer sum of its block. The real-resize drop-in would replace the
    bincount with a codec + interpolation inside the same mapInPandas
    stage."""
    imgs = media_assets(spark, sf_dir).filter(F.col("kind") == "image").select(
        "media_id", "payload"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                a = fake_decode(p).astype(np.int64)
                n = a.size
                width = math.ceil(math.sqrt(n))
                height = math.ceil(n / width) if width else 0
                idx = np.arange(n)
                r, c = idx // width, idx % width
                block = (r * THUMB // height) * THUMB + (c * THUMB // width)
                sums = np.bincount(block, weights=a, minlength=THUMB * THUMB)
                thumbs.append(sums[: THUMB * THUMB].astype(np.int64))
            cols = {"media_id": pdf["media_id"]}
            for k in range(THUMB * THUMB):
                cols[f"t{k}"] = [int(t[k]) for t in thumbs]
            yield pd.DataFrame(cols)

    schema = "media_id bigint, " + ", ".join(f"t{k} bigint" for k in range(THUMB * THUMB))
    return imgs.mapInPandas(resize, schema).orderBy("media_id")


def _resize_sql() -> str:
    cell = (
        "((((i - 1) // w) * {T} // h) * {T} + (((i - 1) % w) * {T} // w))".format(T=THUMB)
    )
    sums = ", ".join(
        f"CAST(coalesce(list_sum([ps[CAST(i AS INT)] for i in range(1, n + 1) "
        f"if {cell} = {k}]), 0) AS BIGINT) AS t{k}"
        for k in range(THUMB * THUMB)
    )
    return f"""
WITH px AS (
  SELECT doc_id AS media_id,
         CASE WHEN length(text) = 0 THEN CAST([] AS INTEGER[]) ELSE [unicode(c) for c in string_split(text, '')] END AS ps,
         length(text) AS n,
         CAST(ceil(sqrt(CAST(length(text) AS DOUBLE))) AS BIGINT) AS w,
         CAST(ceil(CAST(length(text) AS DOUBLE)
              / ceil(sqrt(CAST(length(text) AS DOUBLE)))) AS BIGINT) AS h
  FROM documents WHERE doc_id % 3 = 0)
SELECT media_id, {sums} FROM px ORDER BY media_id
"""


IMAGE_RESIZE_SQL = _resize_sql()


AUDIO_WINDOW = 256  # samples per analysis window (fake decoder: 1 byte = 1 sample)


def audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed energy analysis for audio assets: one row per
    AUDIO_WINDOW-sample window with exact integer sum-of-squares energy,
    peak amplitude and sample count — the feature a VAD / silence-trimming
    stage computes before segmenting audio for training. Exact ints →
    order-independent, hash-checkable; a real decoder would replace
    fake_decode in the same mapInPandas stage (same schema, same batching).

    Scale shape: narrow map over the asset table; each Arrow batch explodes
    to window rows bounded by batch size × windows-per-asset — no shuffle
    until the presentation sort."""
    auds = media_assets(spark, sf_dir).filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    )

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W = AUDIO_WINDOW
        for pdf in batches:
            # Decode is inherently per-payload (variable-length binary);
            # EVERYTHING after it is batch-level vectorized: concatenate all
            # assets' samples, derive each window's start offset, and
            # reduce with np.{add,maximum}.reduceat — windows tile each
            # asset exactly and assets are adjacent in the concatenation,
            # so consecutive reduceat segments ARE the windows. No
            # per-window (or per-asset) Python arithmetic.
            arrs = [fake_decode(p) for p in pdf["payload"]]
            lens = np.array([a.size for a in arrs], dtype=np.int64)
            nwin = -(-lens // W)  # ceil-div; 0 for empty payloads
            total = int(nwin.sum())
            if not total:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series([], dtype=np.int64),
                        "window_no": pd.Series([], dtype=np.int64),
                        "n_samples": pd.Series([], dtype=np.int64),
                        "energy": pd.Series([], dtype=np.int64),
                        "peak": pd.Series([], dtype=np.int32),
                    }
                )
                continue
            cat = np.concatenate(arrs).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))  # asset starts
            aidx = np.repeat(np.arange(len(arrs)), nwin)  # window → asset
            win_no = np.arange(total) - np.repeat(np.cumsum(nwin) - nwin, nwin)
            starts = offs[aidx] + win_no * W
            ends = np.minimum(starts + W, (offs + lens)[aidx])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(dtype=np.int64)[aidx],
                    "window_no": win_no,
                    "n_samples": ends - starts,
                    "energy": np.add.reduceat(cat * cat, starts),
                    "peak": np.maximum.reduceat(cat, starts).astype(np.int32),
                }
            )

    schema = "media_id bigint, window_no bigint, n_samples bigint, energy bigint, peak int"
    return auds.mapInPandas(energy, schema).orderBy("media_id", "window_no")


AUDIO_WINDOW_ENERGY_SQL = f"""
WITH auds AS (
  SELECT doc_id AS media_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 1),
win AS (
  SELECT media_id, i AS window_no,
         [unicode(c) for c in string_split(substr(text, CAST(i * {AUDIO_WINDOW} + 1 AS INT), {AUDIO_WINDOW}), '')] AS ps
  FROM auds, UNNEST(range(0, (n - 1) // {AUDIO_WINDOW} + 1)) AS t(i))
SELECT media_id, window_no,
       CAST(len(ps) AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(ps, x -> x * x)) AS BIGINT) AS energy,
       CAST(list_max(ps) AS INT) AS peak
FROM win
ORDER BY media_id, window_no
"""


SCENE_CUT_THRESHOLD = 4096  # |Σbytes(frame) − Σbytes(prev)| flagging a cut


def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the fake-decoded frame stream: per video,
    adjacent FRAME_STRIDE-byte frames are compared by exact integer
    byte-sum signature; a cut is flagged where the absolute delta crosses
    SCENE_CUT_THRESHOLD — the frame-sampling stage a video curation
    pipeline runs to pick representative frames (shot-boundary detection,
    the standard pre-step before per-shot captioning/embedding).

    Scale shape: the WHOLE detector runs inside ONE ``mapInPandas`` pass
    over the asset table — decode, frame split, signatures and adjacent
    deltas are all video-local, so there is no shuffle at all before the
    presentation sort, exactly how a production shot detector rides the
    decode pass. Integer signatures keep the row hash-exact on any
    engine (and the oracle replays the byte math via ``unicode()`` like
    every multimodal row)."""
    vids = (
        media_assets(spark, sf_dir)
        .filter(F.col("kind") == "video")
        .select("media_id", "payload")
    )

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_m, out_f, out_p, out_s, out_d = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = fake_decode(payload).astype(np.int64)
                if not len(a):
                    continue
                n_frames = (len(a) - 1) // FRAME_STRIDE + 1
                sums = [
                    int(a[i * FRAME_STRIDE : (i + 1) * FRAME_STRIDE].sum())
                    for i in range(n_frames)
                ]
                for i in range(1, n_frames):
                    delta = abs(sums[i] - sums[i - 1])
                    if delta >= SCENE_CUT_THRESHOLD:
                        out_m.append(int(mid))
                        out_f.append(i)
                        out_p.append(sums[i - 1])
                        out_s.append(sums[i])
                        out_d.append(delta)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_m, dtype="int64"),
                    "frame_no": pd.Series(out_f, dtype="int64"),
                    "prev_sum": pd.Series(out_p, dtype="int64"),
                    "frame_sum": pd.Series(out_s, dtype="int64"),
                    "delta": pd.Series(out_d, dtype="int64"),
                }
            )

    return vids.mapInPandas(
        cuts,
        "media_id bigint, frame_no bigint, prev_sum bigint, frame_sum bigint, delta bigint",
    ).orderBy("media_id", "frame_no")


VIDEO_SCENE_CUTS_SQL = f"""
WITH vids AS (
  SELECT doc_id AS media_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0),
frames AS (
  SELECT media_id, i AS frame_no,
         CAST(coalesce(list_sum([unicode(c) for c in
              string_split(substr(text, CAST(i * {FRAME_STRIDE} + 1 AS INT), {FRAME_STRIDE}), '')]), 0) AS BIGINT) AS fsum
  FROM vids, UNNEST(range(0, (n - 1) // {FRAME_STRIDE} + 1)) AS t(i)),
lagged AS (
  SELECT media_id, frame_no, fsum,
         LAG(fsum) OVER (PARTITION BY media_id ORDER BY frame_no) AS prev
  FROM frames)
SELECT media_id, frame_no, prev AS prev_sum, fsum AS frame_sum,
       ABS(fsum - prev) AS delta
FROM lagged
WHERE prev IS NOT NULL AND ABS(fsum - prev) >= {SCENE_CUT_THRESHOLD}
ORDER BY media_id, frame_no
"""


MULTIMODAL_QUERIES = {
    "video_scene_cuts": (video_scene_cuts, VIDEO_SCENE_CUTS_SQL),
    "media_catalog": (media_catalog, MEDIA_CATALOG_SQL),
    "image_decode_stats": (image_decode_stats, IMAGE_DECODE_STATS_SQL),
    "video_frame_index": (video_frame_index, VIDEO_FRAME_INDEX_SQL),
    "media_feature_extract": (media_feature_extract, MEDIA_FEATURES_SQL),
    "image_resize_thumbnail": (image_resize_thumbnail, IMAGE_RESIZE_SQL),
    "audio_window_energy": (audio_window_energy, AUDIO_WINDOW_ENERGY_SQL),
}
