"""Multimodal plumbing tests: binary columns, mapInPandas batching, stubs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.operators.multimodal import (
    FRAME_STRIDE,
    decode_media,
    fake_decode,
    image_decode_stats,
    media_assets,
    media_catalog,
    media_feature_extract,
    video_frame_index,
)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image")


def test_fake_decode_deterministic():
    assert fake_decode(b"abc").tolist() == [97, 98, 99]
    assert fake_decode(b"").size == 0


def test_payload_is_binary_type(spark, sf_dir):
    a = media_assets(spark, sf_dir)
    assert dict(a.dtypes)["payload"] == "binary"
    row = a.filter(F.col("media_id") == 0).first()
    assert bytes(row["payload"]) == row["text"].encode()


def test_catalog_geometry(spark, sf_dir):
    for r in media_catalog(spark, sf_dir).limit(50).collect():
        assert r["width"] * r["height"] >= r["n_bytes"]
        assert (r["width"] - 1) ** 2 < r["n_bytes"]
        if r["kind"] == "video":
            assert r["n_frames"] == (r["n_bytes"] - 1) // FRAME_STRIDE + 1
        else:
            assert r["n_frames"] is None


def test_decode_stats_match_python(spark, sf_dir):
    stats = {r["media_id"]: r for r in image_decode_stats(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id % 3 = 0")
    for d in docs.limit(20).collect():
        px = np.frombuffer(d["text"].encode(), dtype=np.uint8).astype(int)
        r = stats[d["doc_id"]]
        assert (r["n_px"], r["sum_px"], r["min_px"], r["max_px"]) == (
            px.size,
            px.sum(),
            px.min(),
            px.max(),
        )


def test_frame_sampling_stride(spark, sf_dir):
    """Every-4th-frame sampling is a filter on the frame index."""
    frames = video_frame_index(spark, sf_dir)
    sampled = frames.filter(F.col("frame_no") % 4 == 0)
    assert sampled.count() <= frames.count()
    assert frames.filter(F.col("frame_offset") != F.col("frame_no") * FRAME_STRIDE).count() == 0


def test_feature_vector_shape(spark, sf_dir):
    feats = media_feature_extract(spark, sf_dir)
    first = feats.first()
    fvals = [first[f"f{k}"] for k in range(8)]
    assert len(fvals) == 8
    # feature sum equals total byte sum
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") == first["media_id"]
    ).first()
    assert sum(fvals) == sum(doc["text"].encode())


def test_feature_extract_under_streaming(spark, sf_dir, tmp_path):
    """The Arrow mapInPandas feature extractor runs unchanged under
    Structured Streaming and produces the batch result."""
    from kafka_connect_storage_cloud_formats_spark.operators.multimodal import N_FEATURES

    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
    )

    import numpy as np
    import pandas as pd

    def feats(batches):
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                a = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                out.append([int(a[k::N_FEATURES].sum()) for k in range(N_FEATURES)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": out})

    q = (
        stream.mapInPandas(feats, "media_id bigint, features array<bigint>")
        .writeStream.format("memory")
        .queryName("stream_feats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["media_id"]: list(r["features"]) for r in spark.table("stream_feats").collect()}
    from kafka_connect_storage_cloud_formats_spark.operators.multimodal import media_feature_extract

    want = {
        r["media_id"]: [r[f"f{k}"] for k in range(N_FEATURES)]
        for r in media_feature_extract(spark, sf_dir).collect()
    }
    assert got == want


def test_audio_window_energy_matches_python(spark, sf_dir):
    """Window energies equal a direct NumPy computation on the payload."""
    from kafka_connect_storage_cloud_formats_spark.operators.multimodal import (
        AUDIO_WINDOW,
        audio_window_energy,
    )

    rows = audio_window_energy(spark, sf_dir).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id % 3 = 1")
    for d in docs.limit(10).collect():
        a = np.frombuffer(d["text"].encode(), dtype=np.uint8).astype(np.int64)
        got = sorted(by_media[d["doc_id"]], key=lambda r: r["window_no"])
        assert len(got) == (a.size - 1) // AUDIO_WINDOW + 1
        for r in got:
            seg = a[r["window_no"] * AUDIO_WINDOW : (r["window_no"] + 1) * AUDIO_WINDOW]
            assert r["n_samples"] == seg.size
            assert r["energy"] == int((seg * seg).sum())
            assert r["peak"] == int(seg.max())


def test_empty_payload_oracle_parity(spark, tmp_path):
    """Round-9 review: DuckDB string_split('', '') yields [''] (→ [-1]
    via unicode), not [] — on an empty document the decode-stats/features
    oracles silently diverged from the engine (n_px=1/sum=-1 vs 0/NULL).
    Pin engine == oracle on a corpus that CONTAINS an empty doc (the
    shipped corpora have none; a regenerated one might)."""
    import duckdb

    from kafka_connect_storage_cloud_formats_spark.operators.multimodal import (
        IMAGE_DECODE_STATS_SQL,
        image_decode_stats,
    )

    corpus = tmp_path / "sfempty"
    corpus.mkdir()
    rows = [(0, "", "web", 0, "en"), (3, "abc", "web", 3, "en")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long, lang string"
    ).coalesce(1).write.parquet(str(corpus / "documents.parquet"))

    got = sorted(map(tuple, image_decode_stats(spark, str(corpus)).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.sql(IMAGE_DECODE_STATS_SQL).fetchall()))
    assert got == want
    empty_row = [r for r in got if r[0] == 0][0]
    assert empty_row[1] == 0 and empty_row[2] == 0  # n_px=0, sum_px=0
    assert empty_row[3] is None and empty_row[4] is None  # min/max NULL


def test_video_scene_cuts_matches_python(spark, sf_dir):
    """Scene-cut rows pinned against an independent Python replay over the
    real corpus: same frame split, same integer signatures, same
    threshold — and every emitted row's arithmetic is internally
    consistent (delta = |frame_sum − prev_sum| ≥ threshold)."""
    from kafka_connect_storage_cloud_formats_spark.operators.multimodal import (
        SCENE_CUT_THRESHOLD,
        video_scene_cuts,
    )

    expected = {}
    for r in (
        media_assets(spark, sf_dir).filter(F.col("kind") == "video").collect()
    ):
        a = fake_decode(r["payload"])
        if not len(a):
            continue
        n_frames = (len(a) - 1) // FRAME_STRIDE + 1
        sums = [
            int(a[i * FRAME_STRIDE : (i + 1) * FRAME_STRIDE].astype(np.int64).sum())
            for i in range(n_frames)
        ]
        for i in range(1, n_frames):
            d = abs(sums[i] - sums[i - 1])
            if d >= SCENE_CUT_THRESHOLD:
                expected[(r["media_id"], i)] = (sums[i - 1], sums[i], d)
    got = {
        (r["media_id"], r["frame_no"]): (r["prev_sum"], r["frame_sum"], r["delta"])
        for r in video_scene_cuts(spark, sf_dir).collect()
    }
    assert got == expected and len(got) > 0
    for (_, fno), (p, s, d) in got.items():
        assert fno >= 1 and d == abs(s - p) and d >= SCENE_CUT_THRESHOLD
