"""Structural pins for the PQ tier (oracle parity is the driver gate —
the registered rows replay the full 8-subspace training in SQL; these
pin what a hash equality can't express: partitioning invariance, code
validity, ADC semantics vs an independent NumPy reconstruction, and the
measured compression/recall trade)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.operators.pq import (
    PQ_DS,
    PQ_KSUB,
    PQ_M,
    _assign_pq,
    _collect_pq_matrices,
    _update_pq_centroids,
    _codes_long,
    pq_recall_at_10,
    pq_topk,
    train_pq,
)
from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
    DIM,
    QUERY_MOD,
    RERANK_CANDIDATES,
    TOP_K,
)


def _seed_codebooks(emb):
    seed_rows = emb.orderBy("vec_id").limit(PQ_KSUB).collect()
    seed = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in seed_rows])
    return [
        (np.arange(PQ_KSUB, dtype=np.int64), seed[:, s * PQ_DS : (s + 1) * PQ_DS].copy())
        for s in range(PQ_M)
    ]


def test_pq_assign_and_update_partition_invariant(spark, sf_dir):
    """One assign+update round must be bit-identical over a repartitioned
    corpus: the assignment is a fixed vectorized expression per row and
    the update is an associative decimal sum."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    CB = _seed_codebooks(emb)
    base_codes = {
        (r["vec_id"], tuple(r["codes"])) for r in _assign_pq(emb, CB).collect()
    }
    shuf_codes = {
        (r["vec_id"], tuple(r["codes"]))
        for r in _assign_pq(emb.repartition(7), CB).collect()
    }
    assert base_codes == shuf_codes
    u1 = {
        (r["sub"], r["label"], r["dim"]): r["centroid"]
        for r in _update_pq_centroids(emb, _codes_long(_assign_pq(emb, CB))).collect()
    }
    u2 = {
        (r["sub"], r["label"], r["dim"]): r["centroid"]
        for r in _update_pq_centroids(
            emb.repartition(5), _codes_long(_assign_pq(emb.repartition(5), CB))
        ).collect()
    }
    assert u1 == u2


def test_assign_pq_carry_cluster_bit_identical(spark, sf_dir):
    """carry_cluster=True (the map-only segment-writer path, r15
    optimization) must change NOTHING but the column set: identical
    (vec_id, codes) pairs, and the echoed cluster bit-equal to the input
    (it crosses the Arrow boundary but no arithmetic)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    CB = _seed_codebooks(emb)
    plain = {
        (r["vec_id"], tuple(r["codes"])) for r in _assign_pq(emb, CB).collect()
    }
    with_cluster = emb.withColumn("cluster", F.col("vec_id") % 7)
    carried = _assign_pq(with_cluster, CB, carry_cluster=True).collect()
    assert {(r["vec_id"], tuple(r["codes"])) for r in carried} == plain
    assert all(r["cluster"] == r["vec_id"] % 7 for r in carried)


def test_residualize_prejoined_matches_joined(spark, sf_dir):
    """_residualize_with(assignment=None) over an assign-with-carry pass
    must produce bit-identical residuals to the joined path (same kernel,
    same cluster routing — only the join is gone)."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        _assign_clusters,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        _residualize_with,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seed_rows = emb.orderBy("vec_id").limit(4).collect()
    labels = np.arange(4, dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in seed_rows])
    joined = {
        r["vec_id"]: tuple(r["embedding"])
        for r in _residualize_with(
            emb, _assign_clusters(emb, labels, M), labels, M
        ).collect()
    }
    carried = _assign_clusters(emb, labels, M, carry_embedding=True)
    prejoined = _residualize_with(carried, None, labels, M, carry_cluster=True)
    got = {r["vec_id"]: tuple(r["embedding"]) for r in prejoined.collect()}
    assert got == joined
    clusters = {
        (r["vec_id"], r["cluster"])
        for r in _assign_clusters(emb, labels, M).collect()
    }
    assert {
        (r["vec_id"], r["cluster"]) for r in prejoined.collect()
    } == clusters


def test_pq_codes_artifact_shape_and_range(spark, sf_dir):
    """Every corpus vector carries exactly PQ_M codes, each referencing a
    PUBLISHED codebook cell of its subspace (codes can never point at an
    empty cell: the published codebooks are means of the final
    assignment, so every assigned cell has members)."""
    codes, cents = train_pq(spark, sf_dir)
    n_corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = codes.collect()
    assert len(rows) == n_corpus
    CB = _collect_pq_matrices(cents)
    valid = [set(labels.tolist()) for labels, _ in CB]
    for r in rows:
        assert len(r["codes"]) == PQ_M
        for s, c in enumerate(r["codes"]):
            assert c in valid[s], (r["vec_id"], s, c)


def test_pq_adc_candidates_match_numpy_reconstruction(spark, sf_dir):
    """The served top-k must equal an independent NumPy replay of the
    whole probe: gather reconstructions from the published codebooks,
    ADC-score, take top-RERANK candidates, exact-cosine re-rank, top-k.
    (Float-order differences are irrelevant at the set level here; the
    bit-level contract is the driver's oracle hash.)"""
    codes_df, cents = train_pq(spark, sf_dir)
    CB = _collect_pq_matrices(cents)
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    codes = {r["vec_id"]: list(r["codes"]) for r in codes_df.collect()}
    ids = np.array(sorted(emb), dtype=np.int64)
    R = np.empty((len(ids), DIM))
    dense = []
    for labels, M in CB:
        d = np.full((PQ_KSUB, PQ_DS), np.nan)
        d[labels] = M
        dense.append(d)
    for i, v in enumerate(ids):
        for s in range(PQ_M):
            R[i, s * PQ_DS : (s + 1) * PQ_DS] = dense[s][codes[v][s]]
    got = {}
    for r in pq_topk(spark, sf_dir).collect():
        got.setdefault(r["q_id"], []).append(r["neighbor_id"])
    # QUERY_MOD, not a hardcoded 50 (round-14 ADVICE): the engine's
    # _collect_query_matrix selects by this constant — a retuned constant
    # must move the replayed query set with it, not silently fork it.
    q_ids = [v for v in ids if v % QUERY_MOD == 0]
    assert set(got) == set(q_ids)
    for q in q_ids:
        adc = R @ emb[q]
        mask = ids != q
        order = np.lexsort((ids[mask], -adc[mask]))[:RERANK_CANDIDATES]
        cand = ids[mask][order]
        qn = np.sqrt(emb[q] @ emb[q])
        cos = {
            c: float(emb[c] @ emb[q]) / (np.sqrt(emb[c] @ emb[c]) * qn) for c in cand
        }
        expect = sorted(cand, key=lambda c: (-cos[c], c))[:TOP_K]
        assert got[q] == expect, q


def test_ivfpq_full_probe_equals_full_scan_pq(spark, sf_dir):
    """At nprobe = k the cell routing prunes nothing, so the composed
    IVFPQ path must serve exactly the full-scan PQ tier's rows — the
    same full-width invariant every coarse-quantizer tier pins."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import KMEANS_K
    from kafka_connect_storage_cloud_formats_spark.operators.pq import ivfpq_topk

    full = sorted(map(tuple, ivfpq_topk(spark, sf_dir, nprobe=KMEANS_K).collect()))
    pq = sorted(map(tuple, pq_topk(spark, sf_dir).collect()))
    assert full == pq


def test_ivfpq_candidates_come_only_from_routed_cells(spark, sf_dir):
    """Every served neighbor must live in one of its query's top-nprobe
    trained cells (the pruning contract), and the recall row must be
    sane. (No ordering vs the full-scan PQ row is asserted: pruning
    usually costs recall but can also evict high-ADC distractors from
    the bounded candidate set, so neither direction is a theorem.)"""
    import numpy as np

    from kafka_connect_storage_cloud_formats_spark.functions.vectors import _seq_dot
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        SERVING_NPROBE,
        _collect_centroid_matrix,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        ivfpq_recall_at_10,
        ivfpq_topk,
    )

    assignment, cent_long = train_kmeans_quantizer(spark, sf_dir)
    cells = {r["vec_id"]: r["cluster"] for r in assignment.collect()}
    labels, M = _collect_centroid_matrix(cent_long)
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    cn = np.sqrt(_seq_dot(M, M))
    routed = {}
    for q in sorted(v for v in emb if v % QUERY_MOD == 0):
        s = np.zeros(M.shape[0])
        for d in range(M.shape[1]):
            s += emb[q][d] * M[:, d]
        s /= np.sqrt(emb[q] @ emb[q]) * cn
        order = np.lexsort((labels, -s))[:SERVING_NPROBE]
        routed[q] = set(labels[order].tolist())
    for r in ivfpq_topk(spark, sf_dir).collect():
        assert cells[r["neighbor_id"]] in routed[r["q_id"]], r
    rec = ivfpq_recall_at_10(spark, sf_dir).collect()[0]
    assert 0.0 < rec["recall"] <= 1.0
    assert rec["possible"] == rec["n_queries"] * TOP_K


def test_pq_recall_row_sane_and_deterministic(spark, sf_dir):
    r1 = pq_recall_at_10(spark, sf_dir).collect()[0]
    r2 = pq_recall_at_10(spark, sf_dir).collect()[0]
    assert r1 == r2
    assert 0.0 < r1["recall"] <= 1.0
    assert r1["hits"] <= r1["possible"]
    assert r1["possible"] == r1["n_queries"] * TOP_K


# ------------------------------------------- incremental serving (round 15)


def test_pq_upsert_segment_covers_exactly_the_drop(spark, sf_dir):
    """The published code segment must hold EXACTLY the drop's vectors
    (the standard modular split), each with codes referencing published
    SPLIT-codebook cells and the coarse label the published split
    quantizer assigns — the encode/assign-without-retrain contract."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        UPSERT_MOD,
        assign_to_published_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        build_pq_upsert_segment,
        train_pq,
    )

    seg = spark.read.parquet(build_pq_upsert_segment(spark, sf_dir)).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    batch_ids = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % UPSERT_MOD == UPSERT_MOD - 1).collect()
    }
    assert {r["vec_id"] for r in seg} == batch_ids
    _, cents = train_pq(spark, sf_dir, split="corpus")
    valid = [set(labels.tolist()) for labels, _ in _collect_pq_matrices(cents)]
    expected_cells = {
        r["vec_id"]: r["cluster"]
        for r in assign_to_published_quantizer(
            spark,
            sf_dir,
            emb.filter(F.col("vec_id") % UPSERT_MOD == UPSERT_MOD - 1),
        ).collect()
    }
    for r in seg:
        assert len(r["codes"]) == PQ_M
        for s, c in enumerate(r["codes"]):
            assert c in valid[s], (r["vec_id"], s, c)
        assert int(r["label"]) == expected_cells[r["vec_id"]]


def test_ivfpq_upserted_full_probe_equals_lut_full_scan(spark, sf_dir):
    """At nprobe = k the cell routing prunes nothing, so the upserted
    probe must serve exactly a NumPy full-scan LUT-ADC replay over the
    serving view (split codebooks, main ∪ segment codes) + exact
    re-rank — the full-width invariant of the incremental tier."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_K,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        _ivfpq_serving_members,
        ivfpq_topk_upserted,
        train_pq,
    )

    _, cents = train_pq(spark, sf_dir, split="corpus")
    CB = _collect_pq_matrices(cents)
    members = {
        r["vec_id"]: list(r["codes"])
        for r in _ivfpq_serving_members(spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    assert set(members) == set(emb)  # serving view covers every vector once
    got = {}
    for r in ivfpq_topk_upserted(spark, sf_dir, nprobe=KMEANS_K).collect():
        got.setdefault(r["q_id"], []).append(r["neighbor_id"])
    q_ids = sorted(v for v in emb if v % QUERY_MOD == 0)
    assert set(got) == set(q_ids)
    ids = np.array(sorted(members), dtype=np.int64)
    for q in q_ids:
        lut = []
        for s, (labels, M) in enumerate(CB):
            qs = emb[q][s * PQ_DS : (s + 1) * PQ_DS]
            lut.append({int(l): float(M[i] @ qs) for i, l in enumerate(labels)})
        adc = np.array(
            [sum(lut[s][members[v][s]] for s in range(PQ_M)) for v in ids]
        )
        mask = ids != q
        order = np.lexsort((ids[mask], -adc[mask]))[:RERANK_CANDIDATES]
        cand = ids[mask][order]
        qn = np.sqrt(emb[q] @ emb[q])
        cos = {
            c: float(emb[c] @ emb[q]) / (np.sqrt(emb[c] @ emb[c]) * qn) for c in cand
        }
        expect = sorted(cand, key=lambda c: (-cos[c], c))[:TOP_K]
        assert got[q] == expect, q


def test_ivfpq_upserted_recall_sane(spark, sf_dir):
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        ivfpq_recall_upserted,
    )

    rec = ivfpq_recall_upserted(spark, sf_dir).collect()[0]
    assert 0.0 < rec["recall"] <= 1.0
    assert rec["possible"] == rec["n_queries"] * TOP_K


# ------------------------------------------- residual encoding (round 15)


def test_ivfpq_residual_full_probe_matches_numpy_replay(spark, sf_dir):
    """At nprobe = k the residual probe must serve exactly the NumPy
    replay of its own contract: approx(v) = dot(q, centroid(cell(v))) +
    Σ_s LUT_s(residual code) over ALL corpus vectors, then the bounded
    exact re-rank — pinning the centroid-term ADC semantics end-to-end."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_K,
        _collect_centroid_matrix,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        ivfpq_residual_topk,
        train_pq,
    )

    assignment, cent_long = train_kmeans_quantizer(spark, sf_dir)
    cells = {r["vec_id"]: r["cluster"] for r in assignment.collect()}
    labels, M = _collect_centroid_matrix(cent_long)
    cpos = {int(l): i for i, l in enumerate(labels)}
    codes_df, cents = train_pq(spark, sf_dir, residual=True)
    CB = _collect_pq_matrices(cents)
    codes = {r["vec_id"]: list(r["codes"]) for r in codes_df.collect()}
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    got = {}
    for r in ivfpq_residual_topk(spark, sf_dir, nprobe=KMEANS_K).collect():
        got.setdefault(r["q_id"], []).append(r["neighbor_id"])
    q_ids = sorted(v for v in emb if v % QUERY_MOD == 0)
    assert set(got) == set(q_ids)
    ids = np.array(sorted(emb), dtype=np.int64)
    for q in q_ids:
        lut = []
        for s, (slabels, SM) in enumerate(CB):
            qs = emb[q][s * PQ_DS : (s + 1) * PQ_DS]
            lut.append({int(l): float(SM[i] @ qs) for i, l in enumerate(slabels)})
        adc = np.array(
            [
                float(emb[q] @ M[cpos[cells[v]]])
                + sum(lut[s][codes[v][s]] for s in range(PQ_M))
                for v in ids
            ]
        )
        mask = ids != q
        order = np.lexsort((ids[mask], -adc[mask]))[:RERANK_CANDIDATES]
        cand = ids[mask][order]
        qn = np.sqrt(emb[q] @ emb[q])
        cos = {
            c: float(emb[c] @ emb[q]) / (np.sqrt(emb[c] @ emb[c]) * qn) for c in cand
        }
        expect = sorted(cand, key=lambda c: (-cos[c], c))[:TOP_K]
        assert got[q] == expect, q


def test_ivfpq_residual_upserted_full_probe_matches_numpy_replay(spark, sf_dir):
    """The residual × incremental composition at nprobe = k: the probe
    must serve exactly the NumPy replay of approx(v) = dot(q,
    split-centroid(cell(v))) + Σ_s LUT_s(residual code) over the SERVING
    view (split residual codes ∪ residual segment), where the segment's
    cells/codes come from the published split structures — pinning the
    whole encode-without-retrain residual path end-to-end."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_K,
        UPSERT_MOD,
        _collect_centroid_matrix,
        assign_to_published_quantizer,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        _ivfpq_serving_members,
        ivfpq_residual_topk_upserted,
        train_pq,
    )

    emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb_df.collect()
    }
    members = {
        r["vec_id"]: (r["label"], list(r["codes"]))
        for r in _ivfpq_serving_members(spark, sf_dir, residual=True).collect()
    }
    assert set(members) == set(emb)  # serving view covers every vector once
    # segment cells must equal the published split quantizer's assignment
    batch = emb_df.filter(F.col("vec_id") % UPSERT_MOD == UPSERT_MOD - 1)
    expected_cells = {
        r["vec_id"]: r["cluster"]
        for r in assign_to_published_quantizer(spark, sf_dir, batch).collect()
    }
    for v, c in expected_cells.items():
        assert members[v][0] == c
    _, cent_long = train_kmeans_quantizer(spark, sf_dir, split="corpus")
    labels, M = _collect_centroid_matrix(cent_long)
    cpos = {int(l): i for i, l in enumerate(labels)}
    _, cents = train_pq(spark, sf_dir, split="corpus", residual=True)
    CB = _collect_pq_matrices(cents)
    got = {}
    for r in ivfpq_residual_topk_upserted(spark, sf_dir, nprobe=KMEANS_K).collect():
        got.setdefault(r["q_id"], []).append(r["neighbor_id"])
    q_ids = sorted(v for v in emb if v % QUERY_MOD == 0)
    assert set(got) == set(q_ids)
    ids = np.array(sorted(members), dtype=np.int64)
    for q in q_ids:
        lut = []
        for s, (slabels, SM) in enumerate(CB):
            qs = emb[q][s * PQ_DS : (s + 1) * PQ_DS]
            lut.append({int(l): float(SM[i] @ qs) for i, l in enumerate(slabels)})
        adc = np.array(
            [
                float(emb[q] @ M[cpos[members[v][0]]])
                + sum(lut[s][members[v][1][s]] for s in range(PQ_M))
                for v in ids
            ]
        )
        mask = ids != q
        order = np.lexsort((ids[mask], -adc[mask]))[:RERANK_CANDIDATES]
        cand = ids[mask][order]
        qn = np.sqrt(emb[q] @ emb[q])
        cos = {
            c: float(emb[c] @ emb[q]) / (np.sqrt(emb[c] @ emb[c]) * qn) for c in cand
        }
        expect = sorted(cand, key=lambda c: (-cos[c], c))[:TOP_K]
        assert got[q] == expect, q


def test_ivfpq_residual_upserted_recall_sane(spark, sf_dir):
    from kafka_connect_storage_cloud_formats_spark.operators.pq import (
        ivfpq_residual_recall_upserted,
    )

    rec = ivfpq_residual_recall_upserted(spark, sf_dir).collect()[0]
    assert 0.0 < rec["recall"] <= 1.0
    assert rec["possible"] == rec["n_queries"] * TOP_K


def test_residual_codes_decode_closer_than_raw(spark, sf_dir):
    """The POINT of residual encoding: mean squared reconstruction error
    of (centroid + residual-decode) must beat raw-codebook decode — the
    within-cell budget argument (FAISS IVFPQ §III-C) as a measured fact
    on the real corpus."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        _collect_centroid_matrix,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.pq import train_pq

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }

    def decode(codes_df, cents, base):
        CB = _collect_pq_matrices(cents)
        dense = []
        for labels, M in CB:
            d = np.full((PQ_KSUB, PQ_DS), np.nan)
            d[labels] = M
            dense.append(d)
        err = 0.0
        for r in codes_df.collect():
            v = r["vec_id"]
            rec = np.concatenate(
                [dense[s][r["codes"][s]] for s in range(PQ_M)]
            ) + base.get(v, 0.0)
            err += float(((emb[v] - rec) ** 2).sum())
        return err / len(emb)

    raw_codes, raw_cents = train_pq(spark, sf_dir)
    raw_err = decode(raw_codes, raw_cents, {})
    assignment, cent_long = train_kmeans_quantizer(spark, sf_dir)
    labels, M = _collect_centroid_matrix(cent_long)
    cpos = {int(l): i for i, l in enumerate(labels)}
    cells = {r["vec_id"]: r["cluster"] for r in assignment.collect()}
    base = {v: M[cpos[c]] for v, c in cells.items()}
    res_codes, res_cents = train_pq(spark, sf_dir, residual=True)
    res_err = decode(res_codes, res_cents, base)
    assert res_err < raw_err, (res_err, raw_err)
