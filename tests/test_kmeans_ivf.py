"""Structural correctness for the trained IVF quantizer. Since round 10
the registered ivf_kmeans_* trio ALSO carries a full DuckDB oracle (the
left-associated trainer unrolls into SQL — kmeans_ivf._kmeans_training_ctes),
so the driver hash-gates training end-to-end; these tests pin the
properties an oracle equality can't express: determinism across
partitioning, convergence direction, full-probe equivalence to brute
force, and the measured recall benefit over the label quantizer."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
    _assign_clusters,
    _collect_centroid_matrix,
    _update_centroids,
    ivf_kmeans_topk,
    train_kmeans_quantizer,
)
from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
    ensure_knn_ground_truth,
    ivf_topk,
    knn_bruteforce,
)

K, ITERS = 8, 3  # small-corpus test parameters (sf0.001: 500 vectors)


def test_kmeans_assignment_partition_invariant(spark, sf_dir):
    """The whole training loop must be partitioning-independent: the
    assignment artifact derivation re-run over a repartitioned corpus
    produces bit-identical clusters (associative decimal update + fixed
    vectorized assignment)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seed = emb.orderBy("vec_id").limit(K).collect()
    labels = np.arange(K, dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in seed])
    base = {
        (r["vec_id"], r["cluster"]) for r in _assign_clusters(emb, labels, M).collect()
    }
    shuffled = {
        (r["vec_id"], r["cluster"])
        for r in _assign_clusters(emb.repartition(7), labels, M).collect()
    }
    assert base == shuffled
    c1 = {
        (r["label"], r["dim"]): r["centroid"]
        for r in _update_centroids(emb, _assign_clusters(emb, labels, M)).collect()
    }
    c2 = {
        (r["label"], r["dim"]): r["centroid"]
        for r in _update_centroids(
            emb.repartition(5), _assign_clusters(emb.repartition(3), labels, M)
        ).collect()
    }
    assert c1 == c2  # exact doubles — decimal sums are associative


def test_kmeans_spherical_objective_non_decreasing(spark, sf_dir):
    """Spherical Lloyd's invariant: the summed best-cell cosine
    (the objective BOTH steps optimize — assignment picks each point's
    max-cosine cell, the normalized-member mean is the direction
    maximizing the summed cosine for a fixed assignment) is
    non-decreasing over iterations."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seed = emb.orderBy("vec_id").limit(K).collect()
    labels = np.arange(K, dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in seed])
    E = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.orderBy("vec_id").collect()]
    )
    En = E / np.linalg.norm(E, axis=1, keepdims=True)

    def objective(M_):
        cn = np.linalg.norm(M_, axis=1, keepdims=True)
        Mn = M_ / np.where(cn == 0.0, 1.0, cn)
        return (En @ Mn.T).max(axis=1).sum()

    objs = [objective(M)]
    for _ in range(ITERS):
        assignment = _assign_clusters(emb, labels, M)
        new_labels, new_M = _collect_centroid_matrix(
            _update_centroids(emb, assignment)
        )
        keep = np.isin(labels, new_labels, invert=True)
        if keep.any():
            new_labels = np.concatenate([new_labels, labels[keep]])
            new_M = np.concatenate([new_M, M[keep]])
            order = np.argsort(new_labels)
            new_labels, new_M = new_labels[order], new_M[order]
        labels, M = new_labels, new_M
        objs.append(objective(M))
    for a, b in zip(objs, objs[1:]):
        assert b >= a - 1e-9, objs


def test_kmeans_full_probe_equals_bruteforce(spark, sf_dir):
    """nprobe = k probes every trained cell — bit-equal to brute force,
    the same invariant as the label quantizer."""
    bf = sorted(map(tuple, knn_bruteforce(spark, sf_dir).collect()))
    full = sorted(
        map(
            tuple,
            ivf_kmeans_topk(spark, sf_dir, k=K, iters=ITERS, nprobe=K).collect(),
        )
    )
    assert full == bf


def test_cell_stats_match_numpy_and_cover_corpus(spark, sf_dir):
    """The health report pinned against a NumPy replay over the engine's
    own artifacts: occupancy must exactly partition the corpus, and each
    cell's decimal-exact mean cosine must agree with a float recompute
    (tolerance 1e-9 — the fixed-point mean differs from a float mean by
    < 1 ulp · n / 1e15)."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        _collect_centroid_matrix,
        ivf_kmeans_cell_stats,
    )

    rows = {r["label"]: r for r in ivf_kmeans_cell_stats(spark, sf_dir).collect()}
    assignment, cent_long = train_kmeans_quantizer(spark, sf_dir)
    labels, M = _collect_centroid_matrix(cent_long)
    cent = {int(l): M[i] for i, l in enumerate(labels)}
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    cells: dict = {}
    for r in assignment.collect():
        cells.setdefault(r["cluster"], []).append(r["vec_id"])
    assert sum(v["n_vectors"] for v in rows.values()) == len(emb)
    assert set(rows) == set(cells)
    for lb, members in cells.items():
        assert rows[lb]["n_vectors"] == len(members)
        c = cent[lb]
        cn = float(np.sqrt(c @ c))
        cos = [
            float(emb[v] @ c) / (float(np.sqrt(emb[v] @ emb[v])) * cn)
            for v in members
        ]
        assert abs(rows[lb]["mean_cosine"] - sum(cos) / len(cos)) < 1e-9
        assert -1.0 - 1e-9 <= rows[lb]["mean_cosine"] <= 1.0 + 1e-9


def test_dedup_semantic_matches_within_cluster_bruteforce(spark, sf_dir):
    """SemDeDup semantics pinned against an independent NumPy brute force
    over the engine's own trained cells: a vector is dropped iff some
    lower-id cluster-mate has cosine >= threshold; exemplar = (max
    cosine, then min id). The oracle gate bit-checks the same chain via
    SQL; this pins the SEMANTICS against a non-SQL reference and the
    containment facts the hash can't articulate."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        SEMANTIC_DUP_THRESHOLD,
        dedup_semantic,
    )

    got = {
        r["vec_id"]: r.asDict() for r in dedup_semantic(spark, sf_dir).collect()
    }
    assignment, _ = train_kmeans_quantizer(spark, sf_dir)
    cl = {r["vec_id"]: r["cluster"] for r in assignment.collect()}
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    norm = {v: float(np.sqrt(np.dot(e, e))) for v, e in emb.items()}
    by_cell: dict = {}
    for v, c in cl.items():
        by_cell.setdefault(c, []).append(v)
    expected = {}
    for c, members in by_cell.items():
        for d2 in members:
            best = None
            for d1 in members:
                if d1 >= d2:
                    continue
                cos = float(np.dot(emb[d1], emb[d2])) / (norm[d1] * norm[d2])
                if cos >= SEMANTIC_DUP_THRESHOLD and (
                    best is None or (cos, -d1) > (best[1], -best[0])
                ):
                    best = (d1, cos)
            if best is not None:
                expected[d2] = (c, best[0], best[1])
    assert set(got) == set(expected)
    for v, row in got.items():
        c, ex, cos = expected[v]
        assert row["cluster"] == c and row["exemplar_id"] == ex
        assert abs(row["cosine"] - cos) < 1e-9
        assert row["exemplar_id"] < v and row["cosine"] >= SEMANTIC_DUP_THRESHOLD


def test_semantic_k_dial_rule_and_decision_equality(spark, sf_dir):
    """The SemDeDup k ∝ N dial (round-14 verdict "What's wrong #1"):
    (a) the rule itself — floor at KMEANS_K, then ceil(N / TARGET_CELL),
    so a 100× corpus trains proportionally more cells and the within-cell
    pair join stays ~N·TARGET_CELL instead of N²/16; (b) DECISION
    EQUALITY at the driver SFs — the registered default (k=None) resolves
    to KMEANS_K there, so the dial changes nothing the oracle certifies."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_K,
        SEMDEDUP_TARGET_CELL,
        dedup_semantic,
        semantic_k_for,
    )

    # (a) the rule: floored small, linear large
    assert semantic_k_for(0) == KMEANS_K
    assert semantic_k_for(500) == KMEANS_K
    assert semantic_k_for(2000) == KMEANS_K  # every driver corpus
    assert semantic_k_for(KMEANS_K * SEMDEDUP_TARGET_CELL) == KMEANS_K
    assert semantic_k_for(10_000_000) == -(-10_000_000 // SEMDEDUP_TARGET_CELL)
    assert semantic_k_for(100 * 2000) == max(
        KMEANS_K, -(-(100 * 2000) // SEMDEDUP_TARGET_CELL)
    )
    with pytest.raises(ValueError):
        semantic_k_for(-1)
    # (b) decision equality on the real corpus: default-k == explicit k
    default_rows = sorted(map(tuple, dedup_semantic(spark, sf_dir).collect()))
    fixed_rows = sorted(
        map(tuple, dedup_semantic(spark, sf_dir, k=KMEANS_K).collect())
    )
    assert default_rows == fixed_rows


def test_kmeans_quantizer_beats_label_quantizer_at_nprobe1(spark):
    """The point of training: on the real sf0.01 corpus, recall@10 at
    nprobe=1 with k-means cells must beat the semantic-label bucketing
    (geometry vs class labels). Run at sf0.01 for a meaningful margin."""
    sf = "/root/testdata/sf0.01"
    gt = {
        (r["q_id"], r["neighbor_id"])
        for r in ensure_knn_ground_truth(spark, sf).collect()
    }
    n_labels = (
        spark.read.parquet(f"{sf}/embeddings.parquet").select("label").distinct().count()
    )
    label_hits = {
        (r["q_id"], r["neighbor_id"]) for r in ivf_topk(spark, sf, nprobe=1).collect()
    }
    trained_hits = {
        (r["q_id"], r["neighbor_id"])
        for r in ivf_kmeans_topk(spark, sf, k=n_labels, iters=5, nprobe=1).collect()
    }
    r_label = len(gt & label_hits) / len(gt)
    r_trained = len(gt & trained_hits) / len(gt)
    assert r_trained > r_label, (r_trained, r_label)


def test_kmeans_index_build_inventory_matches_assignment(spark, sf_dir):
    """The registered build row must read its inventory back FROM the
    written index files, and that inventory must equal the trained
    assignment's per-cell counts (write path + partition layout + read
    path all proven in one equality)."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        ivf_kmeans_index_build,
    )

    inv = {
        r["label"]: r["n_vectors"]
        for r in ivf_kmeans_index_build(spark, sf_dir).collect()
    }
    assignment, _ = train_kmeans_quantizer(spark, sf_dir)
    src = {
        r["cluster"]: r["n"]
        for r in assignment.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert inv == src


def test_assignment_artifact_carries_corpus_embeddings_bit_exact(spark, sf_dir):
    """Round 16: the published assignment artifact carries the embedding
    ((vec_id, embedding, cluster)) so the index build / serving reads /
    centroid update stay map-only — the carried vector must be the
    corpus vector BIT-FOR-BIT (an Arrow echo, never recomputed; float32
    round-trips parquet exactly), or every 'join-free by bit-identity'
    claim downstream is void."""
    assignment, _ = train_kmeans_quantizer(spark, sf_dir)
    assert set(assignment.columns) == {"vec_id", "embedding", "cluster", "norm"}
    src = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    carried = {
        r["vec_id"]: list(r["embedding"]) for r in assignment.collect()
    }
    assert carried.keys() == src.keys()
    assert carried == src


def test_kmeans_rejects_bad_params(spark, sf_dir):
    with pytest.raises(ValueError, match="k and iters"):
        train_kmeans_quantizer(spark, sf_dir, k=0)
    with pytest.raises(ValueError, match="k and iters"):
        train_kmeans_quantizer(spark, sf_dir, iters=0)


def test_kmeans_pruned_index_matches_live_probe(spark, sf_dir):
    """The materialized trained index changes the access path, never the
    answer: pruned == live for nprobe 1 and 2, exact doubles."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        ivf_kmeans_topk_pruned,
    )

    for nprobe in (1, 2):
        live = sorted(
            map(
                tuple,
                ivf_kmeans_topk(spark, sf_dir, k=K, iters=ITERS, nprobe=nprobe).collect(),
            )
        )
        pruned = sorted(
            map(
                tuple,
                ivf_kmeans_topk_pruned(
                    spark, sf_dir, k=K, iters=ITERS, nprobe=nprobe
                ).collect(),
            )
        )
        assert pruned == live


def test_kmeans_sql_replay_parity_on_adversarial_corpus(spark, tmp_path):
    """Engine-vs-DuckDB parity of the FULL training replay on a crafted
    corpus hitting every edge the shipped corpora never exercise:
    exact cosine TIES (duplicate one-hot vectors — argmax-first must
    equal ROW_NUMBER's lowest-label in both engines), a ZERO VECTOR
    (norm treated as 1 in the update; all-tie assignment → cluster 0),
    a ZERO-NORM SEED CENTROID (scores -inf, captures nothing), and the
    resulting EMPTY CLUSTERS (previous-centroid carry). The driver's
    oracle gate certifies the real corpora; this pins the tie-break and
    degenerate-geometry parity those corpora can't reach."""
    import duckdb
    import numpy as np

    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        _kmeans_training_ctes,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import DIM

    def vec(*hot):
        v = np.zeros(DIM, dtype=np.float32)
        for i, w in hot:
            v[i] = w
        return [float(x) for x in v]

    rows = [
        (0, vec()),                     # zero vector, and the FIRST SEED → zero-norm centroid
        (1, vec((0, 1.0))),             # seed 2: e0
        (2, vec((1, 1.0))),             # seed 3: e1
        (3, vec((0, 1.0))),             # duplicate of e0 (tie mass)
        (4, vec((0, 1.0), (1, 1.0))),   # exactly between e0 and e1 → tie
        (5, vec((1, 2.0))),             # scaled e1 (same direction)
        (6, vec((2, 1.0))),             # orthogonal to both seeds
        (7, vec((0, -1.0))),            # anti-parallel to e0
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).withColumn("label", (F.col("vec_id") % 2).cast("long")).write.parquet(
        f"{sf}/embeddings.parquet"
    )

    k, iters = 3, 2
    assignment, cents = train_kmeans_quantizer(spark, sf, k=k, iters=iters)
    got_assign = sorted((r["vec_id"], r["cluster"]) for r in assignment.collect())
    got_cents = sorted(
        (r["label"], r["dim"], r["centroid"]) for r in cents.collect()
    )

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; the driver's corpora are single
    # files, so the gate's bare-path read works there — glob here.
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    train, fi = _kmeans_training_ctes(k, iters)
    sql_assign = con.sql(
        f"WITH {train} SELECT vec_id, cluster FROM cl{fi} ORDER BY vec_id"
    ).fetchall()
    sql_cents = con.sql(
        f"WITH {train} SELECT label, dim, centroid FROM u{fi} ORDER BY label, dim"
    ).fetchall()
    assert got_assign == sorted((int(v), int(c)) for v, c in sql_assign)
    # exact doubles — the replay must match the trainer to the last ulp
    assert got_cents == sorted((int(l), int(d), float(c)) for l, d, c in sql_cents)
    # the crafted geometry actually exercised the edges: the zero-norm
    # seed centroid scores -inf (captures NOTHING — cluster 0 is empty,
    # exercising the carry), the zero vector's remaining all-0 tie lands
    # on the lowest live label in BOTH engines, and vec 4's exact
    # e0-vs-e1 tie resolves low
    by_vec = dict(got_assign)
    assert 0 not in set(by_vec.values())  # zero-norm seed captured nothing
    assert by_vec[0] == 1  # all-tie among live cells → lowest label
    assert by_vec[4] == min(by_vec[1], by_vec[2])  # exact tie resolved low


def test_registered_nprobe4_recall_row(spark, sf_dir):
    """The serving-grade registered row (round-11): ivf_kmeans_recall_nprobe4
    IS the public dial at nprobe=4 (one definition), and widening the probe
    can only help — its recall dominates the nprobe=1 default's."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        SERVING_NPROBE,
        ivf_kmeans_recall_at_10,
        ivf_kmeans_recall_nprobe4,
    )

    assert SERVING_NPROBE == 4
    r4 = ivf_kmeans_recall_nprobe4(spark, sf_dir).collect()[0]
    dial = ivf_kmeans_recall_at_10(spark, sf_dir, nprobe=4).collect()[0]
    assert r4 == dial
    r1 = ivf_kmeans_recall_at_10(spark, sf_dir, nprobe=1).collect()[0]
    assert r4["recall"] >= r1["recall"]
    assert r4["possible"] == r1["possible"]


def test_spread_init_trains_and_is_deterministic(spark, sf_dir):
    """The measured farthest-point init alternative (round-11 A/B,
    SCALE.md): trains under its own params token (never shares the
    default's artifacts), labels every vector, and two calls serve the
    identical content-keyed training. Bad init names are refused."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        train_kmeans_quantizer,
    )

    a1, c1 = train_kmeans_quantizer(spark, sf_dir, k=4, iters=2, init="spread")
    a2, _ = train_kmeans_quantizer(spark, sf_dir, k=4, iters=2, init="spread")
    rows1 = sorted((r["vec_id"], r["cluster"]) for r in a1.collect())
    assert rows1 == sorted((r["vec_id"], r["cluster"]) for r in a2.collect())
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows1) == n  # every vector labeled exactly once
    assert len({c for _, c in rows1}) <= 4
    default, _ = train_kmeans_quantizer(spark, sf_dir, k=4, iters=2)
    # different seeds → (on this corpus) a genuinely different training
    assert sorted((r["vec_id"], r["cluster"]) for r in default.collect()) != rows1

    import pytest

    with pytest.raises(ValueError, match="init"):
        train_kmeans_quantizer(spark, sf_dir, k=4, iters=2, init="rng")


def test_spread_init_degenerate_corpus_selects_distinct_seeds(spark, tmp_path):
    """Round-11 review: on a corpus where every vector has cosine ~1.0 to
    every other (scalar multiples of one direction), the spread argmin
    must still select k DISTINCT rows (already-selected ids are excluded)
    instead of silently duplicating seed 0; and a corpus smaller than k
    runs the selection dry with a loud error instead of duplicating."""
    import pytest

    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        _spread_seed_matrix,
    )

    rows = [(i, [float(i + 1)] * 64) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    labels, M = _spread_seed_matrix(emb, 3)
    assert len(labels) == 3 and M.shape == (3, 64)
    # distinct rows were picked: the scalar multiples differ in magnitude
    assert len({tuple(r) for r in M.tolist()}) == 3

    with pytest.raises(ValueError, match="< k"):
        _spread_seed_matrix(emb, 7)


def test_assign_clusters_carry_embedding_bit_identical(spark, sf_dir):
    """carry_embedding=True (the map-only segment-writer path, r15
    optimization) must change NOTHING but the column set: identical
    (vec_id, cluster) pairs, and the echoed embedding bit-equal to the
    source vector (it crosses the Arrow boundary but no arithmetic)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seed = emb.orderBy("vec_id").limit(K).collect()
    labels = np.arange(K, dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in seed])
    plain = {
        (r["vec_id"], r["cluster"]) for r in _assign_clusters(emb, labels, M).collect()
    }
    carried = _assign_clusters(emb, labels, M, carry_embedding=True).collect()
    assert {(r["vec_id"], r["cluster"]) for r in carried} == plain
    src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in carried:
        assert r["embedding"] == src[r["vec_id"]]  # float32 echoed exactly


def test_upsert_segment_and_serving_view(spark, sf_dir):
    """The incremental upsert (round 12): the per-drop segment holds
    exactly the batch split assigned to the PUBLISHED corpus-split
    quantizer (labels ⊆ trained cells, counts reconcile), and the serving
    view (main index ∪ segment) holds every embedding exactly once."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import published_df
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        UPSERT_MOD,
        build_kmeans_ivf_upsert,
        ivf_kmeans_index_upsert,
        kmeans_ivf_serving_view,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _load

    total = _load(spark, sf_dir).count()
    n_batch = (
        _load(spark, sf_dir)
        .filter(F.col("vec_id") % UPSERT_MOD == UPSERT_MOD - 1)
        .count()
    )
    inv = ivf_kmeans_index_upsert(spark, sf_dir).collect()
    assert sum(r["n_new_vectors"] for r in inv) == n_batch
    _, cent_long = train_kmeans_quantizer(spark, sf_dir, split="corpus")
    trained_cells = {int(r["label"]) for r in cent_long.select("label").distinct().collect()}
    assert {int(r["label"]) for r in inv} <= trained_cells
    seg = published_df(spark, build_kmeans_ivf_upsert(spark, sf_dir))
    assert seg.count() == n_batch
    assert seg.filter(F.col("vec_id") % UPSERT_MOD != UPSERT_MOD - 1).count() == 0
    view = kmeans_ivf_serving_view(spark, sf_dir)
    assert view.count() == total
    assert view.select("vec_id").distinct().count() == total


def test_upsert_does_not_retrain_the_quantizer(spark, sf_dir):
    """Assign-without-retrain is the POINT of the upsert: re-running the
    registered row force-rebuilds the SEGMENT but must leave the published
    quantizer artifacts untouched (their generation markers don't move)."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import artifact_path
    from kafka_connect_storage_cloud_formats_spark.fsio import _fs_for
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_ITERS,
        KMEANS_K,
        ivf_kmeans_index_upsert,
        kmeans_params_token,
    )

    ivf_kmeans_index_upsert(spark, sf_dir).collect()
    params = kmeans_params_token(KMEANS_K, KMEANS_ITERS, split="corpus")
    gens = {}
    # the assign artifact carries the embedding + norm since round 16
    # ("cen" params suffix — see train_kmeans_quantizer); cents unchanged
    for kind, ptok in (("kmeans_assign", params + "cen"), ("kmeans_cents", params)):
        p = artifact_path(kind, sf_dir, "embeddings", params=ptok, spark=spark)
        gens[kind] = (p, _fs_for(p, spark).generation(p))
        assert gens[kind][1] is not None  # trained and published
    ivf_kmeans_index_upsert(spark, sf_dir).collect()  # segment rebuilds
    for kind, (p, gen) in gens.items():
        assert _fs_for(p, spark).generation(p) == gen, f"{kind} was retrained"


def test_upserted_probe_full_scan_equals_bruteforce(spark, sf_dir):
    """The serving view covers the WHOLE corpus exactly once, so a probe
    over it at nprobe = k (every cell probed) must be bit-equal to brute
    force over all embeddings — the same full-scan invariant as the
    trained and label quantizers, now across the main-index ∪ segment
    union."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_K,
        ivf_kmeans_topk_upserted,
    )

    bf = sorted(map(tuple, knn_bruteforce(spark, sf_dir).collect()))
    full = sorted(
        map(tuple, ivf_kmeans_topk_upserted(spark, sf_dir, nprobe=KMEANS_K).collect())
    )
    assert full == bf


def test_upserted_serving_recall_close_to_retrained(spark, sf_dir):
    """The question the upsert tier exists to answer: serving a drop from
    an appended segment (quantizer never retrained) must not collapse
    recall vs the whole-corpus-retrained quantizer at the same serving
    nprobe. Measured: identical (0.61/0.56) at sf0.01/sf0.1; at this
    tiny sf0.001 corpus (100 upserted vectors vs a 400-vector-trained
    quantizer) the gap is 0.06 — pinned within 0.08."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        SERVING_NPROBE,
        ivf_kmeans_recall_at_10,
        ivf_kmeans_recall_upserted,
    )

    up = ivf_kmeans_recall_upserted(spark, sf_dir).collect()[0]["recall"]
    full = ivf_kmeans_recall_at_10(spark, sf_dir, nprobe=SERVING_NPROBE).collect()[0][
        "recall"
    ]
    assert up >= full - 0.08, (up, full)


def test_segment_compaction_preserves_cells_and_probe_results(spark, sf_dir):
    """Compaction is a pure physical fold: the compacted index holds
    exactly the serving view's rows with UNCHANGED cell labels (no
    re-assignment), and a probe over it is bit-equal to the probe over
    the main ∪ segment union."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import published_df
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        compact_kmeans_ivf_segments,
        ivf_kmeans_topk_upserted,
        kmeans_ivf_serving_view,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _ivf_probe,
        _with_norm,
    )

    view = kmeans_ivf_serving_view(spark, sf_dir)
    path = compact_kmeans_ivf_segments(spark, sf_dir, force=True)
    compacted = published_df(spark, path).select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label")
    )
    a = sorted((int(r["vec_id"]), int(r["label"])) for r in view.select("vec_id", "label").collect())
    b = sorted((int(r["vec_id"]), int(r["label"])) for r in compacted.select("vec_id", "label").collect())
    assert a == b
    _, cent_long = train_kmeans_quantizer(spark, sf_dir, split="corpus")
    via_union = sorted(map(tuple, ivf_kmeans_topk_upserted(spark, sf_dir).collect()))
    via_compacted = sorted(
        map(tuple, _ivf_probe(spark, sf_dir, cent_long, _with_norm(compacted)).collect())
    )
    assert via_union == via_compacted


def test_two_segment_lifecycle_bit_equal_to_single_drop_and_compaction(spark, sf_dir):
    """The N-segment serving lifecycle (round 13, round-12 verdict "What's
    missing #2"): two enumerated drops (i of 2) partition the batch split
    exactly; each assigns against the SAME published quantizer (never
    retrains — generation markers pinned); the 2-segment serving view
    holds exactly the single-segment view's (vec_id, label) rows; the
    registered ivf_kmeans_topk_upserted2 probe is bit-equal to the
    single-drop probe; and folding the 2-segment family
    (compact_kmeans_ivf_segments(n_drops=2)) probes bit-equal to the
    union."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import artifact_path, published_df
    from kafka_connect_storage_cloud_formats_spark.fsio import _fs_for
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_ITERS,
        KMEANS_K,
        UPSERT_MOD,
        build_kmeans_ivf_upsert,
        compact_kmeans_ivf_segments,
        ivf_kmeans_topk_upserted,
        ivf_kmeans_topk_upserted2,
        kmeans_ivf_serving_view,
        kmeans_params_token,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _ivf_probe,
        _load,
        _with_norm,
    )

    # quantizer generation snapshot BEFORE the per-drop segment builds
    params = kmeans_params_token(KMEANS_K, KMEANS_ITERS, split="corpus")
    train_kmeans_quantizer(spark, sf_dir, split="corpus")
    gens = {}
    for kind, ptok in (("kmeans_assign", params + "cen"), ("kmeans_cents", params)):
        p = artifact_path(kind, sf_dir, "embeddings", params=ptok, spark=spark)
        gens[kind] = (p, _fs_for(p, spark).generation(p))
        assert gens[kind][1] is not None

    seg_a = published_df(
        spark, build_kmeans_ivf_upsert(spark, sf_dir, drop=(0, 2), force=True)
    )
    seg_b = published_df(
        spark, build_kmeans_ivf_upsert(spark, sf_dir, drop=(1, 2), force=True)
    )
    for kind, (p, gen) in gens.items():
        assert _fs_for(p, spark).generation(p) == gen, f"{kind} was retrained"

    # the drops PARTITION the batch: disjoint and covering
    n_batch = (
        _load(spark, sf_dir)
        .filter(F.col("vec_id") % UPSERT_MOD == UPSERT_MOD - 1)
        .count()
    )
    ids_a = {int(r["vec_id"]) for r in seg_a.select("vec_id").collect()}
    ids_b = {int(r["vec_id"]) for r in seg_b.select("vec_id").collect()}
    assert not ids_a & ids_b
    assert len(ids_a | ids_b) == n_batch

    # the 2-segment view holds exactly the 1-segment view's rows
    def rows(df):
        return sorted(
            (int(r["vec_id"]), int(r["label"]))
            for r in df.select("vec_id", "label").collect()
        )

    view1 = kmeans_ivf_serving_view(spark, sf_dir)
    view2 = kmeans_ivf_serving_view(spark, sf_dir, n_drops=2)
    assert rows(view1) == rows(view2)

    # registered row: probe over the 2-segment union, bit-equal to 1-drop
    p1 = sorted(map(tuple, ivf_kmeans_topk_upserted(spark, sf_dir).collect()))
    p2 = sorted(map(tuple, ivf_kmeans_topk_upserted2(spark, sf_dir).collect()))
    assert p1 == p2

    # compaction of the 2-segment family: probe bit-equal to the union
    _, cent_long = train_kmeans_quantizer(spark, sf_dir, split="corpus")
    compacted = published_df(
        spark, compact_kmeans_ivf_segments(spark, sf_dir, force=True, n_drops=2)
    ).select("vec_id", "embedding", F.col("label").cast("long").alias("label"))
    assert rows(view2) == rows(compacted)
    via_compacted = sorted(
        map(tuple, _ivf_probe(spark, sf_dir, cent_long, _with_norm(compacted)).collect())
    )
    assert p2 == via_compacted
