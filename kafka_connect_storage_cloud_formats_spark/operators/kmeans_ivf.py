"""Trained IVF coarse quantizer: deterministic distributed SPHERICAL k-means.

Why this exists: the embeddings corpus ships a ``label`` column that the
IVF tier uses as its coarse quantizer, and the measured recall sweep
(SCALE.md, round 9) shows it is a SEMANTIC class, not a geometric cell —
recall@10 at nprobe=1 is 0.15 because near neighbors routinely live
across label boundaries. The production fix is the standard one every
IVF system (FAISS-style) applies: TRAIN the quantizer with k-means so
buckets are Voronoi cells of the actual vector distribution, then
partition the index by the trained assignment. This module implements
that trainer Spark-first and re-uses the existing probe machinery
unchanged (:func:`~.similarity._ivf_probe` is quantizer-agnostic — it
takes any (label, dim, centroid) long table and any labeled corpus).

SPHERICAL, because the probe ranks by COSINE: training with euclidean
assignment while serving with cosine routing would make the two stages
disagree whenever centroid norms differ (a query could probe a different
cell than the one its neighbors were trained into — a silent recall cap
flagged in round-9 review). Spherical k-means assigns by cosine and
updates with the mean of the UNIT-normalized members (the direction that
maximizes the summed cosine for a fixed assignment), so the trained cells
and the probe's routing optimize the same geometry, and the objective
Σ cos(x, c_assigned) is monotone non-decreasing per iteration (pinned).

Scale shape (the textbook distributed Lloyd's iteration):

- **assign** — centroids are a k×d matrix, tiny at any realistic k
  (2^16 × 64 floats ≈ 32 MB), broadcast as a captured constant into ONE
  ``mapInPandas`` pass over the corpus; each Arrow batch computes the
  full cosine block vectorized and emits (vec_id, cluster). No
  shuffle; O(N·k·d) flops spread across every core.
- **update** — decimal-exact per-dimension means of the UNIT-normalized
  members, grouped by cluster (the same fixed-point trick as
  ``ivf_centroids``; the per-row normalization is row-local IEEE, so it
  is identical on every partitioning): integer/decimal sums are
  associative, so the new centroids are INDEPENDENT of partitioning —
  the whole training run is bit-reproducible on 1 core or 1000
  executors.
- **iterate** — a fixed, small number of rounds; the k×d centroid
  matrix round-trips through the driver between rounds (bounded by k,
  the same metadata-scale contract as the query matrix).

Determinism contract (what makes this testable/cacheable):
- init = the k vectors with the smallest vec_ids (no RNG; the measured
  farthest-point alternative ``init="spread"`` is equally deterministic
  but serves worse recall at low nprobe — SCALE.md round-11 A/B);
- assignment tie-break = lowest cluster id (np.argmax-equivalent takes
  the first maximum; cosines are computed by one fixed vectorized
  expression);
- update = associative decimal means of row-locally normalized vectors;
- empty clusters keep their previous centroid.

The trained (assignments, centroids) pair is a content-keyed ARTIFACT
(params: k, iters, dim) — training is a once-per-corpus build, exactly
like the IVF index itself.

Oracle status (round 10 — closing the round-9 verdict's lead item):
``ivf_kmeans_topk`` / ``ivf_kmeans_topk_pruned`` / ``ivf_kmeans_recall_at_10``
are REGISTERED with full DuckDB oracles that REPLAY THE ENTIRE TRAINING:
because every float chain in the trainer is left-associated (the
engine's oracle-dot discipline, functions/vectors.py), a fixed-iteration
Lloyd's loop unrolls into ordinary SQL — seeds → ``iters`` ×
(assign → decimal-exact update with empty-cluster carry) → final
assignment → serving centroids → the probe (``_kmeans_training_ctes``). The
driver's hash gate therefore certifies init, every training iteration,
the published artifacts, AND the serving path end-to-end against an
independent engine. Structural pins remain in tests/test_kmeans_ivf.py:
bit-identical across partitionings, monotone spherical objective, and
measured recall@10 strictly above the label quantizer at equal nprobe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
    DIM,
    _collect_centroid_matrix,  # noqa: F401 — re-export (pq.py/tests import it here)
    _ivf_probe,
    _load,
    _stored_norm_guard,
    _with_norm,
)

KMEANS_K = 16
KMEANS_ITERS = 5
# The incremental drop split for the upsert tier = the dedup tiers' modular
# convention (vec_id % MOD == MOD-1 plays the new drop), imported so the
# two families' notion of "the batch" cannot fork.
from kafka_connect_storage_cloud_formats_spark.operators.dedup import (  # noqa: E402
    INCREMENT_MOD as UPSERT_MOD,
)


def _assign_clusters(
    corpus: DataFrame, labels, M, carry_embedding: bool = False
) -> DataFrame:
    """One vectorized pass: (vec_id, embedding) → (vec_id, cluster).

    ``carry_embedding=True`` echoes the input vector through the Arrow
    pass — (vec_id, embedding, cluster) — untouched (no arithmetic, so
    bit-identical float32): a consumer that needs vector AND cell (the
    segment writers) then stays MAP-ONLY instead of re-scanning the
    batch and paying a vec_id equi-join to re-attach the embedding —
    at 100 TB that join is two corpus-wide exchanges (r15 optimization,
    guide §2.1: remove the shuffle outright).

    argmax over COSINE to each centroid — the same metric the probe
    routes by, so training cells and serving cells agree. One vectorized
    pass per Arrow batch against the norm-scaled centroid matrix (a
    vector's own norm scales every cosine equally, so it never affects
    the argmax and is not computed). Ties take the lowest cluster id
    (first maximum; ``labels`` is sorted ascending). Zero-norm centroids
    score -inf so they can never capture a vector spuriously.

    Bit-exactness (round 10): scores accumulate PER DIMENSION over the
    batch×k block — ``acc += E[:, d] * Mn[:, d]`` in index order from a
    zero start — the same left-associated IEEE chain as the engine's
    oracle-SQL dot discipline (functions/vectors.py), and the centroid
    norms come from the same ``_seq_dot`` loop. That makes every trained
    assignment REPLAYABLE by a DuckDB oracle term-for-term (the
    registered ``ivf_kmeans_topk`` entry unrolls the full training as
    SQL), where the previous BLAS matmul's pairwise summation was only
    approximately reproducible."""
    import numpy as np
    import pandas as pd

    from kafka_connect_storage_cloud_formats_spark.functions.vectors import (
        _seq_dot,
        _stack64,
    )

    cn = np.sqrt(_seq_dot(M, M))  # (k,)
    Mn = np.where(cn[:, None] > 0.0, M / np.where(cn == 0.0, 1.0, cn)[:, None], np.nan)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = _stack64(pdf["embedding"])  # (b, d)
            scores = np.zeros((E.shape[0], Mn.shape[0]), dtype=np.float64)
            for d in range(E.shape[1]):  # left-associated per (row, cluster)
                scores += E[:, d : d + 1] * Mn[None, :, d]
            # NaN cols (zero-norm centroid) lose
            scores = np.nan_to_num(scores, nan=-np.inf)
            idx = np.argmax(scores, axis=1)
            cols = {"vec_id": pdf["vec_id"].to_numpy(dtype=np.int64)}
            if carry_embedding:
                cols["embedding"] = pdf["embedding"]
            cols["cluster"] = labels[idx]
            if carry_embedding:
                # the vector's own L2 norm, the same left-associated
                # sqrt(Σ x·x) chain as l2_norm_vec (E is already the
                # float64 widening) — stored WITHOUT the zero guard (the
                # trainer tolerates zero vectors; serving probes re-apply
                # the loud refusal on the READ norm, similarity.
                # _stored_norm_guard). Carrying it makes every index/
                # segment artifact norm-complete, so probes never re-run
                # a corpus-wide Arrow norm pass per query (round 16,
                # guide §2.1/§4 — the FAISS store-the-norms trick).
                cols["norm"] = np.sqrt(_seq_dot(E, E))
            yield pd.DataFrame(cols)

    schema = (
        "vec_id long, embedding array<float>, cluster long, norm double"
        if carry_embedding
        else "vec_id long, cluster long"
    )
    return corpus.select("vec_id", "embedding").mapInPandas(assign, schema)


def _update_centroids(corpus: DataFrame, assignment: DataFrame) -> DataFrame:
    """Decimal-exact per-dimension means of the UNIT-NORMALIZED members,
    grouped by assigned cluster (the spherical-k-means maximizer of the
    summed cosine for a fixed assignment, up to scale — which cosine
    ignores). Per-row normalization (val / l2(embedding)) is row-local
    IEEE arithmetic, so it is identical on every partitioning; the
    decimal sums stay associative ⇒ bit-identical at any parallelism.
    Zero vectors contribute their raw zeros (norm treated as 1).

    An ``assignment`` that already CARRIES the embedding (an
    assign-with-carry pass or the round-16 carried assignment artifact)
    is consumed directly — no corpus⋈assignment vec_id join, so the
    update is one exchange (the groupBy) instead of three (guide §2.1;
    the carried vector is echoed bit-identical, pinned in tests)."""
    from kafka_connect_storage_cloud_formats_spark.functions.vectors import dot

    norm = F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    members = (
        assignment
        if "embedding" in assignment.columns
        else corpus.join(assignment, "vec_id")
    )
    pos = (
        members
        .withColumn("__n", F.when(norm > 0.0, norm).otherwise(F.lit(1.0)))
        .select(
            F.col("cluster").alias("label"),
            F.col("__n"),
            F.posexplode(F.col("embedding")).alias("dim", "val"),
        )
    )
    quant = F.floor(F.col("val").cast("double") / F.col("__n") * F.lit(1e15)).cast(
        "decimal(38,0)"
    )
    return pos.groupBy("label", "dim").agg(
        (
            F.sum(quant).cast("double") / F.lit(1e15) / F.count(F.lit(1)).cast("double")
        ).alias("centroid")
    )


def _spread_seed_matrix(corpus: DataFrame, k: int):
    """Deterministic FARTHEST-POINT init (round-10 verdict ask #3): seed 0
    is the lowest vec_id's vector; seed j is the vector whose maximum
    cosine to the already-selected seeds is SMALLEST — the greedy
    max-min-spread rule of k-means++ without its RNG (tie-break: lowest
    vec_id), so it is exactly replayable (an iterative chain of
    left-associated cosine maxima, the same discipline as the trainer).

    Scale shape: the running ``maxcos`` column is maintained by one
    vectorized mapInPandas pass per seed against the SINGLE newest seed
    (never recomputing cosines to the whole selected set), and each seed
    selection is a takeOrdered(1) — k-1 corpus scans + k-bounded driver
    round-trips. localCheckpoint truncates the iterative lineage
    (checkpoint-inherent: loop state, same as the CC loop).

    Measured A/B on the shipped corpora (tools/ab_kmeans_init.py; SCALE.md
    round 11): spread seeding buys a slightly BETTER spherical objective
    (0.3424 vs 0.3332 at sf0.01) but WORSE recall@10 at every serving
    nprobe (sf0.1: 0.2375/0.3550/0.5250 vs 0.2600/0.4025/0.5600 at
    nprobe 1/2/4) — a more evenly spread Voronoi partition splits query
    neighborhoods across more cells, exactly what low-nprobe probing
    pays for. The smallest-vec_ids init therefore stays the registered
    default; this function remains the measured alternative for corpora
    whose ingest order co-locates low ids (where the lowid seeds would
    start degenerate)."""
    import numpy as np
    import pandas as pd

    from kafka_connect_storage_cloud_formats_spark.functions.vectors import (
        _seq_dot,
        _stack64,
    )

    first = corpus.orderBy("vec_id").limit(1).collect()
    if not first:
        raise ValueError(f"corpus has 0 vectors < k={k}")
    seeds = [np.asarray(first[0]["embedding"], dtype=np.float64)]
    # Already-selected rows are EXCLUDED from every later argmin (round-11
    # review): on a degenerate corpus where every vector has cosine ~1.0
    # to a seed (e.g. scalar multiples of one direction), the bare argmin
    # would silently re-select the same row k-1 times and train coincident
    # centroids. The exclusion list is k-bounded (cheap isin); it also
    # makes a too-small corpus fail loudly (the selection runs dry)
    # without a separate corpus-scale count() pass.
    seed_ids = [int(first[0]["vec_id"])]
    state = corpus.select(
        "vec_id", "embedding", F.lit(float("-inf")).cast("double").alias("maxcos")
    )
    schema = "vec_id long, embedding array<float>, maxcos double"
    for _ in range(k - 1):
        s = seeds[-1]
        sn = float(np.sqrt(_seq_dot(s[None, :], s[None, :])[0]))
        if sn <= 0.0:
            raise ValueError(
                "zero-norm seed vector: cosine spread is undefined — "
                "filter or impute upstream (corpus contract)"
            )
        su = s / sn

        def step(batches, su=su):
            for pdf in batches:
                if not len(pdf):
                    continue
                E = _stack64(pdf["embedding"])
                nrm = np.sqrt(_seq_dot(E, E))
                if not (nrm > 0.0).all():
                    raise ValueError(
                        "zero-norm embedding: cosine spread is undefined — "
                        "filter or impute upstream (corpus contract)"
                    )
                acc = np.zeros(E.shape[0], dtype=np.float64)
                for d in range(E.shape[1]):  # left-associated
                    acc += E[:, d] * su[d]
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                        "embedding": pdf["embedding"],
                        "maxcos": np.maximum(
                            pdf["maxcos"].to_numpy(dtype=np.float64), acc / nrm
                        ),
                    }
                )

        state = state.mapInPandas(step, schema).localCheckpoint(eager=True)
        picked = (
            state.filter(~F.col("vec_id").isin(seed_ids))
            .orderBy(F.asc("maxcos"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not picked:
            raise ValueError(
                f"corpus has only {len(seed_ids)} vectors < k={k}"
            )
        seeds.append(np.asarray(picked[0]["embedding"], dtype=np.float64))
        seed_ids.append(int(picked[0]["vec_id"]))
    labels = np.arange(k, dtype=np.int64)
    return labels, np.stack(seeds)


def kmeans_params_token(
    k: int, iters: int, init: str = "lowid", split: str | None = None
) -> str:
    """THE quantizer-generation params token (round-12 review: this
    format was hand-copied in the trainer, the index build, the upsert
    build and a test — the exact hand-copied-token drift the round-8
    neardup_labels_path episode recounts; one definition now).
    "cosla" = spherical (cosine) metric + Left-Associated score
    accumulation (round 10 — the matmul-trained "cos" artifacts an
    earlier code version published can differ in the last ulp, so they
    can never be served to this derivation; params-token staleness
    contract, same as every artifact kind). A non-default init joins the
    token (different seeds ⇒ different artifacts, never shared), as does
    the corpus-split training arm."""
    return (
        f"k{k}i{iters}d{DIM}cosla"
        + ("" if init == "lowid" else f"-{init}")
        + ("" if split is None else f"-corp{UPSERT_MOD}")
    )


def train_kmeans_quantizer(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    init: str = "lowid",
    split: str | None = None,
):
    """Train the coarse quantizer; returns (assignment DF (vec_id,
    cluster), centroid long DF (label, dim, centroid)) — both read from
    the content-keyed artifact pair (one training run per corpus content
    and parameter set, shared across sessions).

    ``split="corpus"`` (round 12) trains on the CORPUS side of the
    incremental drop split only (vec_id % INCREMENT_MOD != MOD-1 — the
    same modular convention the dedup tiers use for the new-drop role):
    the quantizer a deployment PUBLISHES is trained on the corpus as of
    indexing time, and later drops are assigned to it WITHOUT retraining
    (:func:`ivf_kmeans_index_upsert`). Its own params token — the split
    quantizer and the whole-corpus quantizer are distinct artifact
    families, never served for each other."""
    import numpy as np

    from kafka_connect_storage_cloud_formats_spark.artifacts import (
        artifact_df,
        artifact_path,
    )

    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1 (got k={k}, iters={iters})")
    if init not in ("lowid", "spread"):
        raise ValueError(f"init must be 'lowid' or 'spread', got {init!r}")
    if split not in (None, "corpus"):
        raise ValueError(f"split must be None or 'corpus', got {split!r}")
    params = kmeans_params_token(k, iters, init=init, split=split)
    # The assignment artifact CARRIES the embedding since round 16
    # ((vec_id, embedding, cluster) — echoed through the final Arrow
    # assign pass, bit-identical float32): every downstream consumer that
    # needs vector AND cell (the index build/rebuild, the serving corpus
    # of ivf_kmeans_topk, the cell-stats report, the centroid update)
    # then stays MAP-ONLY instead of paying a corpus-wide vec_id
    # equi-join back to the embeddings table — at 100 TB each such join
    # is two corpus-wide exchanges (guide §2.1/§2.4; the r15 segment
    # carry generalized to the training artifact). Its own params suffix:
    # the schema change must never be served from a pre-r16 (vec_id,
    # cluster) artifact cached at the un-suffixed path.
    assign_path = artifact_path(
        "kmeans_assign", sf_dir, "embeddings", params=params + "cen", spark=spark
    )
    cent_path = artifact_path("kmeans_cents", sf_dir, "embeddings", params=params, spark=spark)

    def _training_corpus() -> DataFrame:
        c = _load(spark, sf_dir).select("vec_id", "embedding")
        if split == "corpus":
            c = c.filter(F.col("vec_id") % UPSERT_MOD != UPSERT_MOD - 1)
        return c

    def build_both(tmp: str) -> None:
        corpus = _training_corpus()
        if init == "spread":
            labels, M = _spread_seed_matrix(corpus, k)
        else:
            # deterministic default init: the k smallest vec_ids (no RNG —
            # seeds are banned state here; any fixed rule works and this
            # one is cheap; the measured farthest-point alternative is
            # _spread_seed_matrix)
            seed_rows = corpus.orderBy("vec_id").limit(k).collect()
            if len(seed_rows) < k:
                raise ValueError(f"corpus has {len(seed_rows)} vectors < k={k}")
            labels = np.arange(k, dtype=np.int64)
            M = np.stack(
                [np.asarray(r["embedding"], dtype=np.float64) for r in seed_rows]
            )
        for _ in range(iters):
            # carry_embedding: the update consumes the assignment's own
            # echoed vector — no per-iteration corpus⋈assignment join
            # (guide §2.1; echoes are bit-identical, so the decimal means
            # are unchanged)
            assignment = _assign_clusters(corpus, labels, M, carry_embedding=True)
            new_long = _update_centroids(corpus, assignment)
            new_labels, new_M = _collect_centroid_matrix(new_long)
            # empty clusters keep their previous centroid
            keep = np.isin(labels, new_labels, invert=True)
            if keep.any():
                new_labels = np.concatenate([new_labels, labels[keep]])
                new_M = np.concatenate([new_M, M[keep]])
                order = np.argsort(new_labels)
                new_labels, new_M = new_labels[order], new_M[order]
            labels, M = new_labels, new_M
        _assign_clusters(corpus, labels, M, carry_embedding=True).write.parquet(tmp)

    assignment = artifact_df(assign_path, build_both, spark)

    def build_cents(tmp: str) -> None:
        _update_centroids(
            _training_corpus(), artifact_df(assign_path, build_both, spark)
        ).write.parquet(tmp)

    # Final centroids = exact decimal means of the FINAL assignment (the
    # half-step every IVF index stores: cells match the partitioning).
    centroids = artifact_df(cent_path, build_cents, spark)
    return assignment, centroids


def ivf_kmeans_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    nprobe: int = 1,
) -> DataFrame:
    """IVF search over the TRAINED quantizer: identical probe machinery
    (:func:`~.similarity._ivf_probe` — assignment tie-breaks, nprobe dial,
    exact re-rank, global top-k), only the bucket geometry differs. At
    nprobe = k this is bit-equal to brute force by the same full-scan
    argument as the label quantizer (pinned in tests)."""
    assignment, cent_long = train_kmeans_quantizer(spark, sf_dir, k=k, iters=iters)
    # the carried assignment artifact IS (vec_id, embedding, cluster,
    # norm) — the probe corpus reads it directly: no corpus⋈assignment
    # join AND no per-query Arrow norm pass (round 16, guide §2.1/§2.4;
    # embeddings/norms are the final assign pass's bit-identical echoes,
    # the zero-norm refusal re-applies on the read norm)
    corpus = assignment.select(
        "vec_id",
        "embedding",
        F.col("cluster").alias("label"),
        _stored_norm_guard().alias("norm"),
    )
    return _ivf_probe(spark, sf_dir, cent_long, corpus, nprobe=nprobe)


def build_kmeans_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    force: bool = False,
    split: str | None = None,
) -> str:
    """Materialize the TRAINED IVF index: the corpus written to parquet
    PARTITIONED BY the k-means cell (mirror of
    :func:`~.similarity.build_ivf_index`, which partitions by the label
    column) — probes then touch only assigned cells via dynamic partition
    pruning. Content-keyed like every index artifact; the centroid table
    is the trainer's own artifact, so the index needs only the
    partitioned corpus. ``split="corpus"`` builds the corpus-split main
    index the incremental serving view unions with per-drop segments
    (:func:`kmeans_ivf_serving_view`) — its own params token, matching
    its quantizer's."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import (
        artifact_path,
        ensure_artifact,
    )

    assignment, _ = train_kmeans_quantizer(spark, sf_dir, k=k, iters=iters, split=split)
    # "n": the index stores the vector L2 norm since round 16 (the
    # params token names every constant of the derivation — a norm-less
    # pre-r16 index can never serve the norm-reading probes)
    path = artifact_path(
        "kmeans_ivf_index",
        sf_dir,
        "embeddings",
        params=kmeans_params_token(k, iters, split=split) + "n",
        spark=spark,
    )
    # MAP-ONLY (re)build since round 16: the carried assignment artifact
    # already holds (vec_id, embedding, cluster, norm), so the index
    # write is one pass — scan → partitioned write — instead of a
    # corpus-wide vec_id join back to the embeddings table (two
    # corpus-wide exchanges at scale; guide §2.1). Content identical:
    # the carried embeddings/norms are the final assign pass's bit-exact
    # echoes.
    ensure_artifact(
        path,
        lambda tmp: assignment
        .select("vec_id", "embedding", "norm", F.col("cluster").alias("label"))
        .write.partitionBy("label")
        .parquet(tmp),
        spark=spark,
        force=force,
    )
    return path


def ivf_kmeans_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-index build as a first-class registered step (mirror of
    ``similarity.ivf_index_build`` — the label tier's row): (re)writes the
    cell-partitioned parquet index and returns the per-cell inventory read
    back FROM the index files, proving the write, the trained bucket
    layout, and the read path. Benching this entry measures the honest
    index-build cost (the TRAINING stays its own once-per-corpus
    artifact — a rebuild repartitions the corpus by the already-trained
    assignment, exactly the recurring job shape at 100 TB where training
    is amortized and the index is rebuilt per corpus drop);
    ``ivf_kmeans_topk_pruned`` then measures the probe alone."""
    path = build_kmeans_ivf_index(spark, sf_dir, force=True)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("label").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("label")
    )


def ivf_kmeans_topk_pruned(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    nprobe: int = 1,
) -> DataFrame:
    """Trained-quantizer probe against the MATERIALIZED index (the
    serving shape): identical results to :func:`ivf_kmeans_topk` — the
    index changes the access path (label-partitioned files scanned under
    the driver-side routing's static partition filter, plus stored
    norms), never the answer."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import published_df

    _, cent_long = train_kmeans_quantizer(spark, sf_dir, k=k, iters=iters)
    index_path = build_kmeans_ivf_index(spark, sf_dir, k=k, iters=iters)
    # norm read FROM the index (stored at build, bit-equal to l2_norm_vec
    # — doubles roundtrip parquet exactly): the probe runs ZERO Arrow
    # passes over the corpus side (round 16, guide §4)
    stored = published_df(spark, index_path).select(
        "vec_id",
        "embedding",
        F.col("label").cast("long").alias("label"),
        _stored_norm_guard().alias("norm"),
    )
    return _ivf_probe(spark, sf_dir, cent_long, stored, nprobe=nprobe)


def ivf_kmeans_recall_at_10(
    spark: SparkSession, sf_dir: str, nprobe: int = 1
) -> DataFrame:
    """Recall@10 of the TRAINED-quantizer IVF tier against the exact
    brute-force ground truth — the shared
    :func:`~.similarity._recall_vs_truth` evaluation, same as the
    LSH/SQ8/label-IVF rows, so the four tiers' quality numbers are
    directly comparable in one registered family. The probe side is the
    materialized-index serving shape (:func:`ivf_kmeans_topk_pruned`);
    ``nprobe`` is the public recall/cost dial (registered default 1,
    pinned by the oracle). This row is the measured justification for
    serving the trained quantizer: ~2× the label quantizer's recall at
    identical probe cost (SCALE.md round-9/10 sweep)."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _recall_vs_truth,
    )

    return _recall_vs_truth(
        spark, sf_dir, ivf_kmeans_topk_pruned(spark, sf_dir, nprobe=nprobe)
    )


SERVING_NPROBE = 4  # the serving-grade operating point (see below)


def ivf_kmeans_recall_nprobe4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the trained tier at the SERVING-GRADE operating point
    nprobe=4 (round-10 verdict ask #2): the nprobe=1 row above certifies
    the cheapest probe, but the builder's sweep (SCALE.md: recall@10 =
    0.26/0.40/0.56/0.795 at nprobe 1/2/4/8, k=16) shows the point a
    production deployment would actually serve is nprobe=4 — 0.56 recall
    for a 4/16 corpus scan. Registering it makes the driver hash-certify
    the number you'd serve, not just the declared default; the oracle
    replays the full training plus the rn <= 4 probe widening."""
    return ivf_kmeans_recall_at_10(spark, sf_dir, nprobe=SERVING_NPROBE)


# ------------------------------------------------------- incremental upsert
# Round 12 (round-11 verdict "What's missing #2"): the similarity family's
# recurring-drop story. A 100 TB deployment re-INDEXES per drop; it does
# not re-TRAIN per drop: new batch embeddings are assigned to the
# PUBLISHED trained quantizer (one broadcast-centroid vectorized pass over
# the batch) and appended to the serving index as a per-drop segment —
# exactly how FAISS-style IVF serving absorbs new vectors between
# re-trainings.


def assign_to_published_quantizer(
    spark: SparkSession,
    sf_dir: str,
    batch: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    carry_embedding: bool = False,
) -> DataFrame:
    """(vec_id, cluster) for ``batch`` rows against the PUBLISHED
    corpus-split trained quantizer — no retraining: the k×d centroid
    matrix is collected from the centroid artifact (k-bounded, the same
    metadata-scale contract as training's inter-iteration round-trip) and
    broadcast into ONE vectorized mapInPandas pass over the batch
    (:func:`_assign_clusters` — the trainer's own assignment kernel, so
    an upserted vector lands in exactly the cell a retrained-final-assign
    would have routed it to given these centroids)."""
    _, cent_long = train_kmeans_quantizer(
        spark, sf_dir, k=k, iters=iters, split="corpus"
    )
    labels, M = _collect_centroid_matrix(cent_long)
    return _assign_clusters(
        batch.select("vec_id", "embedding"),
        labels,
        M,
        carry_embedding=carry_embedding,
    )


def build_kmeans_ivf_upsert(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    force: bool = False,
    drop: tuple[int, int] | None = None,
) -> str:
    """Materialize a per-drop index SEGMENT: the drop's vectors, assigned
    to the published corpus-split quantizer, written cell-partitioned
    exactly like the main index (:func:`build_kmeans_ivf_index`) — a
    probe over the serving view (main index ∪ segments) prunes both by
    the same label partition column. Content-keyed with the quantizer's
    own params token plus the drop infix, so a segment can never be
    served against a different quantizer generation (params-keyed
    staleness, same doctrine as the merged signature generation).

    ``drop`` (round 13 — the N-segment lifecycle, round-12 verdict
    "What's missing #2"): ``None`` is the whole batch split as one drop
    (token ``…b``, byte-compatible with the round-12 artifact);
    ``(i, n)`` is the i-th of ``n`` successive drops — the batch split
    sub-partitioned by ``(vec_id div UPSERT_MOD) % n == i``
    (deterministic, disjoint, covering, so ``n`` drops' segments
    together hold exactly the one-drop segment's vectors), each with its
    own enumerated token ``…b{i}of{n}``. Every drop assigns against the
    SAME published quantizer — never retrains — which is what makes a
    multi-drop serving view's labels identical to the single-drop
    view's."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import (
        artifact_path,
        ensure_artifact,
    )

    infix = "b" if drop is None else f"b{drop[0]}of{drop[1]}"
    # "n" — the segment stores the vector L2 norm, like the main index
    path = artifact_path(
        "kmeans_ivf_upsert",
        sf_dir,
        "embeddings",
        params=kmeans_params_token(k, iters, split="corpus") + "n" + infix,
        spark=spark,
    )

    def build(tmp: str) -> None:
        batch = (
            _load(spark, sf_dir)
            .select("vec_id", "embedding")
            .filter(F.col("vec_id") % UPSERT_MOD == UPSERT_MOD - 1)
        )
        if drop is not None:
            batch = batch.filter(
                F.expr(f"(vec_id div {UPSERT_MOD}) % {drop[1]}") == drop[0]
            )
        # carry_embedding keeps the build MAP-ONLY: the assignment pass
        # echoes the vector through, so no re-scan + vec_id join to
        # re-attach it (r15 optimization, guide §2.1 — at scale that join
        # was two drop-wide exchanges). Same (vec_id, embedding, label)
        # columns, embeddings bit-identical (echoed, never recomputed).
        assign_to_published_quantizer(
            spark, sf_dir, batch, k=k, iters=iters, carry_embedding=True
        ).select(
            "vec_id", "embedding", "norm", F.col("cluster").alias("label")
        ).write.partitionBy("label").parquet(tmp)

    ensure_artifact(path, build, spark=spark, force=force)
    return path


def ivf_kmeans_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered measure-the-build row for the index upsert (same
    doctrine as ``ivf_kmeans_index_build``: the per-drop assign+append IS
    what the row measures; the quantizer TRAINING stays a once-per-corpus
    artifact that this row never re-pays): (re)write the drop's
    cell-partitioned segment and read the per-cell inventory back FROM
    the published files — proving the assignment, the partitioned write
    and the read path. The oracle replays the corpus-split training AND
    the batch assignment term-for-term."""
    path = build_kmeans_ivf_upsert(spark, sf_dir, force=True)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("label").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_new_vectors"))
        .orderBy("label")
    )


def kmeans_ivf_serving_view(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    n_drops: int | None = None,
) -> DataFrame:
    """The SERVING view between re-indexings: main index (corpus split,
    trained cells) ∪ the per-drop segment family — every vector exactly
    once, one shared label column, probe-able by the standard machinery
    (``_ivf_probe`` with the published corpus-split centroids). At 100 TB
    this union is the metadata operation a serving layer performs per
    accepted drop; segments compact into one index on the re-index
    schedule (:func:`compact_kmeans_ivf_segments`).

    ``n_drops=None`` is the single-segment round-12 view; ``n_drops=N``
    unions the N enumerated per-drop segments (a deployment takes many
    drops between re-trainings — round-12 verdict "What's missing #2").
    Because the drops partition the batch and each assigns against the
    same published quantizer, the N-segment view holds exactly the
    single-segment view's (vec_id, label) rows — pinned probe-bit-equal
    in tests.

    The drop count is EXPLICIT deployment state, deliberately not
    discovered by listing published segment artifacts: the ingest
    pipeline that creates drops owns the counter, and a listing-based
    view would double-count the moment two enumeration schemes coexist
    over one corpus (the whole-batch ``…b`` segment and an enumerated
    ``…b{i}of{n}`` family cover the same vectors — exactly the state a
    re-partitioned drop schedule transitions through)."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import published_df

    main = build_kmeans_ivf_index(spark, sf_dir, k=k, iters=iters, split="corpus")
    drops = [None] if n_drops is None else [(i, n_drops) for i in range(n_drops)]
    segs = [
        build_kmeans_ivf_upsert(spark, sf_dir, k=k, iters=iters, drop=d)
        for d in drops
    ]
    cols = [
        "vec_id",
        "embedding",
        F.col("label").cast("long").alias("label"),
        "norm",
    ]
    out = published_df(spark, main).select(*cols)
    for seg in segs:
        out = out.unionByName(published_df(spark, seg).select(*cols))
    return out


def compact_kmeans_ivf_segments(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    force: bool = False,
    n_drops: int | None = None,
) -> str:
    """Fold the per-drop segment(s) back into ONE cell-partitioned index
    — the maintenance job between re-trainings: every row keeps the cell
    it already has (corpus rows their training cells, upserted rows their
    assign-pass cells; NO re-assignment and NO retraining), the serving
    view's union just becomes a single partitioned table again, closing
    the small-files/fragmentation accumulation of many drops. A probe
    over the compacted index is bit-equal to a probe over the union by
    construction (pinned in tests). ``n_drops`` selects which segment
    family folds (same meaning as :func:`kmeans_ivf_serving_view`). Own
    params token (``…cmp`` / ``…cmpd{n}`` — the token names every
    constant of the derivation, including the drop enumeration) — the
    compacted generations and the plain main index are distinct artifact
    families."""
    from kafka_connect_storage_cloud_formats_spark.artifacts import (
        artifact_path,
        ensure_artifact,
    )

    infix = "cmp" if n_drops is None else f"cmpd{n_drops}"
    # "n" — folds the norm-complete view, so the compacted index is
    # norm-complete like its inputs
    path = artifact_path(
        "kmeans_ivf_index",
        sf_dir,
        "embeddings",
        params=kmeans_params_token(k, iters, split="corpus") + "n" + infix,
        spark=spark,
    )
    ensure_artifact(
        path,
        lambda tmp: kmeans_ivf_serving_view(
            spark, sf_dir, k=k, iters=iters, n_drops=n_drops
        )
        .write.partitionBy("label")
        .parquet(tmp),
        spark=spark,
        force=force,
    )
    return path


def ivf_kmeans_recall_upserted(
    spark: SparkSession, sf_dir: str, nprobe: int = SERVING_NPROBE
) -> DataFrame:
    """Recall@10 of the UPSERTED serving path at the serving-grade
    operating point (nprobe=4) — THE number that answers "does
    assign-without-retrain degrade serving quality?": the quantizer
    never saw the drop (trained on the corpus split), the drop's vectors
    live in an appended segment, and this row measures the recall a
    deployment actually serves between re-trainings, directly comparable
    to ``ivf_kmeans_recall_nprobe4``'s whole-corpus-trained number.
    Ground truth is the exact brute-force artifact over ALL embeddings
    (shared :func:`~.similarity._recall_vs_truth` evaluation)."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _recall_vs_truth,
    )

    return _recall_vs_truth(
        spark, sf_dir, ivf_kmeans_topk_upserted(spark, sf_dir, nprobe=nprobe)
    )


def ivf_kmeans_topk_upserted(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    nprobe: int = 1,
    n_drops: int | None = None,
) -> DataFrame:
    """Top-k probe against the SERVING VIEW (main corpus-split index ∪
    the per-drop upsert segment family) — the query path a deployment
    actually runs between re-indexings, certified end-to-end: same probe
    machinery (:func:`~.similarity._ivf_probe`), centroids from the
    published corpus-split quantizer, stored rows from the union. The
    oracle replays corpus-split training + the batch assignment + the
    union + the probe in one WITH-chain (``_kmeans_upserted_topk_sql``)."""
    _, cent_long = train_kmeans_quantizer(
        spark, sf_dir, k=k, iters=iters, split="corpus"
    )
    # norms come FROM the index/segment artifacts (stored at build): the
    # serving probe runs zero corpus-side Arrow passes — at sf0.1 the
    # per-branch norm pass over the union's many small files was ~0.4 s
    # of the row (measured, round 16); at 100 TB it was a full corpus
    # Python pass per query
    view = kmeans_ivf_serving_view(spark, sf_dir, k=k, iters=iters, n_drops=n_drops)
    stored = view.withColumn("norm", _stored_norm_guard())
    return _ivf_probe(spark, sf_dir, cent_long, stored, nprobe=nprobe)


def ivf_kmeans_topk_upserted2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTI-SEGMENT serving lifecycle, driver-certified (round-12
    verdict "What's missing #2"): the same probe as
    :func:`ivf_kmeans_topk_upserted`, but over main ∪ segment(0 of 2) ∪
    segment(1 of 2) — a deployment two drops into its re-index interval.
    The engine path is materially different (two separately-built,
    separately-published cell-partitioned segments in the union); the
    ORACLE is the single-drop string verbatim, which is exactly the
    lifecycle claim this row certifies: the two drops partition the
    batch by construction, and each assigns row-independently against
    the same published corpus-split quantizer, so the 2-segment view
    holds exactly the 1-segment view's (vec_id, label) rows and the
    probe must be bit-equal. Compaction equivalence (probe over the
    folded 2-segment index = probe over the union) is pinned in
    tests/test_kmeans_ivf.py."""
    return ivf_kmeans_topk_upserted(spark, sf_dir, n_drops=2)


def ivf_kmeans_cell_stats(
    spark: SparkSession, sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Trained-quantizer HEALTH report: per cell, occupancy and the mean
    member→centroid cosine — the spherical k-means objective decomposed
    per cell, the diagnostic an IVF deployment watches between
    re-trainings (FAISS's imbalance factor is one aggregate of the
    n_vectors column; a cell whose cohesion decays as drops upsert into
    it is the re-index trigger). Complements ``ivf_kmeans_index_build``
    (counts only) with the geometry side; the training objective's
    MONOTONICITY is already pinned in tests — this row makes the
    resulting quality a DRIVER-CERTIFIED number instead of a test-only
    fact.

    Scale shape: members join the k-row centroid table broadcast, one
    Arrow cosine pass, then ONE combinable groupBy on the cell id with
    the decimal fixed-point mean (``FLOOR(cos·1e15)`` sums — associative
    ⇒ partition-invariant, the `_update_centroids` trick applied to the
    report side). k result rows at any SF."""
    assignment, cent_long = train_kmeans_quantizer(spark, sf_dir, k=k, iters=iters)
    cents = (
        cent_long.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("cd"))
        .select("label", F.transform("cd", lambda s: s["centroid"]).alias("c_emb"))
    )
    from kafka_connect_storage_cloud_formats_spark.functions.vectors import dot

    c_norm0 = F.sqrt(dot(F.col("c_emb"), F.col("c_emb")))
    cents = cents.withColumn(
        "c_norm",
        F.when(c_norm0 > 0.0, c_norm0).otherwise(
            F.raise_error(
                F.lit("zero-norm centroid: cosine similarity is undefined")
            )
        ),
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _dot

    # the carried assignment artifact holds the members AND their norms
    # directly — no corpus⋈assignment join, no Arrow norm pass (round 16)
    members = assignment.select(
        "vec_id",
        "embedding",
        F.col("cluster").alias("label"),
        _stored_norm_guard().alias("norm"),
    )
    cos = _dot("embedding", "c_emb") / (F.col("norm") * F.col("c_norm"))
    quant = F.floor(cos * F.lit(1e15)).cast("decimal(38,0)")
    return (
        members.join(F.broadcast(cents), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (
                F.sum(quant).cast("double")
                / F.lit(1e15)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_cosine"),
        )
        .orderBy("label")
    )


def _kmeans_cell_stats_sql() -> str:
    """Training replay + per-member cosine to the published centroid +
    decimal-exact per-cell mean."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _sql_dot

    train, fi = _kmeans_training_ctes()
    return f"""
WITH {train},
ksa AS (
  SELECT label, list(centroid ORDER BY dim) AS c_emb FROM u{fi} GROUP BY label),
ksn AS (
  SELECT label, c_emb,
         CASE WHEN n0 > 0 THEN n0
              ELSE error('zero-norm centroid: cosine similarity is undefined') END AS c_norm
  FROM (SELECT label, c_emb, sqrt({_sql_dot('c_emb', 'c_emb')}) AS n0 FROM ksa) t),
ksv AS (
  SELECT vec_id, embedding,
         CASE WHEN n0 > 0 THEN n0
              ELSE error('zero-norm embedding: cosine similarity is undefined') END AS norm
  FROM (SELECT vec_id, embedding, sqrt({_sql_dot('embedding', 'embedding')}) AS n0
        FROM embeddings) b),
ksc AS (
  SELECT cl.cluster AS label,
         {_sql_dot('e.embedding', 'c.c_emb')} / (e.norm * c.c_norm) AS cosv
  FROM ksv e
  JOIN cl{fi} cl ON cl.vec_id = e.vec_id
  JOIN ksn c ON c.label = cl.cluster)
SELECT label, COUNT(*) AS n_vectors,
       CAST(SUM(CAST(FLOOR(cosv * 1e15) AS DECIMAL(38,0))) AS DOUBLE)
         / 1e15 / CAST(COUNT(*) AS DOUBLE) AS mean_cosine
FROM ksc GROUP BY label ORDER BY label
"""


# The synthetic corpus has no true vector dups (max pairwise cosine ≈ 0.51,
# similarity.COSINE_DUP_THRESHOLD's note); 0.35 keeps realistic candidate
# volume inside the trained cells. Production SemDeDup runs ~0.95+.
SEMANTIC_DUP_THRESHOLD = 0.35

# SemDeDup's scale dial (round-14 verdict "What's wrong #1"): within-cell
# candidate pairs are ~N²/k, so a FIXED k is quadratic at 100× — the
# published posture (Abbas et al. 2023 run k ≈ 1e5 on LAION-440M, i.e.
# cells of a few thousand) is that k SCALES WITH N. The dial below keeps
# expected cell size ≤ SEMDEDUP_TARGET_CELL, which bounds the pair join at
# ~N·TARGET_CELL — linear in N at a fixed cell budget. At the driver SFs
# (N ≤ 2000) it resolves to KMEANS_K=16, so the registered row's training,
# results and oracle are untouched (decision equality pinned in tests).
SEMDEDUP_TARGET_CELL = 4096


def semantic_k_for(
    n_vectors: int,
    target_cell: int = SEMDEDUP_TARGET_CELL,
    floor_k: int = KMEANS_K,
) -> int:
    """The k ∝ N rule for :func:`dedup_semantic`: enough cells that the
    MEAN cell holds ≤ ``target_cell`` vectors, never below the serving
    quantizer's ``floor_k`` (below the floor the shared-artifact economy
    of reusing the IVF tier's trained cells would be lost for nothing —
    the pair join is already tiny there)."""
    import math

    if n_vectors < 0:
        raise ValueError(f"n_vectors must be >= 0, got {n_vectors}")
    if target_cell < 1:
        raise ValueError(f"target_cell must be >= 1, got {target_cell}")
    return max(floor_k, math.ceil(n_vectors / target_cell))


def dedup_semantic(
    spark: SparkSession,
    sf_dir: str,
    k: int | None = None,
    iters: int = KMEANS_ITERS,
    threshold: float = SEMANTIC_DUP_THRESHOLD,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    corpus with the TRAINED spherical k-means quantizer, then compare
    pairs only WITHIN each cluster — a vector is dropped iff some
    lower-id cluster-mate sits at cosine ≥ ``threshold``; the row reports
    its exemplar (highest cosine, then lowest id). One row per dropped
    vector: (vec_id, cluster, exemplar_id, cosine).

    This is the third member of the embedding-dedup family and the one
    with an explicit capacity dial: ``dedup_embedding_cosine`` gets
    near-linear candidates from LSH bands (recall bounded by band
    collision probability), ``neardup_*`` covers the text modality; here
    candidates are the N²/k within-cell pairs of the SAME trained cells
    the IVF tier serves from — no second geometric structure to build,
    and exact cosines within a cell (no hash recall loss inside the
    cell). At 100 TB the published SemDeDup posture applies: k scales
    with N (they run k ≈ 10⁵ on LAION) so cells stay bounded and the
    pair join — an equi-join on the cell id — stays near-linear. Since
    round 15 that posture is WIRED IN, not just documented (round-14
    verdict "What's wrong #1"): ``k=None`` (the registered default)
    resolves via :func:`semantic_k_for` — k = max(KMEANS_K,
    ceil(N / SEMDEDUP_TARGET_CELL)) from one bounded count — so a 100×
    corpus trains proportionally more cells and the pair join stays
    ~N·TARGET_CELL instead of N²/16. At the driver SFs the rule resolves
    to KMEANS_K, so the quantizer artifact remains the once-per-corpus
    build the IVF tier already pays for (shared content-keyed artifact,
    zero extra training) and the oracle below replays it unchanged
    (decision equality pinned in tests/test_kmeans_ivf.py).

    Plan shape: candidate pairs self-equi-join on the LIGHT (cluster,
    vec_id) assignment rows (ids only — embeddings join in afterwards by
    id, the ``dedup_embedding_cosine`` discipline so the wide vectors
    never ride the pair explosion), exact cosine via the Arrow dot on
    candidates only, then a d2-PARTITIONED row_number picks the exemplar.
    Oracle: full training replay (``_kmeans_training_ctes``) + the same
    pair/rank chain — the hash gate certifies training, cell geometry,
    and the drop decisions end-to-end."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _dot_once,
        _with_norm_once,
    )

    if k is None:
        # one bounded count against the cached table plan — the corpus
        # size is the dial's only input, and the plan cache memoizes the
        # resolved query per (session, corpus) so this is paid once
        k = semantic_k_for(_load(spark, sf_dir).count())
    assignment, _ = train_kmeans_quantizer(spark, sf_dir, k=k, iters=iters)
    cells = assignment.select("vec_id", "cluster")
    # spread on the STREAMED (d1) side only (guide §2.5/§2.6, r15
    # optimization): the assignment artifact is a single parquet split at
    # test SFs, so the within-cell pair enumeration — this row's dominant
    # stage (event-log profile: 0.9 s CPU on 1 task) — serialized on one
    # core. Measured 0.83x with results pinned bit-equal; scale-guarded
    # no-op on any real corpus (catalog.spread). The d2 side is the
    # broadcast build, where the extra exchange would be pure cost.
    from kafka_connect_storage_cloud_formats_spark.catalog import spread as _spread

    cand = (
        _spread(assignment).select("cluster", F.col("vec_id").alias("d1"))
        .join(cells.select("cluster", F.col("vec_id").alias("d2")), "cluster")
        .filter(F.col("d1") < F.col("d2"))
    )
    # Single-evaluation norm/dot variants (guide §4.4): the cosine
    # threshold filter below otherwise duplicates every Arrow kernel
    # (l2_norm_vec 4x, dot_vec 2x — r15 optimization, same fix as
    # dedup_embedding_cosine; plans/r15/dedup_semantic_{before,after}).
    base = _with_norm_once(_load(spark, sf_dir))
    v1 = base.select(
        F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"), F.col("norm").alias("n1")
    )
    v2 = base.select(
        F.col("vec_id").alias("d2"), F.col("embedding").alias("e2"), F.col("norm").alias("n2")
    )
    cosine = _dot_once("e1", "e2") / (F.col("n1") * F.col("n2"))
    dups = (
        cand.join(v1, "d1")
        .join(v2, "d2")
        .select("cluster", "d1", "d2", cosine.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(threshold))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("d2").orderBy(F.col("cosine").desc(), F.col("d1"))
    return (
        dups.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("d2").alias("vec_id"),
            "cluster",
            F.col("d1").alias("exemplar_id"),
            "cosine",
        )
        .orderBy("vec_id")
    )


# ------------------------------------------------------------ DuckDB oracles
# The FULL TRAINING REPLAY as SQL. Legal because the trainer is
# deterministic and every float chain is left-associated (module
# docstring): seeds = the k smallest vec_ids; each iteration's assignment
# scores unroll to the same `0.0 + e1*(c1/cn) + …` chain NumPy executes
# per (row, cluster) cell; updates are decimal-exact means of the
# row-locally normalized members with empty-cluster carry (COALESCE);
# after `iters` rounds, one final assignment labels the corpus and its
# (carry-free) means are the serving centroids — exactly the artifacts
# `train_kmeans_quantizer` publishes. The probe then mirrors
# similarity.IVF_TOPK_SQL over those CTEs. At oracle scale (≤ a few
# thousand vectors × k=16 × 6 assigns) DuckDB evaluates this in seconds.


def _sql_scaled_dot(e: str, c: str, cn: str) -> str:
    """`Σ_d e[d] * (c[d]/cn)` — the assignment score chain: divide each
    centroid component by the centroid norm, multiply by the raw vector
    component, accumulate left-associated from 0.0 (term-for-term the
    NumPy kernel in :func:`_assign_clusters`)."""
    terms = " + ".join(
        f"CAST({e}[{i}] AS DOUBLE) * ({c}[{i}] / {cn})" for i in range(1, DIM + 1)
    )
    return f"(0.0 + {terms})"


def _kmeans_training_ctes(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, src: str = "embeddings"
) -> tuple[str, int]:
    """CTE chain replaying the training; returns (sql, fi) where ``cl{fi}``
    is the final corpus assignment and ``u{fi}`` the serving centroids.
    ``src`` names the training-corpus relation (round 12 — the upsert
    oracle trains on a ``emb_corpus`` split CTE; the default produces a
    byte-identical chain to the pre-parameter code, so every existing
    oracle string is unchanged)."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _sql_dot

    parts = [
        f"""seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS label, embedding
  FROM (SELECT vec_id, embedding FROM {src} ORDER BY vec_id LIMIT {k}) s),
c0 AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS centroid
  FROM seeds, UNNEST(range(1, {DIM + 1})) AS t(i)),
vnorm AS (
  SELECT vec_id, CASE WHEN nrm > 0 THEN nrm ELSE 1.0 END AS n
  FROM (SELECT vec_id, sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
        FROM {src}) v)"""
    ]
    for it in range(1, iters + 2):  # iters training rounds + 1 final assign
        prev = it - 1
        parts.append(
            f"""ca{it} AS (
  SELECT label, list(centroid ORDER BY dim) AS c_emb FROM c{prev} GROUP BY label),
cn{it} AS (
  SELECT label, c_emb, sqrt({_sql_dot('c_emb', 'c_emb')}) AS cn FROM ca{it}),
s{it} AS (
  SELECT e.vec_id, a.label,
         CASE WHEN a.cn = 0 THEN CAST('-infinity' AS DOUBLE)
              ELSE {_sql_scaled_dot('e.embedding', 'a.c_emb', 'a.cn')} END AS score
  FROM {src} e, cn{it} a),
cl{it} AS (
  SELECT vec_id, label AS cluster FROM (
    SELECT vec_id, label,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, label) AS rn
    FROM s{it}) r WHERE rn = 1),
u{it} AS (
  SELECT cl.cluster AS label, t.i - 1 AS dim,
         CAST(SUM(CAST(FLOOR((CAST(e.embedding[t.i] AS DOUBLE) / v.n) * 1e15) AS DECIMAL(38,0))) AS DOUBLE)
           / 1e15 / CAST(COUNT(*) AS DOUBLE) AS centroid
  FROM {src} e
  JOIN cl{it} cl ON cl.vec_id = e.vec_id
  JOIN vnorm v ON v.vec_id = e.vec_id,
  UNNEST(range(1, {DIM + 1})) AS t(i)
  GROUP BY cl.cluster, t.i)"""
        )
        if it <= iters:  # training round: empty-cluster carry
            parts.append(
                f"""c{it} AS (
  SELECT p.label, p.dim, COALESCE(u.centroid, p.centroid) AS centroid
  FROM c{prev} p LEFT JOIN u{it} u ON u.label = p.label AND u.dim = p.dim)"""
            )
        # final round: u{it} (no carry) IS the serving centroid table —
        # cells match the final partitioning, absent clusters stay absent,
        # exactly as train_kmeans_quantizer's centroid artifact
    return ",\n".join(parts), iters + 1


def _kmeans_probe_ctes(
    fi: int, nprobe: int = 1, labels_rel: str | None = None
) -> str:
    """The serving probe over the replayed training (mirror of
    similarity.IVF_TOPK_SQL, with trained centroids ``u{fi}`` and trained
    corpus labels ``cl{fi}``). ``nprobe`` generalizes the assignment to
    the top-N cells per query (``rn <= nprobe``) — the same widening the
    Spark probe's public dial applies; each corpus vector lives in exactly
    one cell, so no DISTINCT is needed downstream (round-10 verdict ask:
    the oracle previously hardcoded nprobe=1).

    Zero-norm contract note (round-10 ADVICE): the Spark probe REFUSES a
    zero-norm query vector or trained centroid loudly (raise_error via
    ``_jvm_nonzero`` in similarity._ivf_probe); this replay mirrors the
    guard with ``error()`` CASE branches at both norm sites so the
    engine/oracle contract stays symmetric even on degenerate corpora
    (unreachable on the shipped corpora — every row has a positive norm)."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        QUERY_MOD,
        _sql_dot,
    )

    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    # labels_rel (round 12): the relation supplying the stored corpus's
    # cell labels — default the training replay's final assignment
    # (byte-identical to the pre-parameter chain); the serving-view probe
    # passes the cl{fi} ∪ upa union instead.
    labels = labels_rel if labels_rel is not None else f"cl{fi}"
    return f"""kcents AS (
  SELECT label AS c_label, list(centroid ORDER BY dim) AS c_emb FROM u{fi} GROUP BY label),
kcents2 AS (
  SELECT c_label, c_emb,
         CASE WHEN cn0 > 0 THEN cn0
              ELSE error('zero-norm centroid: cosine similarity is undefined') END AS c_norm
  FROM (SELECT c_label, c_emb, sqrt({_sql_dot('c_emb', 'c_emb')}) AS cn0 FROM kcents) k),
kbase AS (
  SELECT vec_id, embedding, klabel,
         CASE WHEN n0 > 0 THEN n0
              ELSE error('zero-norm embedding: cosine similarity is undefined') END AS norm
  FROM (SELECT e.vec_id, e.embedding, cl.cluster AS klabel,
               sqrt({_sql_dot('e.embedding', 'e.embedding')}) AS n0
        FROM embeddings e JOIN {labels} cl ON cl.vec_id = e.vec_id) b),
kassign AS (
  SELECT q.vec_id AS q_id, c_label,
         {_sql_dot('q.embedding', 'c_emb')} / (q.norm * c_norm) AS ccos
  FROM kbase q, kcents2 WHERE q.vec_id % {QUERY_MOD} = 0),
kassigned AS (
  SELECT q_id, c_label FROM (
    SELECT q_id, c_label,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ccos DESC, c_label) AS rn
    FROM kassign) r WHERE rn <= {nprobe}),
kscored AS (
  SELECT a.q_id, c.vec_id AS neighbor_id,
         {_sql_dot('qv.embedding', 'c.embedding')} / (qv.norm * c.norm) AS cosine
  FROM kassigned a
  JOIN kbase qv ON qv.vec_id = a.q_id
  JOIN kbase c ON c.klabel = a.c_label AND c.vec_id <> a.q_id),
kranked AS (
  SELECT q_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM kscored)"""


def _kmeans_topk_sql() -> str:
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import TOP_K

    train, fi = _kmeans_training_ctes()
    return f"""
WITH {train},
{_kmeans_probe_ctes(fi)}
SELECT q_id, neighbor_id, cosine, rank FROM kranked WHERE rank <= {TOP_K}
ORDER BY q_id, rank
"""


def _bf_topk_ctes() -> str:
    """The brute-force ground-truth CTE pair (``bf_scored``/``bf``) —
    ONE definition shared by the retrained and upserted recall oracles
    (round-12 second review: the block was byte-copied; a future change
    to TOP_K/tie-break/zero-norm semantics must reach both)."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        TOP_K,
        _sql_dot,
    )

    return f"""bf_scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
         {_sql_dot('q.embedding', 'c.embedding')} / (q.norm * c.norm) AS cosine
  FROM q JOIN base c ON c.vec_id <> q.vec_id),
bf AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM bf_scored) r WHERE rank <= {TOP_K})"""


def _recall_cross_sql() -> str:
    """The recall evaluation tail (``kivf``/``h``/``tot`` + final SELECT)
    over a ``kranked`` probe and the ``bf`` ground truth — the other
    shared half of the two recall oracles."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import TOP_K

    return f"""kivf AS (SELECT q_id, neighbor_id FROM kranked WHERE rank <= {TOP_K}),
h AS (SELECT COUNT(*) AS hits FROM bf JOIN kivf USING (q_id, neighbor_id)),
tot AS (SELECT COUNT(DISTINCT q_id) AS n_queries, COUNT(*) AS possible FROM bf)
SELECT n_queries, hits, possible,
       CAST(hits AS DOUBLE) / CAST(possible AS DOUBLE) AS recall
FROM tot, h
"""


def _kmeans_recall_sql(nprobe: int = 1) -> str:
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _sql_base

    train, fi = _kmeans_training_ctes()
    return f"""
WITH {_sql_base()},
{_bf_topk_ctes()},
{train},
{_kmeans_probe_ctes(fi, nprobe=nprobe)},
{_recall_cross_sql()}"""


def _kmeans_index_build_sql() -> str:
    """Per-cell inventory of the trained index — the assignment replay
    (``cl{fi}``) IS the cell layout the build partitions by."""
    train, fi = _kmeans_training_ctes()
    return f"""
WITH {train}
SELECT cluster AS label, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM cl{fi} GROUP BY cluster ORDER BY label
"""


def _dedup_semantic_sql(threshold: float = SEMANTIC_DUP_THRESHOLD) -> str:
    """Training replay + within-cell pair scan + exemplar rank — the
    whole SemDeDup decision chain as one DuckDB statement."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _sql_base,
        _sql_dot,
    )

    train, fi = _kmeans_training_ctes()
    return f"""
WITH {train},
{_sql_base()},
cand AS (
  SELECT a.cluster, a.vec_id AS d1, b.vec_id AS d2
  FROM cl{fi} a JOIN cl{fi} b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
scored AS (
  SELECT cand.cluster, cand.d1, cand.d2,
         {_sql_dot('v1.embedding', 'v2.embedding')} / (v1.norm * v2.norm) AS cosine
  FROM cand
  JOIN base v1 ON v1.vec_id = cand.d1
  JOIN base v2 ON v2.vec_id = cand.d2),
ranked AS (
  SELECT d2, cluster, d1, cosine,
         ROW_NUMBER() OVER (PARTITION BY d2 ORDER BY cosine DESC, d1) AS rn
  FROM scored WHERE cosine >= {threshold})
SELECT d2 AS vec_id, cluster, d1 AS exemplar_id, cosine
FROM ranked WHERE rn = 1
ORDER BY vec_id
"""


def _upsert_assign_ctes(fi: int) -> str:
    """The batch-assignment replay (CTEs ``upc``/``upc2``/``ups``/``upa``
    — ``upa(vec_id, label)`` is the drop's cell assignment), over a
    corpus-split training chain's serving centroids ``u{fi}``. Shared by
    the upsert-inventory oracle and the serving-view probe oracle (one
    definition of the assignment replay). Scores every BATCH vector with
    the trainer's own left-associated scaled-dot chain
    (``_sql_scaled_dot`` mirrors the NumPy kernel term-for-term;
    zero-norm centroids score -infinity; ties take the lowest label)."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _sql_dot

    return f"""upc AS (
  SELECT label, list(centroid ORDER BY dim) AS c_emb FROM u{fi} GROUP BY label),
upc2 AS (
  SELECT label, c_emb, sqrt({_sql_dot('c_emb', 'c_emb')}) AS cn FROM upc),
ups AS (
  SELECT e.vec_id, a.label,
         CASE WHEN a.cn = 0 THEN CAST('-infinity' AS DOUBLE)
              ELSE {_sql_scaled_dot('e.embedding', 'a.c_emb', 'a.cn')} END AS score
  FROM embeddings e, upc2 a
  WHERE e.vec_id % {UPSERT_MOD} = {UPSERT_MOD - 1}),
upa AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, label) AS rn
    FROM ups) r WHERE rn = 1)"""


def _kmeans_upsert_sql() -> str:
    """Full assignment-replay oracle for the upsert row: re-train the
    corpus-SPLIT quantizer (the same unrolled Lloyd's chain, over the
    ``emb_corpus`` CTE), take its serving centroids ``u{fi}`` — exactly
    the centroid artifact the engine's assign pass broadcasts — then
    replay the batch assignment and count per winning cell."""
    train, fi = _kmeans_training_ctes(src="emb_corpus")
    return f"""
WITH emb_corpus AS (
  SELECT * FROM embeddings WHERE vec_id % {UPSERT_MOD} <> {UPSERT_MOD - 1}),
{train},
{_upsert_assign_ctes(fi)}
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_new_vectors
FROM upa GROUP BY label ORDER BY label
"""


def _upserted_serving_ctes() -> tuple[str, int]:
    """The upserted serving path's replay prologue — corpus-split
    training (``emb_corpus`` + the training chain), the batch assignment
    (``upa``), and the ``serving_labels`` union — ONE definition shared
    by the serving-view topk and recall oracles (round-12 second review:
    the prologue was byte-copied). Returns (ctes, fi)."""
    train, fi = _kmeans_training_ctes(src="emb_corpus")
    return (
        f"""emb_corpus AS (
  SELECT * FROM embeddings WHERE vec_id % {UPSERT_MOD} <> {UPSERT_MOD - 1}),
{train},
{_upsert_assign_ctes(fi)},
serving_labels AS (
  SELECT vec_id, cluster FROM cl{fi}
  UNION ALL
  SELECT vec_id, label AS cluster FROM upa)""",
        fi,
    )


def _kmeans_upserted_recall_sql(nprobe: int = SERVING_NPROBE) -> str:
    """Recall replay for the upserted serving path: brute-force ground
    truth over all embeddings, the shared serving prologue (corpus-split
    training + batch assignment + label union), the nprobe-widened
    probe, and the shared recall cross — one WITH-chain."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _sql_base

    serving, fi = _upserted_serving_ctes()
    return f"""
WITH {_sql_base()},
{_bf_topk_ctes()},
{serving},
{_kmeans_probe_ctes(fi, labels_rel="serving_labels", nprobe=nprobe)},
{_recall_cross_sql()}"""


def _kmeans_upserted_topk_sql(nprobe: int = 1) -> str:
    """Serving-view probe oracle: the shared serving prologue, then the
    standard probe CTEs over the label union — certifying end-to-end
    that a probe against (main index ∪ per-drop segment) serves exactly
    what the replayed deployment would."""
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import TOP_K

    serving, fi = _upserted_serving_ctes()
    return f"""
WITH {serving},
{_kmeans_probe_ctes(fi, labels_rel="serving_labels", nprobe=nprobe)}
SELECT q_id, neighbor_id, cosine, rank FROM kranked WHERE rank <= {TOP_K}
ORDER BY q_id, rank
"""


KMEANS_TOPK_SQL = _kmeans_topk_sql()
KMEANS_RECALL_SQL = _kmeans_recall_sql()
KMEANS_RECALL_NPROBE4_SQL = _kmeans_recall_sql(nprobe=SERVING_NPROBE)
KMEANS_INDEX_BUILD_SQL = _kmeans_index_build_sql()
KMEANS_UPSERT_SQL = _kmeans_upsert_sql()
KMEANS_UPSERTED_TOPK_SQL = _kmeans_upserted_topk_sql()
KMEANS_UPSERTED_RECALL_SQL = _kmeans_upserted_recall_sql()
DEDUP_SEMANTIC_SQL = _dedup_semantic_sql()
KMEANS_CELL_STATS_SQL = _kmeans_cell_stats_sql()

KMEANS_IVF_QUERIES = {
    "ivf_kmeans_topk": (ivf_kmeans_topk, KMEANS_TOPK_SQL),
    # the materialized index changes the access path, never the answer —
    # same oracle, same doctrine as ivf_topk/ivf_topk_pruned
    "ivf_kmeans_topk_pruned": (ivf_kmeans_topk_pruned, KMEANS_TOPK_SQL),
    "ivf_kmeans_index_build": (ivf_kmeans_index_build, KMEANS_INDEX_BUILD_SQL),
    "ivf_kmeans_recall_at_10": (ivf_kmeans_recall_at_10, KMEANS_RECALL_SQL),
    # the serving-grade operating point, hash-certified (round-11):
    "ivf_kmeans_recall_nprobe4": (ivf_kmeans_recall_nprobe4, KMEANS_RECALL_NPROBE4_SQL),
    # the incremental drop's assign-without-retrain step (round 12):
    "ivf_kmeans_index_upsert": (ivf_kmeans_index_upsert, KMEANS_UPSERT_SQL),
    # the query path between re-indexings: probe over main ∪ segment
    "ivf_kmeans_topk_upserted": (ivf_kmeans_topk_upserted, KMEANS_UPSERTED_TOPK_SQL),
    # two drops into the re-index interval: probe over main ∪ seg(0of2) ∪
    # seg(1of2) — same oracle string BY DESIGN (the drops partition the
    # batch; per-row assignment against the same published quantizer makes
    # the unions identical), certifying the N-segment lifecycle end-to-end
    "ivf_kmeans_topk_upserted2": (ivf_kmeans_topk_upserted2, KMEANS_UPSERTED_TOPK_SQL),
    # serving-grade recall WITHOUT retraining — the upsert story's number
    "ivf_kmeans_recall_upserted": (ivf_kmeans_recall_upserted, KMEANS_UPSERTED_RECALL_SQL),
    # SemDeDup: the trained cells double as the dedup candidate structure
    "dedup_semantic": (dedup_semantic, DEDUP_SEMANTIC_SQL),
    # the quantizer health report: per-cell occupancy + cohesion
    "ivf_kmeans_cell_stats": (ivf_kmeans_cell_stats, KMEANS_CELL_STATS_SQL),
}
