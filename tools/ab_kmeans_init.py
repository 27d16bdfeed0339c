#!/usr/bin/env python3
"""A/B: k-means init strategies for the trained IVF quantizer (round-10
verdict ask #3) — smallest-vec_ids ("lowid", the registered default) vs
deterministic farthest-point ("spread", kmeans_ivf._spread_seed_matrix).

For each init, trains at equal (k, iters) through the REAL trainer (same
kernels, same artifacts machinery — content-keyed per init token), then
measures the recall@10 sweep through the REAL probe (_ivf_probe, the same
path the registered queries serve) and the spherical objective
(mean cosine of each vector to its assigned centroid).

Usage: python3 tools/ab_kmeans_init.py [sf_dir] [k] [iters]
Record the outcome in SCALE.md either way (band-postings discipline).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
NPROBES = (1, 2, 4, 8)


def objective(spark, sf: str, init: str) -> float:
    """Mean cos(x, assigned centroid) — the spherical k-means objective.
    Collected to the driver: measurement tool only, corpus is the test
    corpus (the engine's own objective pin lives in tests/test_kmeans_ivf)."""
    from kafka_connect_storage_cloud_formats_spark.functions.vectors import _seq_dot
    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        _collect_centroid_matrix,
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import _load

    assignment, cent_long = train_kmeans_quantizer(spark, sf, k=K, iters=ITERS, init=init)
    labels, M = _collect_centroid_matrix(cent_long)
    lab_pos = {int(l): i for i, l in enumerate(labels)}
    cn = np.sqrt(_seq_dot(M, M))
    rows = (
        _load(spark, sf)
        .select("vec_id", "embedding")
        .join(assignment, "vec_id")
        .collect()
    )
    tot = 0.0
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        c = M[lab_pos[int(r["cluster"])]]
        tot += float(x @ c) / (float(np.sqrt(x @ x)) * float(cn[lab_pos[int(r["cluster"])]]))
    return tot / len(rows)


def recall_sweep(spark, sf: str, init: str) -> dict[int, float]:
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import (
        train_kmeans_quantizer,
    )
    from kafka_connect_storage_cloud_formats_spark.operators.similarity import (
        _ivf_probe,
        _load,
        _recall_vs_truth,
        _with_norm,
    )

    assignment, cent_long = train_kmeans_quantizer(spark, sf, k=K, iters=ITERS, init=init)
    corpus = _with_norm(
        _load(spark, sf)
        .select("vec_id", "embedding")
        .join(assignment.select("vec_id", F.col("cluster").alias("label")), "vec_id")
    )
    out = {}
    for nprobe in NPROBES:
        approx = _ivf_probe(spark, sf, cent_long, corpus, nprobe=nprobe)
        out[nprobe] = _recall_vs_truth(spark, sf, approx).collect()[0]["recall"]
    return out


def main() -> int:
    from kafka_connect_storage_cloud_formats_spark import get_spark

    spark = get_spark("ab-kmeans-init")
    print(f"# corpus={SF} k={K} iters={ITERS}")
    for init in ("lowid", "spread"):
        sweep = recall_sweep(spark, SF, init)
        obj = objective(spark, SF, init)
        cells = " ".join(f"nprobe{n}={sweep[n]:.4f}" for n in NPROBES)
        print(f"{init:6s} objective={obj:.6f} {cells}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
