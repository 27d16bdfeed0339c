"""Central query registry: name → (spark_fn, oracle_sql | None).

This is the engine's declared operator surface (driver contract + SURVEY.md
§2 checklist). ``oracle_sql=None`` marks genuinely non-SQL-expressible
operators (driver records a rows-only check).
"""

from __future__ import annotations

from kafka_connect_storage_cloud_formats_spark.queries.pipeline_queries import (
    AVRO_ROUNDTRIP_SQL,
    JSON_ROUNDTRIP_SQL,
    ORC_PARTITIONED_SQL,
    ORC_ROUNDTRIP_SQL,
    PARQUET_ROUNDTRIP_SQL,
    CSV_ROUNDTRIP_SQL,
    SCHEMA_EVOLUTION_SQL,
    avro_roundtrip,
    csv_roundtrip,
    json_roundtrip,
    orc_ingest_roundtrip,
    orc_partitioned_roundtrip,
    parquet_roundtrip,
    schema_evolution_roundtrip,
)
from kafka_connect_storage_cloud_formats_spark.operators.asof import ASOF_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.scale_utils import SCALE_UTILS_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.compaction import COMPACTION_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.dedup import DEDUP_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.multimodal import MULTIMODAL_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.profiling import PROFILING_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.similarity import SIMILARITY_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.training_pipeline import TRAINING_PIPELINE_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.text import TEXT_QUERIES
from kafka_connect_storage_cloud_formats_spark.queries.relational import RELATIONAL_QUERIES
from kafka_connect_storage_cloud_formats_spark.streaming.windows import STREAMING_WINDOW_QUERIES

_ALL: dict = {
    # --- reference pipeline semantics (SURVEY.md §2.1), oracle-gated
    "orc_ingest_roundtrip": (orc_ingest_roundtrip, ORC_ROUNDTRIP_SQL),
    "orc_partitioned_roundtrip": (orc_partitioned_roundtrip, ORC_PARTITIONED_SQL),
    "parquet_roundtrip": (parquet_roundtrip, PARQUET_ROUNDTRIP_SQL),
    "json_roundtrip": (json_roundtrip, JSON_ROUNDTRIP_SQL),
    # real Avro binary on both paths (JVM to_avro/from_avro when the jar is
    # loaded, else the engine's spec-compliant codec) — oracle-gated
    "avro_roundtrip": (avro_roundtrip, AVRO_ROUNDTRIP_SQL),
    "schema_evolution_roundtrip": (schema_evolution_roundtrip, SCHEMA_EVOLUTION_SQL),
    "csv_roundtrip": (csv_roundtrip, CSV_ROUNDTRIP_SQL),
}
_ALL.update(RELATIONAL_QUERIES)
_ALL.update(TEXT_QUERIES)
_ALL.update(DEDUP_QUERIES)
_ALL.update(SIMILARITY_QUERIES)
_ALL.update(MULTIMODAL_QUERIES)
_ALL.update(STREAMING_WINDOW_QUERIES)
_ALL.update(PROFILING_QUERIES)
_ALL.update(COMPACTION_QUERIES)
_ALL.update(TRAINING_PIPELINE_QUERIES)
_ALL.update(ASOF_QUERIES)
_ALL.update(SCALE_UTILS_QUERIES)

# The driver's correctness gate checks a positional window of the first 50
# registry entries. Rotate each round so the least-evidenced queries lead:
# (a) queries with only rows ≥2 rounds old, (b) queries whose
# implementation changed this round (fresh rows certify the shipped code,
# not a stale predecessor). The ordering below was prepared FOR the round
# recorded here; once the driver writes CORRECTNESS_r{ROTATED_FOR_ROUND},
# the window has served its purpose and the positional invariant is
# expected to lapse until the next rotation (tests/test_registry.py keys
# its window assertion off this constant).
ROTATED_FOR_ROUND = 7

_STALE_AFTER_R6 = [
    # the 41 registered queries whose latest driver rows are r5-vintage
    # (tools/rotate_registry.py) — they lead the r7 window so the
    # ≤1-round-stale invariant holds a fourth consecutive round
    "orc_ingest_roundtrip", "orc_partitioned_roundtrip",
    "parquet_roundtrip", "json_roundtrip", "schema_evolution_roundtrip",
    "csv_roundtrip", "q21_sole_late_supplier", "q2_min_acctbal_supplier",
    "q22_rich_inactive_customers", "orders_cube", "events_pivot_hourly",
    "q7_nation_trade_volume", "q14_promo_revenue_share",
    "q19_disjunctive_revenue", "q10_returned_revenue",
    "q13_order_count_distribution", "q6_forecast_revenue",
    "q8_nation_market_share", "q15_top_supplier",
    "part_brand_type_setops", "array_function_gallery", "doc_top_terms",
    "text_quality_stats", "lang_id_heuristic", "token_count_bpe",
    "doc_fingerprint", "dedup_exact", "minhash_signatures",
    "simhash_fingerprints", "simhash_near_pairs", "dedup_fuzzy_prefix",
    "knn_bruteforce", "ann_lsh_topk", "ivf_centroids", "sq8_topk",
    "sq8_recall_at_10", "dedup_embedding_cosine", "media_feature_extract",
    "image_resize_thumbnail", "bucketed_segment_revenue",
    "salted_cohort_activity",
]
_CHANGED_THIS_ROUND = [
    # round 7: the artifact cache's publish/existence/sweep protocol moved
    # from driver-local os.rename to the Hadoop FileSystem API with a
    # configurable root (artifacts.py — the round-6 verdict's lead item).
    # Every ensure_artifact-transiting query with an r6 row re-certifies
    # on the new substrate (minhash_signatures and ivf_centroids are in
    # the stale list above, so all 11 artifact consumers are in-window):
    "dedup_ngram_jaccard", "benchmark_contamination", "doc_bigram_novelty",
    "minhash_lsh_pairs", "neardup_clusters", "training_corpus_stats",
    "ivf_index_build", "ivf_topk", "ivf_topk_pruned",
]
# Out-of-window touches, documented (the window is exactly full — 41
# stale + 9 changed — and the ≤1-round-stale invariant takes the slots):
# 1. corpus_split_stats / stratified_sample: _hash_bucket gained a
#    hash-family branch (round-6 verdict ask #4); the default (md5)
#    branch is the character-identical expression, so the registered
#    plans are unchanged — re-verified hash-green at sf0.001/0.01/0.1
#    during round 7 (tools/check_correctness.py).
# 2. approx_profile: the tolerance verdicts gained degenerate-group
#    guards (round-6 ADVICE #1 — all-NULL user_id/value groups emitted
#    NULL instead of a boolean). No such group exists in the driver
#    corpus, so results are unchanged there — re-verified hash-green at
#    sf0.001/0.01/0.1 during round 7; the guards are unit-tested on a
#    degenerate fixture (tests/test_profiling.py).
# 3. ann_recall_at_10 (composes ann_lsh_topk, which IS in the stale list
#    above): inherits the hyperplane-signature artifact switch — the
#    signature values are identical integers (parquet roundtrip exact),
#    so the recall result is row-identical; re-verified hash-green at
#    sf0.001/0.01/0.1 during round 7.
_PRIORITY = _STALE_AFTER_R6 + _CHANGED_THIS_ROUND

QUERIES: dict = {n: _ALL[n] for n in _PRIORITY if n in _ALL}
QUERIES.update({n: v for n, v in _ALL.items() if n not in QUERIES})
assert len(QUERIES) == len(_ALL)
