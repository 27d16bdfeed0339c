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
ROTATED_FOR_ROUND = 5

_STALE_AFTER_R4 = [
    # evidenced only by r3-vintage driver rows (verbatim from
    # tools/rotate_registry.py: the 41 registered queries without a
    # CORRECTNESS_r04.json row) — round-4 verdict ask #2
    "orc_ingest_roundtrip", "orc_partitioned_roundtrip",
    "schema_evolution_roundtrip", "csv_roundtrip",
    # NOTE: two stale-list queries ALSO changed in round 5 (the two
    # KNOWN_ISSUES items, fixed in-window so their fresh rows certify the
    # shipped code): q21_sole_late_supplier (eager plan-build
    # localCheckpoint dropped for a lazy AQE-shared plan) and
    # part_brand_type_setops (dead exceptAll(big) branch replaced with a
    # real EXCEPT ALL, branch-tagged, oracle-modeled).
    "q21_sole_late_supplier",
    "q2_min_acctbal_supplier", "q22_rich_inactive_customers",
    "orders_cube", "events_pivot_hourly",
    "q7_nation_trade_volume", "q14_promo_revenue_share",
    "q19_disjunctive_revenue", "q10_returned_revenue",
    "q13_order_count_distribution", "q6_forecast_revenue",
    "q8_nation_market_share", "q15_top_supplier",
    "part_brand_type_setops", "array_function_gallery",
    "doc_top_terms", "text_quality_stats", "lang_id_heuristic",
    "token_count_bpe", "doc_fingerprint", "benchmark_contamination",
    "dedup_exact", "dedup_ngram_jaccard", "minhash_signatures",
    "simhash_fingerprints", "simhash_near_pairs", "dedup_fuzzy_prefix",
    "knn_bruteforce", "ann_lsh_topk", "ivf_centroids",
    "sq8_topk", "sq8_recall_at_10", "dedup_embedding_cosine",
    "media_feature_extract", "image_resize_thumbnail",
    "approx_profile", "salted_cohort_activity",
]
_CHANGED_THIS_ROUND = [
    # round 5: two-level exact-distinct profile rewrite (posexplode +
    # partial dedup; 1.6 s → ~1.0 s, oracle unchanged)
    "orders_column_profile",
    # round 5: pointer-doubling CC promoted into the registered path;
    # training pipeline consumes the same labels
    "neardup_clusters", "training_corpus_stats",
    # round 5: artifact publish now sweeps stale fingerprints — every
    # ensure_artifact caller re-certifies on the new lifecycle
    "minhash_lsh_pairs", "ivf_index_build", "ivf_topk_pruned",
    # round 5: warehouse-scheme guard on the bucketed-table self-heal path
    "bucketed_segment_revenue",
]
_PRIORITY = _STALE_AFTER_R4 + _CHANGED_THIS_ROUND

QUERIES: dict = {n: _ALL[n] for n in _PRIORITY if n in _ALL}
QUERIES.update({n: v for n, v in _ALL.items() if n not in QUERIES})
assert len(QUERIES) == len(_ALL)
