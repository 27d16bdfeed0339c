"""Central query registry: name → (spark_fn, oracle_sql | None).

This is the engine's declared operator surface (driver contract + SURVEY.md
§2 checklist). ``oracle_sql=None`` marks genuinely non-SQL-expressible
operators (driver records a rows-only check).
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_storage_cloud_formats_spark.catalog import (
    canon_path,
    is_remote,
    path_fingerprint,
)

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
from kafka_connect_storage_cloud_formats_spark.operators.kmeans_ivf import KMEANS_IVF_QUERIES
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
# Trained-quantizer IVF serving tier (round 10): the label-quantizer
# ivf_topk/ivf_topk_pruned/ivf_recall_at_10 entries above stay registered
# as the DEGENERATE BASELINE (an untrained coarse quantizer — recall@10
# 0.15 at nprobe=1); the ivf_kmeans_* family is the serving default a 100 TB
# deployment should run (~2× recall at identical probe cost, SCALE.md).
_ALL.update(KMEANS_IVF_QUERIES)
_ALL.update(MULTIMODAL_QUERIES)
_ALL.update(STREAMING_WINDOW_QUERIES)
_ALL.update(PROFILING_QUERIES)
_ALL.update(COMPACTION_QUERIES)
_ALL.update(TRAINING_PIPELINE_QUERIES)
_ALL.update(ASOF_QUERIES)
_ALL.update(SCALE_UTILS_QUERIES)

# --- prepared-plan cache -----------------------------------------------
# DataFrames are immutable logical plans, so a registered query's built
# plan can be handed back to every caller, exactly as catalog.load_table
# already does per table: the ~0.02-0.25 s of pure driver work a build
# pays (py4j round trips per DataFrame op, artifact-memo checks, driver
# collects of contract-bounded query matrices) is paid ONCE per
# (session, corpus) instead of once per execution. This is the prepared-
# statement shape a production endpoint uses — plan once, execute many —
# and it is where ~6 s of the 91-query bench total lived (round-8 verdict
# ask #1: the per-query fixed floor). Catalyst still plans the PHYSICAL
# execution fresh per action, so AQE/runtime re-planning is untouched.
#
# Safety rails, mirroring the table cache (catalog._TABLE_CACHE):
# - keyed by applicationId (a restarted session never sees plans bound to
#   a dead JVM) and the realpath'd corpus identity;
# - revalidated per call by the stat-only corpus fingerprint, so a corpus
#   REGENERATED at the same path rebuilds the plan, never serves stale;
# - session timezone must be UTC on a hit (the same execution-time guard
#   catalog._require_utc enforces on table-cache hits) — a foreign-zone
#   session falls through to the builder, whose own guards raise loudly;
# - queries with PER-CALL side effects (the scratch-dir roundtrips: each
#   execution must physically re-write and re-read files, because the
#   write IS the thing being measured/certified) are never memoized.
#   Artifact builds (ensure_*) are not per-call effects: they are
#   content-keyed and self-memoizing, so caching their consumers is safe.
# - artifact delete+rebuild under an unchanged corpus: each cache entry
#   records the artifact paths its builder consumed
#   (artifacts.record_consumed_artifacts), and every HIT re-runs the
#   throttled generation check on them (artifacts.revalidate_artifact —
#   within the touch-throttle interval that is a dict lookup). A changed
#   or vanished generation fires the invalidation listeners, this cache
#   clears, and the call falls through to a rebuild — so the self-heal
#   reaches fully-cached sessions too (round-10 ADVICE: previously the
#   generation check lived only in ensure_artifact, which a hit skips
#   entirely, leaving a cached plan on permanent FileNotFound). In the
#   sub-interval window before detection the next action fails LOUDLY
#   with FileNotFound — nothing stale is served.
# - sweep-liveness note: since round 10 a cache hit refreshes each
#   consumed artifact's liveness touch through revalidate_artifact's
#   throttle (hits previously skipped ensure_artifact entirely), so a
#   fully-cached session's artifacts stay inside the sweep grace window
#   by the same mechanism as builder sessions. The stale-sibling sweep
#   itself only runs when a NEW generation is published, which requires
#   the corpus fingerprint to have moved — and a moved fingerprint is a
#   cache MISS here (revalidated per call), so consumers of the old
#   artifact stop being served from this cache at exactly the moment a
#   sweep becomes possible. In-flight scans crossing a regeneration are
#   protected by the sweep's grace window, same as before this cache
#   existed.
# key → (corpus fingerprint, built plan, artifact paths the build consumed)
_PLAN_CACHE: dict[tuple[str, str, str], tuple[str, DataFrame, frozenset]] = {}
# Serialize the cache's iterate-and-mutate shapes (round-12 infra audit —
# the same hazard artifacts._MEMO_LOCK and catalog._TABLE_CACHE_LOCK
# close): the dead-app eviction comprehension races a sibling thread's
# insert, and _on_artifact_invalidated may clear() from any thread mid-
# iteration. Keyed reads stay lock-free (a stale hit re-validates by
# fingerprint + artifact generation).
import threading as _threading

_PLAN_CACHE_LOCK = _threading.Lock()


def _on_artifact_invalidated(_path: str) -> None:
    """Artifact-layer self-heal reaches the plan cache too: a cached
    registry plan may EMBED the invalidated artifact's file index (the
    registry doesn't know which queries consume which artifacts, so the
    whole cache clears — the event is an external delete+rebuild, rare
    enough that over-invalidation is the right trade; the next call per
    query is one rebuild)."""
    with _PLAN_CACHE_LOCK:
        _PLAN_CACHE.clear()


def _register_invalidation_hook() -> None:
    from kafka_connect_storage_cloud_formats_spark.artifacts import (
        register_invalidation_listener,
    )

    register_invalidation_listener(_on_artifact_invalidated)


_register_invalidation_hook()

_SIDE_EFFECT_QUERIES = frozenset(
    {
        "orc_ingest_roundtrip",
        "orc_partitioned_roundtrip",
        "parquet_roundtrip",
        "json_roundtrip",
        "csv_roundtrip",
        "schema_evolution_roundtrip",
        # Not side-effecting, but their DECLARED MEANING is "measure the
        # live build": ivf_index_build force-rebuilds the index per call
        # and neardup_clusters runs the live edge-collect + union-find at
        # plan-build time. A memoized plan would skip exactly the work
        # their bench rows exist to measure (verified: cached mins read
        # 0.11 s / 0.40 s vs the honest 0.89 s / 1.48 s). Their CONSUMER
        # paths (ivf_topk_pruned, training_corpus_stats via the label
        # artifact) are the cached serving shape.
        "ivf_index_build",
        "neardup_clusters",
        # round 10: the trained tier's build row — same declared meaning
        # as ivf_index_build (a memoized plan would skip the measured
        # rebuild); its consumer path (ivf_kmeans_topk_pruned) is the
        # cached serving shape
        "ivf_kmeans_index_build",
        # round 12: the accept/upsert steps of the incremental pipeline —
        # these rows exist to measure the per-drop build (merged
        # signature/fingerprint generations; cell-partitioned index
        # segment), so a memoized plan would skip exactly the measured
        # work. The serving-view probe (ivf_kmeans_topk_upserted) is the
        # cached consumer path, like every other probe row.
        "corpus_hash_merge",
        "corpus_signature_merge",
        "corpus_fingerprint_merge",
        "ivf_kmeans_index_upsert",
    }
)


def _prepared(name: str, fn):
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            utc = spark.conf.get("spark.sql.session.timeZone") == "UTC"
        except Exception:
            utc = False
        if not utc:
            # Non-UTC sessions bypass the cache: timezone-sensitive casts
            # read the zone at EXECUTION time, and the builder's own
            # guards (catalog._require_utc) are the authority on whether
            # that is an error for this query.
            return fn(spark, sf_dir)
        canon = canon_path(sf_dir)
        ident = canon if is_remote(canon) else os.path.realpath(canon)
        key = (spark.sparkContext.applicationId, name, ident)
        # Freshness contract: the WHOLE-corpus stat fingerprint re-runs
        # per call, so a corpus regenerated at the same path is never
        # served a stale plan — the deliberate trade is per-call listing
        # cost (trivial locally; on an object-store corpus a deployment
        # that cannot afford a recursive LIST per query should front this
        # with its own change signal — the cache never weakens freshness
        # to save the probe; round-12 infra audit, documented trade).
        fp = path_fingerprint(sf_dir, spark)
        hit = _PLAN_CACHE.get(key)
        # newSession() clones share the applicationId and therefore this
        # cache — the same deliberate contract as catalog._TABLE_CACHE
        # (whose cached table plans underlie every query here, so a
        # per-session plan cache would still execute under the building
        # session's state one layer down). That is safe for the same
        # reason it is there: registered queries read no temp views, and
        # the one execution-time-sensitive session conf (timezone) is
        # re-guarded on every call — the UTC check above runs against the
        # CALLER's session, and a non-UTC caller bypasses the cache into
        # the builder's own guards. Clones with materially divergent SQL
        # confs are outside the engine's contract (apply_session_confs
        # exists to align them).
        if hit is not None and hit[0] == fp:
            from kafka_connect_storage_cloud_formats_spark.artifacts import (
                revalidate_artifact,
            )

            # Re-check every artifact this plan embeds (throttled — a dict
            # lookup within the touch interval). Run ALL of them even after
            # a failure: each check doubles as the artifact's liveness
            # touch, and one stale member shouldn't stop the others' sweep
            # protection. A failed check fires the invalidation listeners,
            # which clear THIS cache — re-read instead of trusting `hit`.
            live = all([revalidate_artifact(p, spark) for p in hit[2]])
            hit = _PLAN_CACHE.get(key)
            if live and hit is not None and hit[0] == fp:
                return hit[1]
        from kafka_connect_storage_cloud_formats_spark.artifacts import (
            record_consumed_artifacts,
        )

        with record_consumed_artifacts() as consumed:
            df = fn(spark, sf_dir)
        # evict entries of dead applicationIds (same rule as the table
        # cache): they can never be served again, but left in place they
        # pin py4j handles bound to stopped JVMs for the process lifetime
        app = key[0]
        with _PLAN_CACHE_LOCK:
            for k in [k for k in _PLAN_CACHE if k[0] != app]:
                del _PLAN_CACHE[k]
            _PLAN_CACHE[key] = (fp, df, frozenset(consumed))
        return df

    return wrapped


_ALL = {
    name: (fn if name in _SIDE_EFFECT_QUERIES else _prepared(name, fn), sql)
    for name, (fn, sql) in _ALL.items()
}

# The driver's correctness gate checks a positional window of the first 50
# registry entries. Rotate each round so the least-evidenced queries lead:
# (a) queries with only rows ≥2 rounds old, (b) queries whose
# implementation changed this round (fresh rows certify the shipped code,
# not a stale predecessor). The ordering below was prepared FOR the round
# recorded here; once the driver writes CORRECTNESS_r{ROTATED_FOR_ROUND},
# the window has served its purpose and the positional invariant is
# expected to lapse until the next rotation (tests/test_registry.py keys
# its window assertion off this constant).
ROTATED_FOR_ROUND = 13

# WINDOW-CAPACITY NOTE (round 13, protocol from round 11): 113 registered
# queries (115 after the late repeated-ngram mass + scrub additions); the
# guarantee is ceil(N/50)=3-rounds max staleness via
# rotation, every new/changed query debuts in-window, and EVERY query is
# re-certified on HEAD each round by the full-registry oracle run
# (tools/check_correctness.py --repeat -- a standing round gate). The 15
# that slip to r14 (the exact N-100 cap) are stable r11-green shapes none
# of which changed this round: simple relational aggregates / galleries /
# pivot-cube forms (their family stays richly in-window via the 11
# returning r13 slips plus q8/q21/q22), four whole-corpus text
# aggregates (doc_fingerprint/contamination/novelty stay in-window),
# the two simplest exact-dedup shapes (the whole
# curation/merge chain plus the new repeated-ngram report are
# in-window), and one profiling split row (stratified_sample stays).
_SLIPPED_TO_R14 = [
    "q2_min_acctbal_supplier",
    "q7_nation_trade_volume",
    "q10_returned_revenue",
    "q19_disjunctive_revenue",
    "orders_cube",
    "events_pivot_hourly",
    "part_brand_type_setops",
    "array_function_gallery",
    "doc_top_terms",
    "text_quality_stats",
    "dedup_exact",
    "dedup_canonical",
    "corpus_split_stats",
    "lang_id_heuristic",
    "token_count_bpe",
]

_STALE_AFTER_R12 = [
    # THE SLIP LIST LEADS (standing protocol -- round-12 verdict ask #1):
    # the 11 r10-vintage queries declared _SLIPPED_TO_R13 last round --
    # 3 rounds stale at this debut, the ceil(N/50) bound's edge; nothing
    # older remains.
    "q4_priority_with_late_ship",
    "q11_important_parts",
    "q12_priority_by_returnflag",
    "q16_supplier_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q20_promotion_suppliers",
    "distinct_parts_per_supplier",
    "orders_price_moments",
    "scalar_function_gallery",
    "events_hourly_rollup",
    # NEW this round (never driver-evidenced): the second-drop curation
    # report (round-12 verdict ask #4 -- the chain classified against the
    # MERGED generations) and the multi-segment serving probe (ask #3 --
    # main + seg(0of2) + seg(1of2), oracle shared with the single-drop
    # row BY DESIGN: the drops partition the batch and assign
    # row-independently against the same published quantizer).
    "curation_second_drop_report",
    "ivf_kmeans_topk_upserted2",
    # ... and the exact-substring duplication-mass report (Lee et al.
    # 2022's ExactSubstr signal re-expressed Spark-first -- the
    # document-level tiers structurally cannot see k-token runs repeated
    # across otherwise-distinct documents)
    "dedup_repeated_ngrams",
    # ... and the scrub that REMOVES those duplicated spans, priced per
    # language with one covered-positions definition shared with the
    # library text rewriter
    "scrub_repeated_ngrams",
    # the 35 remaining r11-evidenced queries fit the window (the 15 in
    # _SLIPPED_TO_R14 wait one more round)
    "parquet_roundtrip", "json_roundtrip", "schema_evolution_roundtrip",
    "csv_roundtrip",
    "q8_nation_market_share", "q21_sole_late_supplier",
    "q22_rich_inactive_customers",
    "doc_fingerprint",
    "benchmark_contamination", "doc_bigram_novelty",
    "minhash_signatures", "minhash_lsh_pairs", "neardup_incremental",
    "neardup_incremental_simhash", "simhash_near_pairs", "neardup_clusters",
    "dedup_fuzzy_prefix",
    "knn_bruteforce", "ann_lsh_topk", "ivf_centroids", "ivf_topk",
    "ivf_index_build", "ivf_topk_pruned", "sq8_topk", "sq8_recall_at_10",
    "ivf_recall_at_10", "dedup_embedding_cosine", "ann_recall_at_10",
    "ivf_kmeans_recall_nprobe4",
    "image_decode_stats", "media_feature_extract", "image_resize_thumbnail",
    "stratified_sample",
    "pack_sequence_spans", "packed_span_fill",
]
_CHANGED_THIS_ROUND_R13: list = [
    # No registered query's RESULT-DEFINING path changed this round: the
    # engine-side generalizations and the oracle-side refactor below were
    # each verified result-neutral (optimized-plan-identical or oracle-
    # string byte-identical) -- the audit trail is in the transit notes.
]
# Out-of-window transits, documented (all 50 slots are claimed above):
# 1. kmeans_ivf_serving_view / build_kmeans_ivf_upsert /
#    compact_kmeans_ivf_segments gained the enumerated per-drop segment
#    parameters (drop=(i,n) / n_drops -- round-12 verdict "What's missing
#    #2"); at the defaults the artifact tokens and builds are unchanged,
#    and the r12-evidenced consumers ivf_kmeans_topk_upserted +
#    ivf_kmeans_recall_upserted were verified OPTIMIZED-PLAN-IDENTICAL
#    (normalized expression + lambda-variable ids) against the pre-change
#    module. The parameterized path debuts in-window
#    (ivf_kmeans_topk_upserted2).
# 2. The curation oracle chain was parameterized for the second-drop
#    replay (_curation_pass_ctes(sfx, baseh_rel, cband_where) +
#    _merged_hash_cte + _report_select): CURATION_DROP_REPORT_SQL,
#    CORPUS_HASH_MERGE_SQL, CORPUS_SIGNATURE_MERGE_SQL and
#    CORPUS_FINGERPRINT_MERGE_SQL asserted BYTE-IDENTICAL to the
#    pre-refactor module (all four r12-evidenced); the parameterized
#    second pass debuts in-window (curation_second_drop_report).
# 3. Round-13 infra closures (fsio.py / artifacts.py /
#    operators/scale_utils.py -- the layer BELOW every registered plan;
#    result-neutral, re-certified by the full-registry --repeat run on
#    final HEAD): _not_found widens absence classification (superclass
#    walk + RemoteException className/message) and guards its getMessage
#    fallback; the squatter heal renames aside and restores a caught
#    concurrent publish instead of recursive-deleting in place;
#    write_bucketed's managed-arm heal is scoped to the
#    LOCATION_ALREADY_EXISTS retry path (the registered
#    bucketed_segment_revenue uses the external arm and is r12-green).
# 4. streaming/curation.py gained fold_state plus strict partition-name
#    parsing -- library surface (not registered), pinned by its own suite.

_PRIORITY = _STALE_AFTER_R12 + _CHANGED_THIS_ROUND_R13

# direct indexing: a misspelled rotation name must fail AT IMPORT (the
# `if n in _ALL` guard silently dropped the typo'd query from its window
# slot while the length assert still passed — round-12 infra audit)
QUERIES: dict = {n: _ALL[n] for n in _PRIORITY}
QUERIES.update({n: v for n, v in _ALL.items() if n not in QUERIES})
assert len(QUERIES) == len(_ALL)
