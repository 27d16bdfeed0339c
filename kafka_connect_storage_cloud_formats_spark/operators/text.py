"""Text-analysis operators over the ``documents`` table.

LLM-data-pipeline primitives (BASELINE.json north star): quality scoring,
language-ID, token counting, document fingerprinting. Everything is a
single-pass columnar expression (no shuffle except final ORDER BY, which
exists only for test determinism) — at 100 TB these run map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.catalog import load_table
from kafka_connect_storage_cloud_formats_spark.functions.text_functions import STOPWORDS, tokens, word_shingles
from kafka_connect_storage_cloud_formats_spark.operators.shingles import (
    ensure_ngram_occurrence_rows,
    ensure_shingle_rows,
)

# language marker words (deterministic heuristic; mirrored in oracle SQL).
# The corpus is synthetic word-soup, so these "markers" are arbitrary but the
# operator's mechanics (per-language token scoring + argmax) are real.
LANG_MARKERS = {
    "en": ("the", "fast", "order"),
    "es": ("data", "table", "row"),
    "de": ("join", "merge", "sort"),
    "fr": ("filter", "window", "stream"),
    "zh": ("spark", "batch", "vector"),
}


def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: token/char counts, mean token length,
    stopword ratio, distinct tokens and type-token ratio. (The composite
    quality score built on these lives in ``doc_quality_deciles``.)"""
    docs = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    stop = F.array([F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop, t)))
    n_chars = F.length("text")
    return (
        docs.select(
            "doc_id",
            "lang",
            n_tokens.alias("n_tokens"),
            n_chars.alias("n_chars"),
            ((n_chars - n_tokens + 1) / n_tokens.cast("double")).alias("avg_token_len"),
            (n_stop / n_tokens.cast("double")).alias("stopword_ratio"),
            F.size(F.array_distinct(w)).alias("n_distinct_tokens"),
            (F.size(F.array_distinct(w)) / n_tokens.cast("double")).alias("ttr"),
        )
        .orderBy("doc_id")
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id, lang,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS n_chars,
       (length(text) - len(string_split(text, ' ')) + 1)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
       len(list_filter(string_split(text, ' '),
           t -> t IN ('{"','".join(STOPWORDS)}')))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       len(list_distinct(string_split(text, ' ')))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
FROM documents
ORDER BY doc_id
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/marker-based language ID: per-language marker-token counts,
    argmax with deterministic tie-break (marker-count desc, language asc)."""
    docs = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    def marker_score(markers: tuple[str, ...]):
        # factory: a default-arg lambda would be mis-read as (element, index)
        return F.size(F.filter(w, lambda t: t.isin(*markers)))

    scores = [
        marker_score(markers).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", "lang", *scores)
    # argmax via greatest + case chain (deterministic tie-break by lang asc)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = None
    for lg in langs:
        cond = F.col(f"score_{lg}") == best
        pred = F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))
    return (
        scored.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            pred.alias("pred_lang"),
            *[F.col(f"score_{lg}") for lg in langs],
        )
        .orderBy("doc_id")
    )


def _lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = ",\n       ".join(
        f"""len(list_filter(string_split(text, ' '), t -> t IN ('{"','".join(LANG_MARKERS[lg])}'))) AS score_{lg}"""
        for lg in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {greatest} THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
       {score_exprs}
  FROM documents
)
SELECT doc_id, labeled_lang, {case} AS pred_lang,
       {", ".join(f"score_{lg}" for lg in langs)}
FROM scored
ORDER BY doc_id
"""


LANG_ID_SQL = _lang_id_sql()


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (letter runs / digit runs / single non-alnum), the standard pre-tokenizer
    shape used to estimate LLM token budgets."""
    docs = load_table(spark, sf_dir, "documents")
    pattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    return (
        docs.select(
            "doc_id",
            F.size(tokens("text")).alias("n_ws_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(pattern), 0)).alias("n_re_tokens"),
            (F.length("text") / F.lit(4.0)).alias("n_est_chars4"),
        )
        .orderBy("doc_id")
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_re_tokens,
       length(text) / 4.0 AS n_est_chars4
FROM documents
ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content hash (md5) + a min-hash
    fingerprint over word-5-gram shingles (winnowing-style: the minimum
    shingle hash is a stable content fingerprint robust to local edits)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles("text", 5)
    return (
        docs.select(
            "doc_id",
            F.md5("text").alias("content_md5"),
            F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("shingle_fp"),
        )
        .orderBy("doc_id")
    )


DOC_FINGERPRINT_SQL = """
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, md5(text) AS content_md5,
       list_min(list_transform(range(1, greatest(len(w) - 4, 0) + 1),
                i -> md5(array_to_string(list_slice(w, i, i + 4), ' ')))) AS shingle_fp
FROM d
ORDER BY doc_id
"""


# ---------------------------------------------------------- vocabulary stats
VOCAB_TOP_K = 100


def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 terms by document frequency (ties by
    term), with total term frequency. All-integer output → bit-exact at any
    parallelism. At 100 TB this is the canonical two-level aggregate: term
    counts are map-side partial; the shuffle carries (term, partial_df,
    partial_tf) — vocabulary size, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    per_doc = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf"))
        .orderBy(F.desc("df"), "term")
        .limit(VOCAB_TOP_K)
    )


VOCAB_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
per_doc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
FROM per_doc GROUP BY term
ORDER BY df DESC, term
LIMIT {VOCAB_TOP_K}
"""


def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dominant term: max tf, ties broken by lexicographically
    smallest term (deterministic). Argmax is a MIN over (−tf, term) structs —
    struct ordering is field-by-field, so the minimum is exactly (highest
    tf, then smallest term). Unlike a row_number window (which sorts every
    partition), a min-aggregate combines map-side: the shuffle carries one
    candidate struct per (doc, partition), not the full term list."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    per_doc = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    best = F.min(F.struct((-F.col("tf")).alias("neg_tf"), F.col("term").alias("term")))
    return (
        per_doc.groupBy("doc_id")
        .agg(best.alias("best"))
        .select("doc_id", F.col("best.term").alias("top_term"), (-F.col("best.neg_tf")).alias("tf"))
        .orderBy("doc_id")
    )


DOC_TOP_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
per_doc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
ranked AS (
  SELECT doc_id, term, tf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rn
  FROM per_doc)
SELECT doc_id, term AS top_term, tf FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


# ------------------------------------------------------------ PII-style scrub
def scrub_numeric_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass of a data-cleaning pipeline: digit runs in the events
    payload replaced by a placeholder, with per-type redaction accounting.
    regexp_replace/regexp_count on the pattern ``[0-9]+`` behave identically
    in Java regex and RE2, so the scrub itself is oracle-checkable (the md5
    of every scrubbed payload participates in the hash)."""
    ev = load_table(spark, sf_dir, "events")
    scrubbed = ev.select(
        "event_type",
        F.regexp_count(F.col("props"), F.lit("[0-9]+")).alias("n_redacted"),
        F.md5(F.regexp_replace("props", "[0-9]+", "<NUM>")).alias("scrub_md5"),
    )
    return (
        scrubbed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_redacted").alias("total_redactions"),
            F.countDistinct("scrub_md5").alias("n_distinct_scrubbed"),
        )
        .orderBy("event_type")
    )


SCRUB_SQL = """
WITH s AS (
  SELECT event_type,
         length(regexp_replace(props, '[0-9]+', 'X', 'g')) - length(regexp_replace(props, '[0-9]+', '', 'g')) AS n_redacted,
         md5(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS scrub_md5
  FROM events)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(n_redacted) AS BIGINT) AS total_redactions,
       COUNT(DISTINCT scrub_md5) AS n_distinct_scrubbed
FROM s GROUP BY event_type ORDER BY event_type
"""


# -------------------------------------------------------- array function pack
def array_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar library over tokenized documents (size, distinct,
    contains, position, sort, slice) — scalar outputs only so both engines
    hash identically; the reference has no array functions at all
    (SURVEY.md §2.3)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sorted_toks = F.array_sort(toks)
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.array_contains(toks, "the").cast("int").alias("has_the"),
            F.coalesce(F.array_position(toks, "data").cast("long"), F.lit(0)).alias(
                "pos_data"
            ),
            F.element_at(sorted_toks, 1).alias("first_sorted"),
            F.element_at(sorted_toks, -1).alias("last_sorted"),
            F.array_join(F.slice(toks, 1, 3), "|").alias("head3"),
        )
        .orderBy("doc_id")
    )


ARRAY_GALLERY_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       CAST(list_contains(toks, 'the') AS INT) AS has_the,
       CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT) AS pos_data,
       list_sort(toks)[1] AS first_sorted,
       list_sort(toks)[-1] AS last_sorted,
       array_to_string(toks[1:3], '|') AS head3
FROM t ORDER BY doc_id
"""


# ------------------------------------------------------ quality-score deciles
def doc_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile binning of a composite quality score (ttr × (1 − stopword
    ratio)) — the curriculum/filter-threshold step of a training pipeline.

    Scale shape: decile BOUNDARIES come from one global ``percentile_disc``
    aggregate (9 actual data values — no interpolation, so both engines
    agree exactly), folded back as a broadcast 1-row cross-join; bucket
    assignment is then a map-only comparison chain. No global sort, no
    single-partition window (ntile would funnel the corpus through one
    task). At 100 TB the exact percentile aggregate would be swapped for
    ``approx_percentile`` boundaries with the same downstream plan."""
    docs = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    stop = F.array([F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop, t)))
    ttr = F.size(F.array_distinct(w)) / n_tokens.cast("double")
    score = (ttr * (1 - n_stop / n_tokens.cast("double"))).alias("score")
    scored = docs.select("doc_id", score)
    bounds = scored.agg(
        *[
            F.expr(f"percentile_disc(0.{d}) WITHIN GROUP (ORDER BY score)").alias(f"b{d}")
            for d in range(1, 10)
        ]
    )
    decile = F.lit(1)
    for d in range(1, 10):
        decile = decile + (F.col("score") > F.col(f"b{d}")).cast("int")
    return (
        scored.crossJoin(F.broadcast(bounds))
        .select("doc_id", "score", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("decile")
    )


def _quality_deciles_sql() -> str:
    stop_list = "','".join(STOPWORDS)
    score = f"""(len(list_distinct(string_split(text, ' ')))
      / CAST(len(string_split(text, ' ')) AS DOUBLE))
    * (1 - len(list_filter(string_split(text, ' '), t -> t IN ('{stop_list}')))
      / CAST(len(string_split(text, ' ')) AS DOUBLE))"""
    bounds = ", ".join(f"quantile_disc(score, 0.{d}) AS b{d}" for d in range(1, 10))
    bucket = " + ".join(f"CASE WHEN score > b{d} THEN 1 ELSE 0 END" for d in range(1, 10))
    return f"""
WITH scored AS (SELECT doc_id, {score} AS score FROM documents),
bounds AS (SELECT {bounds} FROM scored),
bucketed AS (
  SELECT doc_id, score, 1 + ({bucket}) AS decile FROM scored, bounds)
SELECT decile, COUNT(*) AS n_docs, MIN(score) AS min_score,
       MAX(score) AS max_score, MIN(doc_id) AS first_doc
FROM bucketed GROUP BY decile ORDER BY decile
"""


DOC_QUALITY_DECILES_SQL = _quality_deciles_sql()


# ------------------------------------------------- benchmark contamination
CONTAMINATION_SHINGLE_N = 5
BENCHMARK_SOURCE = "src0"  # held-out set: the synthetic corpus's src0 slice


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: corpus documents sharing ≥1 word
    5-gram with the held-out benchmark slice (source = src0), with shared-
    shingle and benchmark-doc counts — the decontamination step every
    training pipeline runs before an eval.

    Scale shape: distinct (doc, shingle) rows on both sides, equi-join on
    the shingle key (benchmark side is the small side — AQE broadcasts it),
    then a count aggregate per corpus doc. The corpus text never rides the
    join — only shingle strings (at 100 TB: xxhash64 of the shingle)."""
    # The corpus-scale shingle derivation comes from the content-keyed
    # parquet artifact (operators/shingles.py, n=5 — a separate params key
    # from Jaccard's n=3): the benchmark and corpus sides both scan the
    # file source instead of each re-running tokenize+explode, and unlike
    # the round-5 ``localCheckpoint`` an executor loss is ordinary task
    # retry, not a failed job.
    sh = ensure_shingle_rows(spark, sf_dir, CONTAMINATION_SHINGLE_N)
    # no .distinct(): the artifact is already one row per (doc_id, s) —
    # word_shingles emits a per-document array_distinct array — so a
    # distinct here re-shuffled an already-unique stream per execution
    # for nothing (round-9 review; the corpus side below always relied
    # on exactly this property)
    bench = sh.filter(F.col("source") == BENCHMARK_SOURCE).select(
        F.col("doc_id").alias("bench_doc"), "s"
    )
    corpus = sh.filter(F.col("source") != BENCHMARK_SOURCE).select("doc_id", "s")
    return (
        corpus.join(bench, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
        .orderBy(F.desc("n_shared_shingles"), "doc_id")
    )


BENCHMARK_CONTAMINATION_SQL = f"""
WITH docs AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, source, s FROM (
  SELECT doc_id, source,
         array_to_string(list_slice(w, i, i + {CONTAMINATION_SHINGLE_N - 1}), ' ') AS s
  FROM docs, unnest(range(1, greatest(len(w) - {CONTAMINATION_SHINGLE_N - 1}, 0) + 1)) AS t(i)) q),
bench AS (SELECT doc_id AS bench_doc, s FROM sh WHERE source = '{BENCHMARK_SOURCE}'),
corpus AS (SELECT doc_id, s FROM sh WHERE source <> '{BENCHMARK_SOURCE}')
SELECT corpus.doc_id AS doc_id, COUNT(DISTINCT corpus.s) AS n_shared_shingles,
       COUNT(DISTINCT bench_doc) AS n_bench_docs
FROM corpus JOIN bench ON corpus.s = bench.s
GROUP BY corpus.doc_id
ORDER BY n_shared_shingles DESC, doc_id
"""


def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECONTAMINATION step the contamination report prices: drop
    every corpus doc sharing ≥1 word 5-gram with the held-out benchmark
    slice (the GPT-3 appendix-C posture — any n-gram overlap removes the
    doc) and report the per-language cost: corpus docs, contaminated,
    kept, and kept token mass. Completes the report→scrub pair the dedup
    family already has (``curation_drop_report`` prices what
    ``dedup_*`` would remove; this prices ``benchmark_contamination``'s
    hits).

    Scale shape: the contaminated-doc set is a LEFT SEMI join of the
    corpus shingle stream against the (small) benchmark shingle side on
    the shingle key — same join as the report row, but semi (ids only,
    no per-pair counts) — then a distinct doc set and a LEFT ANTI-shaped
    flag join back to documents at doc granularity. Shingles come from
    the shared content-keyed n=5 artifact (one derivation amortized with
    the report row); the corpus text is scanned exactly once, for the
    kept-token sum."""
    sh = ensure_shingle_rows(spark, sf_dir, CONTAMINATION_SHINGLE_N)
    bench = sh.filter(F.col("source") == BENCHMARK_SOURCE).select("s")
    contaminated = (
        sh.filter(F.col("source") != BENCHMARK_SOURCE)
        .select("doc_id", "s")
        .join(bench, "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source") != BENCHMARK_SOURCE)
        .select("doc_id", "lang", F.size(tokens("text")).alias("n_toks"))
    )
    return (
        docs.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_corpus_docs"),
            F.sum(F.when(F.col("is_cont") == 1, 1).otherwise(0)).alias(
                "n_contaminated"
            ),
            F.sum(F.when(F.col("is_cont").isNull(), 1).otherwise(0)).alias("n_kept"),
            F.sum(
                F.when(F.col("is_cont").isNull(), F.col("n_toks")).otherwise(F.lit(0))
            ).alias("kept_tokens"),
        )
        .orderBy("lang")
    )


BENCHMARK_DECONTAMINATE_SQL = f"""
WITH docs AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, source, s FROM (
  SELECT doc_id, source,
         array_to_string(list_slice(w, i, i + {CONTAMINATION_SHINGLE_N - 1}), ' ') AS s
  FROM docs, unnest(range(1, greatest(len(w) - {CONTAMINATION_SHINGLE_N - 1}, 0) + 1)) AS t(i)) q),
contaminated AS (
  SELECT DISTINCT doc_id FROM sh
  WHERE source <> '{BENCHMARK_SOURCE}'
    AND s IN (SELECT s FROM sh WHERE source = '{BENCHMARK_SOURCE}')),
corpus AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks
  FROM documents WHERE source <> '{BENCHMARK_SOURCE}')
SELECT lang,
       COUNT(*) AS n_corpus_docs,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
FROM corpus LEFT JOIN contaminated c USING (doc_id)
GROUP BY lang ORDER BY lang
"""


BIGRAM_N = 2


def doc_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty profile against corpus statistics — the
    language-model-flavored quality signal of a curation pipeline: a doc
    whose bigrams are all corpus-frequent is boilerplate; one with many
    frequency-1 bigrams is novel text. Emits integer-only columns
    (n_bigrams, sum_freq of each bigram's corpus occurrence count,
    min_freq, n_rare = bigrams occurring nowhere else) so the result is
    hash-exact on any engine.

    Scale shape: one tokenize pass → corpus bigram frequency aggregate
    (map-side partial, shuffle carries bigram keys — xxhash64 them at
    100 TB) → equi-join of the doc-bigram stream with the frequency table
    → per-doc aggregate. No self-join, no candidate explosion: cost is
    O(tokens) + two key shuffles. The occurrence stream comes from the
    content-keyed parquet artifact (operators/shingles.py — the multiset
    ``ngram_occ`` kind, distinct from the set-semantics shingle stream):
    the frequency aggregate and the join side scan the file source, and
    an executor loss is ordinary task retry rather than the failed job a
    round-5 ``localCheckpoint`` block loss meant. The short-doc sequence
    guard lives in the shared builder (``ngram_occurrence_stream``)."""
    bg = ensure_ngram_occurrence_rows(spark, sf_dir, BIGRAM_N).select(
        "doc_id", F.col("ng").alias("bg")
    )
    # Round 16 examined a shared-bg-exchange rewrite here (repartition(bg)
    # feeding a (bg, doc_id) pre-aggregate + the frequency rollup + the
    # join, the q21 pattern) and REVERTED it on measurement: locally the
    # freq table broadcasts (BHJ — the occurrence stream never shuffles at
    # all), so the explicit repartition added a full raw-occurrence
    # exchange for nothing — interleaved A/B read 1.36× (controls
    # 0.90-0.96×). The broadcast degrades gracefully at scale too: AQE
    # falls back to a shuffle join only when freq outgrows the threshold,
    # which is exactly when the extra exchange would have paid for itself.
    freq = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("freq"))
    return (
        bg.join(freq, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("freq").alias("sum_freq"),
            F.min("freq").alias("min_freq"),
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias("n_rare"),
        )
        .orderBy("doc_id")
    )


DOC_BIGRAM_NOVELTY_SQL = f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + {BIGRAM_N - 1}), ' ') AS bg
  FROM docs, unnest(range(1, greatest(len(w) - {BIGRAM_N - 1}, 0) + 1)) AS t(i)),
freq AS (SELECT bg, COUNT(*) AS freq FROM bg GROUP BY bg)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(freq) AS BIGINT) AS sum_freq,
       CAST(MIN(freq) AS BIGINT) AS min_freq,
       CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
FROM bg JOIN freq USING (bg)
GROUP BY doc_id
ORDER BY doc_id
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 repetition filters): per doc, the share of bigram occurrences
    claimed by the single most frequent bigram (``top_bigram_frac``) and
    the share sitting in any bigram that repeats within the doc
    (``dup_bigram_frac``). A doc whose text loops boilerplate lights up
    both; the Gopher rules drop docs past fixed thresholds — this row
    publishes the raw signals so the threshold stays a deployment dial
    (same posture as ``doc_quality_deciles``). Fractions are emitted as
    exact integer pairs' quotients (BIGINT/BIGINT → DOUBLE, both engines'
    native semantics) so the hash gate is bit-stable.

    Scale shape: REUSES the content-keyed bigram occurrence artifact
    (``ngram_occ`` n=2 — already built for ``doc_bigram_novelty``; one
    corpus tokenize pass amortized across both rows), then two map-side-
    combinable aggregates over progressively coarser keys ((doc_id, ng) →
    doc_id) and one equi-join to attach ``lang``. Unlike the novelty row
    there is no corpus-frequency join: every aggregate is doc-local, so
    the heavy (doc_id, ng) shuffle key can be dictionary-compressed by
    doc_id co-location and the whole plan is two exchanges. Docs shorter
    than one bigram emit no occurrence rows and are absent here, exactly
    as in the novelty row (the shared builder's sequence guard)."""
    bg = ensure_ngram_occurrence_rows(spark, sf_dir, BIGRAM_N)
    per_gram = bg.groupBy("doc_id", "ng").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigram_occ"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("c").alias("top_bigram_count"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
            "dup_bigram_occ"
        ),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        per_doc.join(docs, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_bigram_occ",
            "n_distinct_bigrams",
            "top_bigram_count",
            (
                F.col("top_bigram_count") / F.col("n_bigram_occ").cast("double")
            ).alias("top_bigram_frac"),
            "dup_bigram_occ",
            (
                F.col("dup_bigram_occ") / F.col("n_bigram_occ").cast("double")
            ).alias("dup_bigram_frac"),
        )
        .orderBy("doc_id")
    )


DOC_REPETITION_SQL = f"""
WITH docs AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + {BIGRAM_N - 1}), ' ') AS ng
  FROM docs, unnest(range(1, greatest(len(w) - {BIGRAM_N - 1}, 0) + 1)) AS t(i)),
per_gram AS (SELECT doc_id, ng, COUNT(*) AS c FROM bg GROUP BY doc_id, ng),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_bigram_occ,
         COUNT(*) AS n_distinct_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_count,
         CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_bigram_occ
  FROM per_gram GROUP BY doc_id)
SELECT p.doc_id, d.lang, p.n_bigram_occ, p.n_distinct_bigrams,
       p.top_bigram_count,
       p.top_bigram_count / CAST(p.n_bigram_occ AS DOUBLE) AS top_bigram_frac,
       p.dup_bigram_occ,
       p.dup_bigram_occ / CAST(p.n_bigram_occ AS DOUBLE) AS dup_bigram_frac
FROM per_doc p JOIN docs d ON d.doc_id = p.doc_id
ORDER BY p.doc_id
"""


TEXT_QUERIES = {
    "array_function_gallery": (array_function_gallery, ARRAY_GALLERY_SQL),
    "scrub_numeric_tokens": (scrub_numeric_tokens, SCRUB_SQL),
    "vocab_stats": (vocab_stats, VOCAB_STATS_SQL),
    "doc_top_terms": (doc_top_terms, DOC_TOP_TERMS_SQL),
    "text_quality_stats": (text_quality_stats, TEXT_QUALITY_SQL),
    "lang_id_heuristic": (lang_id_heuristic, LANG_ID_SQL),
    "token_count_bpe": (token_count_bpe, TOKEN_COUNT_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "doc_quality_deciles": (doc_quality_deciles, DOC_QUALITY_DECILES_SQL),
    "benchmark_contamination": (benchmark_contamination, BENCHMARK_CONTAMINATION_SQL),
    "benchmark_decontaminate": (benchmark_decontaminate, BENCHMARK_DECONTAMINATE_SQL),
    "doc_bigram_novelty": (doc_bigram_novelty, DOC_BIGRAM_NOVELTY_SQL),
    "doc_repetition_stats": (doc_repetition_stats, DOC_REPETITION_SQL),
}
