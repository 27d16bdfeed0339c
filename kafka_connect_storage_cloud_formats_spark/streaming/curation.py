"""Streaming curation: each micro-batch of crawled documents IS a drop.

The Structured-Streaming form of the recurring curation pipeline the batch
operators implement (operators/dedup.py): per micro-batch, the chained
exact → near-dup classification runs against the job's OWN corpus state —
the content-hash and MinHash-signature tables of everything it has
ACCEPTED so far — then the accepted docs' hashes and signatures fold into
that state and a per-batch report row appends to a log. The drop rules are
the batch operators' own shared primitives (``_exact_drop_sets``,
``_banded_drop_sets``, ``_minhash_sigs_from``/``_band_rows``): the stream
is COMPOSITION of one-definition rules, never a re-implementation that
could drift from the oracle-gated batch tiers.

Exactly-once posture (the engine's standing doctrine): ``foreachBatch`` is
at-least-once under retry, so every write is DETERMINISTIC-OVERWRITE keyed
by ``batch_id`` — state partition ``accepted/b{batch_id:010d}`` and report
partition ``report/b{batch_id:010d}`` are rewritten byte-identically on a
replay. Determinism requires that a replayed batch CLASSIFIES against
exactly the state its first run saw, so the corpus view inside
``process_batch`` reads only partitions with id < batch_id — never the
batch's own previously-committed partition (caught by the retry test: a
bare ``b*`` glob fed the batch its own accepted docs back as corpus on
replay and flipped them to exact_corpus). Retries, out-of-order replays
and full re-runs over the same checkpoint are all no-ops (pinned in
tests/test_streaming_curation.py).

At 100 TB this is the shape of a continuous ingestion pipeline: corpus
state is ~(50 + 100) B/doc of hash + signature rows (never document
text), each micro-batch pays batch-sized hashing plus banded equi-joins
against that state, and the state grows only by accepted content — the
same artifact posture as the batch tiers' published merged generations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_formats_spark.operators.dedup import (
    MINHASH_K,
    _band_rows,
    _banded_drop_sets,
    _exact_drop_sets,
    _minhash_sigs_from,
)

_HASH_SCHEMA = "doc_id long, lang string, content_hash binary"
_SIG_SCHEMA = "doc_id long, " + ", ".join(f"mh_{k:02d} string" for k in range(MINHASH_K))
REPORT_COLUMNS = (
    "batch_id",
    "lang",
    "n_batch",
    "n_exact_corpus",
    "n_exact_within",
    "n_neardup_corpus",
    "n_neardup_within",
    "n_kept",
)


class StreamingCuration:
    """The ``foreachBatch`` callback object. ``state_dir`` holds the
    accepted-state partitions and the report log; pass
    ``process_batch`` to ``foreachBatch``."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir

    # ---- state access ----------------------------------------------------
    def _state_parts(self, kind: str, before: int | None = None) -> list[str]:
        """Committed partition paths of ``kind``, optionally restricted to
        batch ids < ``before`` (the corpus view a replaying batch must
        see). A failed LISTING raises — absence-as-empty is only safe when
        the listing itself succeeded (the fsio glob contract)."""
        from kafka_connect_storage_cloud_formats_spark.fsio import _fs_for

        root = os.path.join(self.state_dir, kind)
        fs = _fs_for(root, self.spark)
        names = fs.glob_names_mtimes(os.path.join(root, "b*"))
        if names is None:
            raise RuntimeError(
                f"curation state listing failed under {root}"
            ) from fs.last_error
        return sorted(
            os.path.join(root, name)
            for name, _ in names
            if before is None or int(name[1:]) < before
        )

    def _accepted(
        self, kind: str, schema: str, before: int | None = None
    ) -> DataFrame:
        """Union of committed batch partitions of ``kind``; an empty typed
        frame when none are committed (or none precede ``before``)."""
        parts = self._state_parts(kind, before)
        if not parts:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*parts)

    def accepted_hashes(self, before: int | None = None) -> DataFrame:
        return self._accepted("accepted_hashes", _HASH_SCHEMA, before)

    def accepted_sigs(self, before: int | None = None) -> DataFrame:
        return self._accepted("accepted_sigs", _SIG_SCHEMA, before)

    def report(self) -> DataFrame:
        parts = self._state_parts("report")
        schema = (
            "batch_id long, lang string, n_batch long, n_exact_corpus long, "
            "n_exact_within long, n_neardup_corpus long, n_neardup_within long, "
            "n_kept long"
        )
        if not parts:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*parts)

    # ---- the drop --------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Classify one micro-batch (columns: doc_id, text, lang) against
        the accepted state, commit the per-language report and the
        accepted docs' hash + signature rows — all deterministic
        overwrites keyed by ``batch_id``."""
        batch_df = batch_df.localCheckpoint(eager=True)  # cut the stream lineage
        hashes = batch_df.select(
            "doc_id", "lang", F.unhex(F.sha2(F.col("text"), 256)).alias("content_hash")
        )
        sigs = _minhash_sigs_from(batch_df)
        # corpus view = strictly-earlier batches (replay determinism: a
        # retried batch must never see its own prior commit as corpus)
        base_hashes = (
            self.accepted_hashes(before=batch_id).select("content_hash").distinct()
        )
        exact_corpus, exact_within = _exact_drop_sets(hashes, base_hashes)
        survivors = (
            hashes.select("doc_id")
            .join(exact_corpus, "doc_id", "left_anti")
            .join(exact_within, "doc_id", "left_anti")
        )
        batch_bands = _band_rows(sigs).join(survivors, "doc_id", "left_semi")
        corpus_bands = _band_rows(self.accepted_sigs(before=batch_id))
        nd_corpus, nd_within = _banded_drop_sets(batch_bands, corpus_bands)
        mark = lambda df, name: df.withColumn(name, F.lit(1))  # noqa: E731
        stage = (
            F.when(F.col("ec").isNotNull(), "exact_corpus")
            .when(F.col("ew").isNotNull(), "exact_within")
            .when(F.col("nc").isNotNull(), "neardup_corpus")
            .when(F.col("nw").isNotNull(), "neardup_within")
            .otherwise("kept")
        )
        disp = (
            hashes.select("doc_id", "lang")
            .join(mark(exact_corpus, "ec"), "doc_id", "left")
            .join(mark(exact_within, "ew"), "doc_id", "left")
            .join(mark(nd_corpus, "nc"), "doc_id", "left")
            .join(mark(nd_within, "nw"), "doc_id", "left")
            .select("doc_id", "lang", stage.alias("stage"))
            .localCheckpoint(eager=True)  # one evaluation feeds report + both commits
        )
        counts = [
            F.sum((F.col("stage") == s).cast("long")).alias(f"n_{s}")
            for s in (
                "exact_corpus",
                "exact_within",
                "neardup_corpus",
                "neardup_within",
                "kept",
            )
        ]
        report = (
            disp.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_batch"), *counts)
            .select(F.lit(batch_id).cast("long").alias("batch_id"), *REPORT_COLUMNS[1:])
        )
        kept = disp.filter(F.col("stage") == "kept").select("doc_id")
        part = f"b{batch_id:010d}"
        report.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "report", part)
        )
        hashes.join(kept, "doc_id", "left_semi").write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "accepted_hashes", part)
        )
        sigs.join(kept, "doc_id", "left_semi").write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "accepted_sigs", part)
        )


def run_curation_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
) -> StreamingCuration:
    """Run the curation job over all currently-available input (trigger
    availableNow — the batch-interval form of a continuous job) and
    return the state handle. Safe to re-run: the checkpoint skips
    committed batches, and replayed batches rewrite their partitions
    byte-identically."""
    cur = StreamingCuration(spark, state_dir)
    q = (
        docs_stream.writeStream.foreachBatch(cur.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return cur
