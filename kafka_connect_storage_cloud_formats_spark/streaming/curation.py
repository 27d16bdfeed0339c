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

from kafka_connect_storage_cloud_formats_spark.functions.text_functions import (
    hash_family,
)
from kafka_connect_storage_cloud_formats_spark.operators.dedup import (
    CURATION_STAGES,
    MINHASH_K,
    _band_rows,
    _banded_drop_sets,
    _disposition_from_drop_sets,
    _exact_drop_sets,
    _minhash_sigs_from,
)

_HASH_SCHEMA = "doc_id long, lang string, content_hash binary"


def _sig_schema(family: str) -> str:
    """The signature-row schema is FAMILY-DEPENDENT (md5 → hex-string
    components, xxhash64 → 32-bit-half longs — the same reason
    _ensure_minhash_sigs keys its artifact params on the family)."""
    t = "string" if family == "md5" else "long"
    return "doc_id long, " + ", ".join(f"mh_{k:02d} {t}" for k in range(MINHASH_K))


# report contract: batch id + lang + total + one count per chain stage
# (the stage names ARE operators.dedup.CURATION_STAGES — one definition)
REPORT_COLUMNS = ("batch_id", "lang", "n_batch") + tuple(
    f"n_{s}" for s in CURATION_STAGES
)
_REPORT_SCHEMA = "batch_id long, lang string, n_batch long, " + ", ".join(
    f"n_{s} long" for s in CURATION_STAGES
)


class StreamingCuration:
    """The ``foreachBatch`` callback object. ``state_dir`` holds the
    accepted-state partitions and the report log; pass
    ``process_batch`` to ``foreachBatch``.

    The state namespace is FAMILY-KEYED (``state_dir/<family>/...``):
    the near-dup decisions and the signature row types are
    hash-family-dependent, so a job resumed under a different
    ``SPARK_GRAFT_HASH_FAMILY`` must see a fresh namespace, never a
    blend of incompatible decisions (the same never-share rule as the
    batch tiers' family-keyed artifact params). Long-running jobs fold
    their many small per-batch partitions into one generation on the
    re-index/merge schedule, exactly the batch tiers' merged-generation
    posture; each per-batch commit is coalesced to one file per kind."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.family = hash_family()
        self.state_dir = os.path.join(state_dir, self.family)

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
        # committed ⇔ _SUCCESS present: Spark writes the marker LAST, and
        # a replay's overwrite deletes it FIRST — so a partition caught
        # mid-rewrite (crash or concurrent reader) counts as uncommitted
        # instead of serving a half-written directory (round-12 third
        # review; the checkpoint guarantees the replay that completes it).
        return sorted(
            os.path.join(root, name)
            for name, _ in names
            if (before is None or int(name[1:]) < before)
            and fs.exists(os.path.join(root, name, "_SUCCESS"))
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
        return self._accepted("accepted_sigs", _sig_schema(self.family), before)

    def report(self) -> DataFrame:
        parts = self._state_parts("report")
        if not parts:
            return self.spark.createDataFrame([], _REPORT_SCHEMA)
        return self.spark.read.schema(_REPORT_SCHEMA).parquet(*parts)

    # ---- the drop --------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Classify one micro-batch (columns: doc_id, text, lang) against
        the accepted state, commit the per-language report and the
        accepted docs' hash + signature rows — all deterministic
        overwrites keyed by ``batch_id``."""
        batch_df = batch_df.localCheckpoint(eager=True)  # cut the stream lineage
        # the sha2 and shingle+minhash chains are each evaluated ONCE per
        # batch (they feed the classification AND the state commits)
        hashes = batch_df.select(
            "doc_id", "lang", F.unhex(F.sha2(F.col("text"), 256)).alias("content_hash")
        ).localCheckpoint(eager=True)
        sigs = _minhash_sigs_from(batch_df).localCheckpoint(eager=True)
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
        disp = _disposition_from_drop_sets(
            hashes.select("doc_id", "lang"),
            exact_corpus,
            exact_within,
            nd_corpus,
            nd_within,
        ).localCheckpoint(eager=True)  # one evaluation feeds report + both commits
        counts = [
            F.sum((F.col("stage") == s).cast("long")).alias(f"n_{s}")
            for s in CURATION_STAGES
        ]
        report = (
            disp.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_batch"), *counts)
            .select(F.lit(batch_id).cast("long").alias("batch_id"), *REPORT_COLUMNS[1:])
        )
        kept = disp.filter(F.col("stage") == "kept").select("doc_id")
        part = f"b{batch_id:010d}"
        # one file per kind per batch: the outputs are batch-sized, and an
        # uncoalesced write would leave shuffle-partition-many tiny files
        # per micro-batch (round-12 third review)
        report.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "report", part)
        )
        hashes.join(kept, "doc_id", "left_semi").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.state_dir, "accepted_hashes", part))
        sigs.join(kept, "doc_id", "left_semi").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.state_dir, "accepted_sigs", part))


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
