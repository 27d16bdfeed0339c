"""The ingest pipeline: envelope source → typed value columns → ORC files.

This is the reference's entire production path (SURVEY.md §3.1):

    Kafka poll → SinkRecord batch → schema capture → vectorized fill →
    partitioned, offset-named ORC file + commit

re-expressed as one declarative Spark plan. The schema-capture /
vector-fill / file-commit machinery (reference ``OrcRecordWriter.java``)
is Spark's ORC datasource; what remains ours is the *semantics*: which
columns land in the file, how files are partitioned, named and rotated,
and idempotence across retries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kafka_connect_storage_cloud_formats_spark.schema import validate_engine_schema
from kafka_connect_storage_cloud_formats_spark.sinks.orc_sink import (
    read_orc,
    write_orc_parity,
    write_orc_partitioned,
)

ENVELOPE_COLS = ("key", "topic", "partition", "offset")


@dataclass
class IngestPipeline:
    """Config-object equivalent of the reference's connector config
    (``S3SinkConnectorConfig``): flush size, output dir, value schema.

    ``parity_naming=True`` reproduces the reference's offset-named one-file-
    per-flush layout (SURVEY.md §2.1 #13-15); ``False`` uses the idiomatic
    Spark layout (Hive-style ``partition=N/`` dirs + ``maxRecordsPerFile``),
    which is what a 100 TB deployment should run.
    """

    out_dir: str
    value_schema: T.StructType
    flush_size: int = 10_000
    topics_prefix: str = "topics"
    parity_naming: bool = False
    partition_cols: tuple[str, ...] = field(default=("partition",))

    def __post_init__(self) -> None:
        validate_engine_schema(self.value_schema)

    def run_batch(self, records: DataFrame) -> list[str] | None:
        """Process one batch of enveloped records (the reference's
        ``S3SinkTask.put``). Returns written file keys in parity mode."""
        # ONE cast projection (coerce_stream) serves batch and streaming —
        # an inline copy here could drift (round-9 review); __post_init__
        # already validated the schema (dataclass mutation is unsupported).
        value_names = [f.name for f in self.value_schema.fields]
        coerced = coerce_stream(records, self.value_schema)
        if self.parity_naming:
            enveloped = coerced.select(
                *[c for c in ENVELOPE_COLS if c in records.columns], *value_names
            )
            return write_orc_parity(
                enveloped,
                self.out_dir,
                flush_size=self.flush_size,
                topics_prefix=self.topics_prefix,
                value_cols=[f.name for f in self.value_schema.fields],
            )
        keep = [c for c in self.partition_cols if c in records.columns]
        df = coerced.select(*keep, *value_names)
        # Per-poll semantics without data loss: a bare mode="overwrite" at
        # out_dir would TRUNCATE every earlier batch on the second put().
        # Instead each batch lands in a deterministic batch=<id> subdir
        # (id = hash of the batch's per-(topic,partition) offset ranges —
        # Kafka batch identity) and overwrites only itself: re-running the
        # same batch is idempotent (the reference's deterministic-name
        # recovery, directory-granular), successive batches accumulate.
        # Costs one metadata-scale agg job per batch.
        #
        # DETERMINISTIC-INPUT REQUIREMENT: the tag aggregation evaluates
        # `records` once here and the write evaluates it again below. A
        # non-deterministic input plan (sampling, rand()-stamped ids)
        # could tag one materialization and write another, landing a
        # replay under a different batch=<id> (duplicates instead of an
        # idempotent overwrite). Kafka-envelope batches are deterministic
        # (offsets are data); a caller feeding a non-deterministic plan
        # must localCheckpoint/persist it before put().
        if "offset" not in records.columns:
            # Without offsets there is no batch identity: the overwrite
            # would land at out_dir itself and TRUNCATE every earlier
            # batch's batch=<id> subdir on the second put() — silent data
            # loss (round-9 review). run_batch's input contract is the
            # Kafka envelope; a plain one-shot write wants
            # write_orc_partitioned directly.
            raise ValueError(
                "run_batch requires enveloped records (an 'offset' column "
                "— with_kafka_envelope); for a plain one-shot write use "
                "sinks.orc_sink.write_orc_partitioned"
            )
        import hashlib

        from pyspark.sql import functions as F

        # The tag aggregation and the write are TWO actions over `records`:
        # unpersisted, the input plan (typically the envelope source with
        # its per-partition offset window) executes twice per put(). Persist
        # for exactly the span of the two actions — the tag agg populates
        # the cache while it scans, the write reads from it (r15
        # optimization, guide §1.6/§5.2: don't recompute a subtree two
        # actions share). MEMORY_AND_DISK (the default) spills rather than
        # OOMs on an oversized batch; this also hardens the deterministic-
        # input requirement above — both actions now see ONE
        # materialization by construction.
        records = records.persist()
        try:
            id_cols = [c for c in ("topic", "partition") if c in records.columns]
            ranges = (
                records.groupBy(*id_cols)
                .agg(F.min("offset"), F.max("offset"), F.count(F.lit(1)))
                .collect()
            )
            tag = hashlib.md5(
                repr(sorted(tuple(r) for r in ranges)).encode()
            ).hexdigest()[:12]
            batch_dir = f"{self.out_dir}/batch={tag}"
            write_orc_partitioned(
                df,
                batch_dir,
                partition_cols=tuple(keep),
                max_records_per_file=self.flush_size,
            )
        finally:
            records.unpersist()
        return None

    def run_stream(self, records: DataFrame, checkpoint: str):
        """Streaming variant: exactly-once via checkpoint + file-sink commit
        log (``_spark_metadata``) — the Spark-native replacement for the
        reference's deterministic-name-overwrite recovery
        (``DataWriterOrcTest.java:102-124``)."""
        if self.parity_naming:
            # The file-sink streaming path cannot produce the reference's
            # offset-named one-file-per-flush layout (that finalize is a
            # batch rename pass); silently writing the Hive layout under a
            # parity config would hand the caller a different on-disk
            # contract per entry point (round-9 review). foreachBatch +
            # run_batch per micro-batch is the parity streaming shape.
            raise NotImplementedError(
                "parity_naming on the streaming path: drive run_batch from "
                "foreachBatch; the file-sink path writes the Spark-native "
                "layout only"
            )
        value_names = [f.name for f in self.value_schema.fields]
        keep = [c for c in self.partition_cols if c in records.columns]
        df = coerce_stream(records, self.value_schema).select(*keep, *value_names)
        writer = (
            df.writeStream.format("orc")
            .option("path", self.out_dir)
            .option("checkpointLocation", checkpoint)
            # honor the count-based rotation config on this entry point too
            .option("maxRecordsPerFile", self.flush_size)
            .trigger(availableNow=True)
        )
        if keep:
            writer = writer.partitionBy(*keep)
        return writer.start()

    def read_back(self, spark: SparkSession) -> DataFrame:
        """Read-back operator over everything the pipeline wrote."""
        if self.parity_naming:
            # pathGlobFilter (not a /*.orc glob) keeps the file-sink metadata
            # probe from logging a spurious FileNotFoundException
            return (
                spark.read.format("orc")
                .option("pathGlobFilter", "*.orc")
                .option("recursiveFileLookup", "false")
                .load(self.out_dir)
            )
        back = read_orc(spark, self.out_dir)
        # batch=<id> is write-layout bookkeeping, not data (discovered as a
        # partition column when enveloped batches were written)
        return back.drop("batch") if "batch" in back.columns else back


class EvolvingIngest:
    """Schema-evolution-aware ingest: batches may arrive with different
    (compatible) schemas; each schema *upgrade* rotates to a new generation
    directory, and older-shaped batches are projected onto the current
    schema (Connect's StorageSchemaCompatibility + SchemaProjector behavior
    — see schema_evolution.py). ``read_back`` merges all generations.
    """

    def __init__(
        self,
        base_dir: str,
        mode=None,
        flush_size: int = 10_000,
        parity_naming: bool = True,
    ) -> None:
        from kafka_connect_storage_cloud_formats_spark.schema_evolution import (
            Compatibility,
            SchemaTracker,
        )

        self.base_dir = base_dir
        self.flush_size = flush_size
        self.parity_naming = parity_naming
        self.tracker = SchemaTracker(mode or Compatibility.BACKWARD)
        self.generation = -1
        self._pipe: IngestPipeline | None = None

    def ingest(self, records: DataFrame, schema: T.StructType) -> list[str] | None:
        """Write one enveloped batch carrying ``schema``. Raises
        IncompatibleSchemaError on a disallowed change."""
        action = self.tracker.observe(schema)
        if action == "rotate" or self._pipe is None:
            self.generation += 1
            self._pipe = IngestPipeline(
                f"{self.base_dir}/gen={self.generation:04d}",
                self.tracker.current,
                flush_size=self.flush_size,
                parity_naming=self.parity_naming,
            )
        # Project the batch onto the current schema via THE projector
        # (schema_evolution.project_to_schema): envelope passes through,
        # missing nullable value fields become NULL, and a missing
        # NON-nullable field fails loudly — an inline copy here previously
        # dropped that guard and would silently NULL-fill if a tracker/mode
        # change ever let such a batch through.
        from kafka_connect_storage_cloud_formats_spark.schema_evolution import (
            project_to_schema,
        )

        return self._pipe.run_batch(
            project_to_schema(records, self.tracker.current, passthrough=ENVELOPE_COLS)
        )

    def read_back(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("orc").option("mergeSchema", "true")
        if self.parity_naming:
            reader = reader.option("pathGlobFilter", "*.orc").option(
                "recursiveFileLookup", "true"
            )
        back = reader.load(self.base_dir)
        # gen=/batch= are write-layout bookkeeping discovered as partition
        # columns on the non-parity (Hive-layout) path, not data — same
        # contract as IngestPipeline.read_back (round-9 review)
        return back.drop(*[c for c in ("gen", "batch") if c in back.columns])


def coerce_stream(records: DataFrame, schema: T.StructType) -> DataFrame:
    """Streaming-safe projection: envelope columns pass through, value
    columns cast onto the engine schema."""
    value_names = {f.name for f in schema.fields}
    other = [records[c] for c in records.columns if c not in value_names]
    value = [records[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
    return records.select(*other, *value)
