"""Structured Streaming runtime: file/Kafka sources → ORC sink with
exactly-once checkpointing, and memory-sink runners for windowed plans.

This is the Spark-native form of the reference's production pipeline
(SURVEY.md §3.1): the reference achieves exactly-once via deterministic
offset-named files + unconditional overwrite (OrcRecordWriter.java:91,
DataWriterOrcTest.java:102-124); Structured Streaming achieves it via the
checkpoint WAL + the file sink's ``_spark_metadata`` commit log — re-running
a stream over already-committed input appends nothing.

The Kafka source is the production entry (format("kafka") + from_avro —
see sources/kafka_envelope.py for the envelope contract); tests drive the
same plans through a schema'd file source, per SURVEY.md §7 stage 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Single source-API definition: the engine re-exports the canonical sources
# from sources/kafka_envelope.py rather than carrying drifting copies (an
# earlier duplicate here lacked the Kafka gate's RuntimeError wrapper and
# the file source's fmt parameter).
from kafka_connect_storage_cloud_formats_spark.sources.kafka_envelope import (  # noqa: F401
    file_stream_source,
    kafka_stream_source,
)


def run_orc_ingest(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Stream → partitioned ORC with exactly-once semantics, processing all
    currently-available input (trigger availableNow) then stopping. Safe to
    re-run: the checkpoint + _spark_metadata log skip committed input."""
    writer = (
        df.writeStream.format("orc")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Run a (typically aggregating) streaming plan to completion into an
    in-memory table ``name`` (test/debug sink)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
