"""ORC sinks: Spark-native partitioned writer + reference-parity writer.

The reference writes one ORC file per (topic, partition, offset-range):
deterministic name ``{topics}_{dir}_{topic}_{partition}_{offset:010d}.orc``
(test-framework ``FileUtils.java:17-26``), a new file every ``flush.size``
records (observed offsets {0,3,6} for 7 records at flush.size=3,
``DataWriterOrcTest.java:92``), and exactly-once via unconditional overwrite
of the deterministic name (``OrcRecordWriter.java:91``, recovery scenario
``DataWriterOrcTest.java:102-124``).

Two sinks:

- ``write_orc_partitioned`` — the idiomatic Spark path: Hive-style
  ``partition=N/`` layout (reference ``DefaultPartitioner``,
  ``DataWriterOrcTest.java:261-264``), vectorized ORC writer, commit
  protocol, ``maxRecordsPerFile`` for file sizing. This is the sink a 100 TB
  pipeline should use: readers get partition pruning + stripe pushdown free.

- ``write_orc_parity`` — exact reference naming/rotation semantics for
  drop-in compatibility: records grouped by
  ``(topic, partition, floor(offset / flush_size))``, one ORC file per group
  with the offset-zero-padded name, written via deterministic overwrite so
  re-processing is idempotent (same exactly-once argument as the reference).
  Implemented as a *distributed* grouped write (one Spark write task per
  file group via ``partitionBy`` on a computed file-group column, then a
  driver-side rename pass over the manifest — O(#files), no data through the
  driver).

Scale notes: on a real cluster ``write_orc_parity``'s rename pass is a
metadata-only operation against the filesystem/S3 listing (one rename per
output file, parallelizable); data movement is fully distributed. The hard
cap of 11,000 rows/file in the reference (single VectorizedRowBatch,
``OrcRecordWriter.java:100``, flush disabled at 77-79) is a historical
constant, deliberately NOT reproduced — ``flush_size`` may be any size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference test-framework delimiters (FileUtils.java:7-8); '#' in filenames is
# sanitized to '_' by the writer (OrcRecordWriter.java:50) so the effective
# on-storage delimiter is '_' everywhere (SURVEY.md §2.2.5).
DIRECTORY_DELIM = "_"
ZERO_PAD_FORMAT = "%010d"
EXTENSION = ".orc"


def file_key_to_commit(
    topics_prefix: str,
    dir_prefix: str,
    topic: str,
    partition: int,
    start_offset: int,
    extension: str = EXTENSION,
    zero_pad_format: str = ZERO_PAD_FORMAT,
) -> str:
    """Reference file-key scheme (``FileUtils.java:17-26`` + '#'→'_' sanitation
    ``OrcRecordWriter.java:50``)."""
    name = (
        f"{topic}{DIRECTORY_DELIM}{partition}{DIRECTORY_DELIM}"
        f"{zero_pad_format % start_offset}{extension}"
    )
    key = f"{topics_prefix}{DIRECTORY_DELIM}{dir_prefix}{DIRECTORY_DELIM}{name}"
    return key.replace("#", "_")


def write_orc_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("partition",),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Spark-native sink: Hive-style partition dirs, vectorized ORC write.

    ``max_records_per_file`` approximates the reference's count-based
    rotation (``FLUSH_SIZE_CONFIG``) without fixing file *names*.
    """
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.orc(path)


def _glob_escape(path: str) -> str:
    """One definition in fsio since round 12 (the artifact sweep used to
    import the sink's copy — inverted layering)."""
    from kafka_connect_storage_cloud_formats_spark.fsio import glob_escape

    return glob_escape(path)



def write_orc_parity(
    df: DataFrame,
    out_dir: str,
    flush_size: int,
    topics_prefix: str = "topics",
    dir_prefix: str | None = None,
    topic_col: str = "topic",
    partition_col: str = "partition",
    offset_col: str = "offset",
    value_cols: list[str] | None = None,
) -> list[str]:
    """Reference-parity sink. Returns the sorted list of written file keys.

    Semantics reproduced (SURVEY.md §2.1 #12-15):
    - one file per (topic, partition, offset-range of ``flush_size``);
    - file named ``{topics}_{dir}_{topic}_{partition}_{start_offset:010d}.orc``;
    - deterministic overwrite → idempotent re-processing (recovery test
      ``DataWriterOrcTest.java:102-124``);
    - only the *value* columns land in the file (the Kafka key is dropped,
      SURVEY.md §1.3); offsets/topic/partition drive placement only.

    Distributed strategy: compute ``start_offset = floor(offset/flush_size) *
    flush_size`` as a column, write with ``partitionBy(topic, partition,
    start_offset)`` + ``coalesce`` within groups so each group lands as one
    file (repartition by the group key ⇒ one task per group ⇒ one file), then
    rename each group directory's single part-file to the reference key.
    """
    if value_cols is None:
        # Default = everything except the engine's envelope columns. NOTE
        # 'key' and 'ts' are envelope names here (the Kafka record key and
        # kafka_stream_source's timestamp alias) — a BUSINESS column with
        # either name is silently excluded by this default; such callers
        # must pass value_cols explicitly (as IngestPipeline does, from
        # its value schema).
        value_cols = [
            c for c in df.columns if c not in (topic_col, partition_col, offset_col, "key", "ts")
        ]

    staged = os.path.join(out_dir, "_staged")
    group_cols = ["__topic", "__partition", "__start_offset"]
    out = (
        df.withColumn("__topic", F.col(topic_col))
        .withColumn("__partition", F.col(partition_col))
        .withColumn(
            "__start_offset",
            (F.floor(F.col(offset_col) / F.lit(flush_size)) * F.lit(flush_size)).cast("long"),
        )
        .select(*group_cols, F.col(offset_col).alias("__offset"), *[F.col(c) for c in value_cols])
        # one shuffle, keyed by file group → each output file written by one task
        .repartition(*[F.col(c) for c in group_cols])
        # Sort by OFFSET within each group — the reference appends records
        # in Kafka offset order, so file content order is part of the parity
        # contract (sorting by group_cols alone is a no-op inside a group
        # and leaves rows in nondeterministic shuffle-arrival order). The
        # projection dropping __offset afterwards preserves row order; only
        # the value columns land in the file.
        .sortWithinPartitions(*group_cols, "__offset")
        .drop("__offset")
    )
    # Planned write (V1Writes) stacks its own Sort(partition cols) on the
    # plan and EliminateSorts then removes the finer (group, offset) sort
    # above — silently un-ordering the file content. With it disabled, the
    # writer checks the PHYSICAL child ordering, sees the partition-column
    # prefix satisfied, and preserves our row order.
    #
    # SINGLE-WRITER ASSUMPTION: session confs can't be scoped per-action,
    # so this toggle is visible session-wide between set and restore. A
    # concurrent write in the same SparkSession (e.g. a parallel streaming
    # query) could observe the flipped value or clobber the restore. The
    # engine's parity sink is invoked from single-writer batch paths only;
    # a multi-writer deployment would serialize writes through this sink
    # or isolate them in cloned sessions (spark.newSession()).
    spark_ = df.sparkSession
    planned = spark_.conf.get("spark.sql.optimizer.plannedWrite.enabled", "true")
    spark_.conf.set("spark.sql.optimizer.plannedWrite.enabled", "false")
    try:
        out.write.mode("overwrite").partitionBy(*group_cols).orc(staged)
    finally:
        spark_.conf.set("spark.sql.optimizer.plannedWrite.enabled", planned)

    # Metadata-only finalize through the Hadoop FileSystem API: ONE glob
    # over the staged layout collapses the driver's ~40 py4j round-trips
    # (a listStatus per directory level at 30 file groups) to a single
    # gateway call; the filesystem-side work is unchanged — Hadoop's
    # Globber still expands level by level, one listing per matched
    # directory, on any scheme. Then one rename per output file, so the
    # same O(#files) pass works on file://, hdfs:// and s3a:// (where
    # rename is the object-store copy the committer already paid for the
    # staged write; per-file finalize cost is a HEAD+COPY+DELETE, no row
    # data).
    spark = df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    fs = jpath(staged).getFileSystem(spark._jsc.hadoopConfiguration())

    # The staged PREFIX must be glob-escaped: an out_dir containing glob
    # metacharacters (e.g. ".../run[A]/out") would otherwise be
    # interpreted as a pattern — matching nothing and silently skipping
    # every rename (or throwing on unbalanced braces). Only the trailing
    # wildcard segments are meant as a pattern.
    pattern = jpath(
        _glob_escape(staged)
        + "/__topic=*/__partition=*/__start_offset=*/part-*"
        + EXTENSION
    )
    # Partition-dir names carry Spark's escapePathName encoding (%XX for
    # '#', ':', '%', space, ...): parse them back through the inverse, or
    # a topic like 'a#b' (written as __topic=a%23b) would produce file
    # keys naming the ESCAPED string and the reference's '#'→'_'
    # sanitation would never fire (round-9 review).
    import re as _re

    def _unescape_partition_value(v: str) -> str:
        return _re.sub(
            r"%([0-9A-Fa-f]{2})", lambda m: chr(int(m.group(1), 16)), v
        )

    groups: dict[tuple[str, int, int], list] = {}
    for st in fs.globStatus(pattern) or []:
        p = st.getPath()
        off_dir, part_dir = p.getParent(), p.getParent().getParent()
        topic_dir = part_dir.getParent()
        key = (
            _unescape_partition_value(topic_dir.getName().split("=", 1)[1]),
            int(part_dir.getName().split("=", 1)[1]),
            int(off_dir.getName().split("=", 1)[1]),
        )
        groups.setdefault(key, []).append(p)

    # Defense in depth against any residual glob-semantics mismatch: an
    # empty match against a staged dir that DOES contain topic dirs means
    # the pattern failed, not that there is no data — the unconditional
    # staged-dir delete below would otherwise silently destroy the write.
    if not groups:
        leftovers = [
            st.getPath().getName()
            for st in fs.listStatus(jpath(staged))
            if st.isDirectory() and st.getPath().getName().startswith("__topic=")
        ]
        if leftovers:
            raise RuntimeError(
                f"parity finalize glob matched nothing but staged topic dirs "
                f"exist ({leftovers[:3]}...): refusing to delete staged data"
            )

    written: list[str] = []
    made_parents: set[str] = set()
    dir_prefix = dir_prefix if dir_prefix is not None else ""
    for (topic, partition, start_offset), parts in sorted(groups.items()):
        key = file_key_to_commit(
            topics_prefix, dir_prefix or topic, topic, partition, start_offset
        )
        if len(parts) != 1:  # merge would break one-file parity; fail loudly
            raise RuntimeError(
                f"file group {key} produced {len(parts)} part files; expected 1"
            )
        dest = jpath(out_dir + "/" + key)
        parent = dest.getParent()
        if parent is not None and str(parent) not in made_parents:
            if not fs.exists(parent):
                fs.mkdirs(parent)
            made_parents.add(str(parent))
        if fs.exists(dest):
            fs.delete(dest, False)  # unconditional overwrite (OrcRecordWriter.java:91)
        if not fs.rename(parts[0], dest):
            raise RuntimeError(f"rename failed for {key}")
        written.append(key)
    fs.delete(jpath(staged), True)
    return sorted(written)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read-back operator (reference test oracle ``OrcUtils.getRecords``,
    ``OrcUtils.java:31-95`` — minus its index bugs, SURVEY.md §2.2.4)."""
    return spark.read.orc(path)
