"""Central query registry: name → (spark_fn, oracle_sql | None).

This is the engine's declared operator surface (driver contract + SURVEY.md
§2 checklist). ``oracle_sql=None`` marks genuinely non-SQL-expressible
operators (driver records a rows-only check).
"""

from __future__ import annotations

from kafka_connect_storage_cloud_formats_spark.queries.pipeline_queries import (
    JSON_ROUNDTRIP_SQL,
    ORC_PARTITIONED_SQL,
    ORC_ROUNDTRIP_SQL,
    PARQUET_ROUNDTRIP_SQL,
    json_roundtrip,
    orc_ingest_roundtrip,
    orc_partitioned_roundtrip,
    parquet_roundtrip,
)
from kafka_connect_storage_cloud_formats_spark.operators.asof import ASOF_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.compaction import COMPACTION_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.dedup import DEDUP_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.multimodal import MULTIMODAL_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.profiling import PROFILING_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.similarity import SIMILARITY_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.training_pipeline import TRAINING_PIPELINE_QUERIES
from kafka_connect_storage_cloud_formats_spark.operators.text import TEXT_QUERIES
from kafka_connect_storage_cloud_formats_spark.queries.relational import RELATIONAL_QUERIES
from kafka_connect_storage_cloud_formats_spark.streaming.windows import STREAMING_WINDOW_QUERIES

QUERIES: dict = {
    # --- reference pipeline semantics (SURVEY.md §2.1), oracle-gated
    "orc_ingest_roundtrip": (orc_ingest_roundtrip, ORC_ROUNDTRIP_SQL),
    "orc_partitioned_roundtrip": (orc_partitioned_roundtrip, ORC_PARTITIONED_SQL),
    "parquet_roundtrip": (parquet_roundtrip, PARQUET_ROUNDTRIP_SQL),
    "json_roundtrip": (json_roundtrip, JSON_ROUNDTRIP_SQL),
}
QUERIES.update(RELATIONAL_QUERIES)
QUERIES.update(TEXT_QUERIES)
QUERIES.update(DEDUP_QUERIES)
QUERIES.update(SIMILARITY_QUERIES)
QUERIES.update(MULTIMODAL_QUERIES)
QUERIES.update(STREAMING_WINDOW_QUERIES)
QUERIES.update(PROFILING_QUERIES)
QUERIES.update(COMPACTION_QUERIES)
QUERIES.update(TRAINING_PIPELINE_QUERIES)
QUERIES.update(ASOF_QUERIES)
