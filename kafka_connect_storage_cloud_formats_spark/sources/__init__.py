from kafka_connect_storage_cloud_formats_spark.sources.kafka_envelope import (
    kafka_stream_source,
    with_kafka_envelope,
)

__all__ = ["with_kafka_envelope", "kafka_stream_source"]
