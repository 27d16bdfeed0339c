from kafka_connect_storage_cloud_formats_spark.sinks.orc_sink import (
    read_orc,
    write_orc_parity,
    write_orc_partitioned,
)

__all__ = ["write_orc_partitioned", "write_orc_parity", "read_orc"]
