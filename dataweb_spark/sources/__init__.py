from dataweb_spark.sources.readers import read_source_frame, read_connection_table

__all__ = ["read_source_frame", "read_connection_table"]
