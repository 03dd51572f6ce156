from dataweb_spark.operators.temporal import as_of_join, range_join

__all__ = ["as_of_join", "range_join"]
