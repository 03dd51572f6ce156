"""dataweb_spark — a PySpark-native federated analytics engine.

A from-scratch rebuild of the capabilities of datawebdb/dataweb (a Rust /
Arrow-Flight / DataFusion federated "data web") on idiomatic PySpark.

Architecture (see SURVEY.md §7):

* ``catalog``   — Entity / DataSource / Mapping / Permission metadata model +
                  YAML loader (reference: ``core/src/model/*``).
* ``plans``     — entity→DataFrame view resolution (the query-mapping compiler,
                  reference ``core/src/execute/map_local.rs`` / ``map_remote.rs``),
                  SQL gateway validation (``core/src/execute/validation.rs``).
* ``sources``   — source readers (file dirs / JDBC; reference
                  ``core/src/execute/data_stores/*``) and the Arrow Flight
                  facade (reference ``flight_server``).
* ``functions`` — beyond-reference LLM-data-pipeline operators: dedup,
                  similarity search, text analysis, multimodal columns,
                  scale utilities (salting / bucketing).
* ``operators`` — temporal joins Spark lacks natively (as-of, range).
* ``streaming`` — Structured Streaming extensions (no reference counterpart).
* ``jobs``      — async job layer (reference ``query_runner`` + REST async path).

Everything relational executes on Spark's Catalyst/Tungsten; this package only
builds metadata, views and plumbing.
"""

from dataweb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
