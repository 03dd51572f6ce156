from dataweb_spark.plans.resolve import (
    PROVENANCE_RELAY,
    PROVENANCE_SOURCE,
    build_source_view,
    register_entity_views,
    resolve_entity,
)
from dataweb_spark.plans.validation import ValidationError, validate_sql
from dataweb_spark.plans.gateway import QueryGateway

__all__ = [
    "PROVENANCE_RELAY",
    "PROVENANCE_SOURCE",
    "QueryGateway",
    "ValidationError",
    "build_source_view",
    "register_entity_views",
    "resolve_entity",
    "validate_sql",
]
