from sfr_ingest_pipeline_spark.plans.audit import (
    explain_str,
    has_broadcast_join,
    has_cartesian_product,
    has_partial_aggregate,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_cartesian_product",
    "has_partial_aggregate",
    "wholestage_codegen_spans",
]
