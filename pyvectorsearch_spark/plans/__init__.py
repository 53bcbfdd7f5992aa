from pyvectorsearch_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    explain_str,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_ids,
)
