from readur_spark.plans.audit import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_no_shuffle,
    pushed_filters,
    scan_columns,
    shuffle_count,
)
