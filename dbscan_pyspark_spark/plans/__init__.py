from dbscan_pyspark_spark.plans.inspect import (  # noqa: F401
    assert_no_cartesian,
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    scan_columns,
    shuffle_count,
    wholestage_codegen_spans,
)
