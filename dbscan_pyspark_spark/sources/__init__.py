from dbscan_pyspark_spark.sources.io import (  # noqa: F401
    read_csv_points,
    write_csv,
    write_json,
    write_parquet,
)
from dbscan_pyspark_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
    points_from_customer,
    points_from_lineitem,
)
