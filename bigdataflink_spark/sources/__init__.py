from bigdataflink_spark.sources.tables import TABLES, load_table, load_tables, register_views
from bigdataflink_spark.sources.csv_sales import read_sales_csv, SALES_CSV_GLOB

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_sales_csv",
    "SALES_CSV_GLOB",
]
