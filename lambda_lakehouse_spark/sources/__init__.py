from lambda_lakehouse_spark.sources.readers import read_csv_raw, read_table, tables
from lambda_lakehouse_spark.sources.writer import write_partitioned

__all__ = ["read_csv_raw", "read_table", "tables", "write_partitioned"]
