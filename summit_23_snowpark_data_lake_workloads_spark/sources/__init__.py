from .batch import TESTDATA_TABLES, load_tables, read_json_sampled, read_parquet_by_name

__all__ = ["TESTDATA_TABLES", "load_tables", "read_json_sampled", "read_parquet_by_name"]
