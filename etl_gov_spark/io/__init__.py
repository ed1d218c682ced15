from etl_gov_spark.io.sources import Catalog, load_tables, read_table

__all__ = ["Catalog", "load_tables", "read_table"]
