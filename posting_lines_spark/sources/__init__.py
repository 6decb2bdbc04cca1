from posting_lines_spark.sources.tables import (
    TABLES,
    load_csv,
    load_jdbc,
    load_table,
    register_views,
    write_jdbc,
)

__all__ = ["TABLES", "load_csv", "load_jdbc", "load_table", "register_views", "write_jdbc"]
