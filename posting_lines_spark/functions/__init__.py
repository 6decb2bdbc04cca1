from posting_lines_spark.functions import geo

__all__ = ["geo"]
