from posting_lines_spark.streaming import incremental

__all__ = ["incremental"]
