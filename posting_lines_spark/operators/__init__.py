from posting_lines_spark.operators import pipeline

__all__ = ["pipeline"]
