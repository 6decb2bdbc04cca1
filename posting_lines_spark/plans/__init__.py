from posting_lines_spark.plans import ais

__all__ = ["ais"]
