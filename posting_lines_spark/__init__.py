"""posting_lines_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference `SpacecraftSI/posting-lines` (an incremental geospatial ETL
pipeline over PostgreSQL/PostGIS; see SURVEY.md), and extends the operator
surface with the large-scale training-data-pipeline operations (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Design stance (SURVEY.md §7): a library of composable DataFrame
transformations; no custom Catalyst rules; no Python UDFs on the parity
path — the geodesy kernel (reference sql_to_line.py:205-224) is pure
Column expression math, fully whole-stage-codegen'd.
"""

__version__ = "0.1.0"
