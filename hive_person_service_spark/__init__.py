"""PySpark-native analytics engine with the query and data-processing
capabilities of titan/hive-person-service (Spark SQL over Hive-style tables),
plus LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

Reference availability: the snapshot at /root/reference/ is EMPTY (see
SURVEY.md §0), so parity is defined against the public HiveQL operator
surface [H] + the driver fixture contract [D], not file:line citations.

Layout:
  session.py   -- SparkSession builder with the engine config block
  sources/     -- pinned schemas + parquet loaders (incl. events ns-ts fix)
  operators/   -- library-level composite operators (asof join, dedup, knn, ...)
  functions/   -- scalar/text/vector helper expressions
  plans/       -- the declared query inventory (SURVEY.md §2) + DuckDB oracles
  streaming/   -- Structured Streaming forms of the §2.I operators
"""

__version__ = "0.1.0"
