"""ytsaurus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of YTsaurus (https://github.com/ytsaurus/ytsaurus).

This is NOT a port of the reference's C++/Rust execution engine: the logical
capabilities (QL SELECT surface, MapReduce operation types, the YQL relational
feature set, queue-style streaming, plus LLM-data-pipeline operators) are
re-expressed on idiomatic Spark primitives — DataFrame/SQL plans optimized by
Catalyst, shuffles managed by Tungsten/AQE, Pandas UDFs only where built-in
operators genuinely can't express the semantics.

Package layout (mirrors SURVEY.md §7 build plan):

- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``catalog``    — path→table registry over parquet dirs (Cypress-tree analog)
- ``yt_types``   — YT logical type ↔ Spark type mapping
- ``functions``  — QL/YQL scalar + aggregate function surface on Spark columns
- ``operators``  — MapReduce operation layer (map/reduce/sort/merge/erase/…),
                   QL query helpers (WITH TOTALS, top-k, array join), dedup,
                   similarity search, text analysis, multimodal plumbing
- ``streaming``  — queue/consumer-offset semantics on Structured Streaming
- ``plans``      — plan introspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"

from ytsaurus_spark.session import get_spark  # noqa: F401
