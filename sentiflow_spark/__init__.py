"""sentiflow_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
(spacesedan/sentiflow, a Go/Kafka/DynamoDB streaming sentiment pipeline;
see SURVEY.md) as an idiomatic Apache Spark engine:

- batch + Structured Streaming dataflows built on the DataFrame API,
- a library of composable relational operators (projections, filters,
  routers, joins, dedup, aggregation, windows) mirroring the reference's
  operator inventory (SURVEY.md §2),
- deterministic stub "model UDFs" for topic extraction / summarization /
  sentiment scoring so every dataflow is oracle-checkable,
- large-scale training-data-pipeline operators: exact + approximate
  deduplication (MinHash-LSH, SimHash, n-gram Jaccard), embedding
  similarity search, text analysis, multimodal column plumbing.

Everything is designed for a multi-executor cluster (broadcast joins for
dims, partial aggregation, AQE, salting helpers) while remaining testable
on local[N].
"""

__version__ = "0.1.0"

from sentiflow_spark.session import get_spark  # noqa: F401
