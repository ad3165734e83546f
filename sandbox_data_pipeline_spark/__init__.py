"""sandbox_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (Qbizinc/sandbox-data-pipeline, an Airflow ELT DAG):
JSON ingestion under two schema disciplines, nested-type relational
transforms, idempotent partition-overwrite publication, run-hour windowing,
data-quality reporting — plus the large-scale training-data operators
(deduplication, similarity search, text analysis, multimodal columns)
that a 100 TB corpus pipeline needs.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for file-arrival flows, Pandas UDFs only
where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from sandbox_data_pipeline_spark.session import get_spark  # noqa: F401
