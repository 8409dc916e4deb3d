"""PySpark-native analytics & data-engineering engine.

A clean-room, library-shaped re-implementation of the capabilities of
``m-farhan-mayo/Hospital-Data-Engineering-Pipeline-End-to-End-Project``
(a Databricks medallion ETL: Bronze -> Silver -> Gold with cleanse-casts,
SCD Type-2 merges, and a star schema), re-expressed as idiomatic OSS
PySpark (DataFrame/SQL + Catalyst), plus large-scale training-data
pipeline operators (deduplication, similarity search, text analysis,
multimodal column plumbing).

Design stance (see SURVEY.md section 7):
- declarative DataFrame/SQL plans; Catalyst/Tungsten/AQE pick physical
  strategy
- explicit schemas everywhere (no 2-pass inference at 100 TB)
- every run parameterized by processing_date for determinism
- broadcast small dims, partition facts, keep logic in codegen'd
  Column expressions; pandas UDFs only where built-ins can't express
  the semantics
"""

from hospital_data_engineering_pipeline_end_to_end_project_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
