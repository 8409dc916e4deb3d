from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.registry import (
    oracle_sql,
    queries,
)

__all__ = ["queries", "oracle_sql"]
