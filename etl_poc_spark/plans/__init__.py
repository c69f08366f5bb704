from etl_poc_spark.plans.schema_grammar import to_spark_type, to_struct_type  # noqa: F401
from etl_poc_spark.plans.yaml_pipeline import PipelineConfigError, run_pipeline, validate_config  # noqa: F401
