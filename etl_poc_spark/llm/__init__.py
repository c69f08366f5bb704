from etl_poc_spark.llm.provider import LLMProvider, StubProvider, get_provider  # noqa: F401
from etl_poc_spark.llm.ops import llm_map, llm_reduce  # noqa: F401
