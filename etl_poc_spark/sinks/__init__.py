from etl_poc_spark.sinks.sinks import (  # noqa: F401
    write_error_record,
    write_json_records,
    write_markdown_articles,
)
