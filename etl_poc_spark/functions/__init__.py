from etl_poc_spark.functions.text import (  # noqa: F401
    extract_id,
    field_completeness,
    safe_filename,
    slugify,
    word_count,
)
from etl_poc_spark.functions.scoring import (  # noqa: F401
    article_quality_score_expr,
    paper_validation_exprs,
)
