"""Scalar/column function surface: one import point for the engine's
reusable column expressions and UDFs (SURVEY.md section 2.9/2.11)."""
from puddin_spark.operators.textstats import (  # noqa: F401
    EN_STOPWORDS,
    fingerprint_col,
    langid_en_score_col,
    mean_word_len_col,
    punct_ratio_col,
    quality_columns,
    stopword_ratio_col,
    token_count_col,
    word_token_count_col,
)
from puddin_spark.operators.similarity import cosine_col  # noqa: F401
from puddin_spark.udfs import (  # noqa: F401
    classify_udf,
    pii_scrub_udf,
    process_udf,
    scrub_full_udf,
    scrub_stage1_udf,
    segment_udf,
    tokenize_udf,
)
