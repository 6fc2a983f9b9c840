from etl_finance_pipeline_spark.functions.scalar import (  # noqa: F401
    offset_alias_to_duration,
    portable_hash64,
    universal_hash31,
)
from etl_finance_pipeline_spark.functions.skew import (  # noqa: F401
    salted_agg,
    salted_join,
)
from etl_finance_pipeline_spark.functions.text import (  # noqa: F401
    STOPWORDS,
    bpe_ish_token_count,
    tokens,
    word_shingles,
)
