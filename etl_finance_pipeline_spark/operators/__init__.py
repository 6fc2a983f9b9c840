from etl_finance_pipeline_spark.operators.normalize import (  # noqa: F401
    build_rename_map,
    enforce_dtypes,
    normalize_columns,
    normalize_datetime,
    normalize_df,
    remove_duplicates,
    validate_required_columns,
)
from etl_finance_pipeline_spark.operators.resample import resample_ohlc  # noqa: F401
from etl_finance_pipeline_spark.operators.gaps import (  # noqa: F401
    classify_gap_expr,
    detect_gaps,
    expected_grid,
    gap_islands,
    interpolate_linear,
    reindex_to_grid,
    repair_gaps,
)
from etl_finance_pipeline_spark.operators.report import data_quality_report  # noqa: F401
from etl_finance_pipeline_spark.operators.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from etl_finance_pipeline_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_duplicates,
    ivf_ann_topk,
    lsh_ann_topk,
)
from etl_finance_pipeline_spark.operators.text_analysis import (  # noqa: F401
    language_id,
    quality_score,
    token_counts,
    winnowing_fingerprints,
)
from etl_finance_pipeline_spark.operators.temporal import (  # noqa: F401
    asof_join,
    range_join,
    sessionize,
)
from etl_finance_pipeline_spark.operators.multimodal import (  # noqa: F401
    decode_image_stats,
    image_byte_histogram,
    resize_images,
    sample_video_frames,
    with_media_metadata,
)
