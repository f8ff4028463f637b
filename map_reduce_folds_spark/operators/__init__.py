from map_reduce_folds_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    quality,
    relational,
    similarity,
    skew,
    text,
    windows,
)
