from map_reduce_folds_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    quality,
    relational,
    sampling,
    similarity,
    sketches,
    skew,
    text,
    windows,
)
