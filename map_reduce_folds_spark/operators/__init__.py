from map_reduce_folds_spark.operators import (  # noqa: F401
    dedup,
    graph,
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
