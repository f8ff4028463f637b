from map_reduce_folds_spark.operators import relational, windows  # noqa: F401
