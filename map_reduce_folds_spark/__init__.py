"""map_reduce_folds_spark — a PySpark-native map-reduce-fold analytics engine.

A from-scratch re-expression of the capabilities of the Haskell library
``adamConnerSax/map-reduce-folds`` (reference read at /root/reference) on top
of the Spark DataFrame API, extended with the relational / streaming /
LLM-data-pipeline operators a 100 TB training-data pipeline needs.

The reference decomposes every computation into four stages
(reference Readme.md:11-15, src/Control/MapReduce/Core.hs:26-34):

    unpack (filter / melt)  ->  assign (row -> (k, v))
        ->  group (by k)    ->  reduce (fold per group)

Here the four stages compile to a single declarative DataFrame plan::

    df.filter/explode -> select(k..., v...) -> groupBy(k...) -> agg(...)

so Catalyst + Tungsten (not a hand-written engine zoo) pick the physical
strategy.  The reference's central semantic property — applicative folds
share one pass and applicative reduces share one grouping
(Core.hs:211-227) — is preserved: a ``FoldReduce`` with N folds emits ONE
``.agg`` with N aggregate expressions, i.e. one shuffle.
"""

from map_reduce_folds_spark.core import (
    Assign,
    AssignUDF,
    Filter,
    FoldReduce,
    GroupReduce,
    Keep,
    MapInPandas,
    MapReduce,
    Melt,
    Transform,
    concat,
    shared_scan,
)
from map_reduce_folds_spark import folds
from map_reduce_folds_spark.session import get_spark

__all__ = [
    "Assign",
    "AssignUDF",
    "Filter",
    "FoldReduce",
    "GroupReduce",
    "Keep",
    "MapInPandas",
    "MapReduce",
    "Melt",
    "Transform",
    "concat",
    "folds",
    "get_spark",
    "shared_scan",
]

__version__ = "0.1.0"
