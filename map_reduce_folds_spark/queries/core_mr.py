"""Query registry: every implemented operator as (PySpark impl, DuckDB oracle).

This mirrors the reference's differential-test strategy (engine vs hand
oracle, reference test/Test1.hs:27-57) with DuckDB as the oracle — SURVEY §5.

Each query callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the oracle SQL exactly (the driver sorts columns by name
and hashes values).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_folds_spark import folds
from map_reduce_folds_spark.core import Assign, Filter, FoldReduce, MapReduce, Melt
from map_reduce_folds_spark.queries.registry import query
from map_reduce_folds_spark.sources import load_table


def _dec(col: str) -> F.Column:
    # exact-sum path for fractional doubles (see __spark_entry__ docstring)
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Core map-reduce fold algebra (SURVEY §2.1-§2.6)
# ---------------------------------------------------------------------------

@query(
    "mr_readme_sum",
    oracle="""
    SELECT (l_partkey % 3 = 0) AS k,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE CAST(l_quantity AS BIGINT) % 2 = 0
    GROUP BY 1
    """,
)
def mr_readme_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The readme query (reference examples/readmeExample.hs / Readme.md:28-47)
    re-expressed on lineitem: filter even, key by divisible-by-3, sum."""
    li = load_table(spark, sf_dir, "lineitem")
    mr = MapReduce(
        unpack=Filter(F.col("l_quantity").cast("bigint") % 2 == 0),
        assign=Assign(
            keys={"k": F.col("l_partkey") % 3 == 0},
            values={"v": _dec("l_extendedprice")},
        ),
        reduce=FoldReduce({"sum_price": folds.sum_("v").map(lambda c: c.cast("double"))}),
    )
    return mr.run(li)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mr_readme_sum(spark, sf_dir)


@query(
    "mr_task1_mean",
    oracle="""
    SELECT l_returnflag AS k,
           SUM(l_quantity) / COUNT(*) AS mean_qty
    FROM lineitem
    WHERE CAST(l_quantity AS BIGINT) % 2 = 0
    GROUP BY 1
    """,
)
def mr_task1_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench Task 1 (reference bench/MapReduce.hs:47-65): filter even value,
    group by low-cardinality label, mean.  l_quantity is integer-valued so
    the sum is exact; mean = one double division (stable vs oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    mr = MapReduce(
        unpack=Filter(F.col("l_quantity").cast("bigint") % 2 == 0),
        assign=Assign(keys={"k": "l_returnflag"}, values={"v": "l_quantity"}),
        reduce=FoldReduce({
            "mean_qty": folds.Fold.zip(
                folds.sum_("v"), folds.count_(),
                combine=lambda s, n: s / n,
            ),
        }),
    )
    return mr.run(li)


@query(
    "mr_applicative",
    oracle="""
    SELECT l_returnflag AS k,
           SUM(l_quantity) AS sum_qty,
           COUNT(*) AS n_rows,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           SUM(l_quantity) / COUNT(*) AS mean_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
    FROM lineitem
    GROUP BY 1
    """,
)
def mr_applicative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applicative Reduce fusion (Core.hs:211-218, ListStats.hs:39-40):
    six folds, ONE .agg, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    mr = MapReduce(
        assign=Assign(
            keys={"k": "l_returnflag"},
            values={"v": "l_quantity", "d": _dec("l_discount")},
        ),
        reduce=FoldReduce({
            "sum_qty": folds.sum_("v"),
            "n_rows": folds.count_(),
            "min_qty": folds.min_("v"),
            "max_qty": folds.max_("v"),
            "mean_qty": folds.Fold.zip(folds.sum_("v"), folds.count_(),
                                       combine=lambda s, n: s / n),
            "sum_disc": folds.sum_("d").map(lambda c: c.cast("double")),
        }),
    )
    return mr.run(li)


@query(
    "mr_melt",
    oracle="""
    WITH melted AS (
        SELECT l_returnflag AS k, l_quantity AS y FROM lineitem
        UNION ALL
        SELECT l_returnflag AS k, 2 * l_quantity AS y FROM lineitem
    )
    SELECT k, SUM(y) AS sum_y, COUNT(*) AS n FROM melted GROUP BY k
    """,
)
def mr_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt unpack (Core.hs:98; andTwice at ListStats.hs:12): each row
    becomes [x, 2x], then group-sum."""
    li = load_table(spark, sf_dir, "lineitem")
    mr = MapReduce(
        unpack=Melt(
            F.array(F.col("l_quantity"), F.col("l_quantity") * 2),
            alias="y", keep=("l_returnflag",),
        ),
        assign=Assign(keys={"k": "l_returnflag"}, values={"v": "y"}),
        reduce=FoldReduce({"sum_y": folds.sum_("v"), "n": folds.count_()}),
    )
    return mr.run(li)


@query(
    "mr_task2_sparse",
    oracle="""
    WITH sparse AS (
        SELECT CAST(l_quantity AS BIGINT) AS a,
               l_partkey % 47 AS b,
               CASE WHEN CAST(l_quantity AS BIGINT) % 2 = 0
                    THEN l_partkey % 13 END AS c
        FROM lineitem
    )
    SELECT c AS k, SUM(a + b) / COUNT(*) AS mean_ab, COUNT(*) AS n
    FROM sparse WHERE c IS NOT NULL GROUP BY c
    """,
)
def mr_task2_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench Task 2 (reference bench/MapReduce.hs:280-306): sparse rows —
    keep rows where optional field C is present, group by C, mean(A+B).
    The Maybe-typed melt maps to a nullable column + null filter."""
    li = load_table(spark, sf_dir, "lineitem")
    sparse = li.select(
        F.col("l_quantity").cast("bigint").alias("a"),
        (F.col("l_partkey") % 47).alias("b"),
        F.when(F.col("l_quantity").cast("bigint") % 2 == 0,
               F.col("l_partkey") % 13).alias("c"),
    )
    mr = MapReduce(
        unpack=Filter(F.col("c").isNotNull()),
        assign=Assign(keys={"k": "c"}, values={"ab": F.col("a") + F.col("b")}),
        reduce=FoldReduce({
            "mean_ab": folds.Fold.zip(folds.sum_("ab"), folds.count_(),
                                      combine=lambda s, n: s / n),
            "n": folds.count_(),
        }),
    )
    return mr.run(sparse)


@query(
    "mr_fold_vocab",
    oracle="""
    SELECT l_returnflag AS k,
           MIN(l_quantity) AS min_q,
           MAX(l_quantity) AS max_q,
           (SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(*))
               / (COUNT(*) - 1) AS var_q,
           sqrt((SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(*))
               / (COUNT(*) - 1)) AS std_q,
           COUNT(DISTINCT l_partkey) AS nd_part,
           MAX(l_discount > 0.05) AS any_big_disc,
           MIN(l_quantity > 0) AS all_pos_qty,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
    FROM lineitem GROUP BY 1
    """,
)
def mr_fold_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete §2.6 fold vocabulary, declared applicatively through the
    fold engine: min/max, variance/stddev (computed from exact integer sums
    via Fold.zip so the oracle matches bitwise — builtin var_samp uses a
    different update formula), count-distinct, any/all, sorted collect_set.

    The count_distinct × collect_set mix triggers the compiler's
    distinct-splitting rewrite (core.FoldReduce._catalyst_path): the
    distinct fold runs as a (k, p) pre-aggregation joined back, instead of
    Catalyst's Expand→ObjectHashAggregate plan — ~2× faster measured, and
    no 2× shuffle blow-up at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("v")

    def var_of(ssq, s, n):
        return (ssq - s * s / n) / (n - F.lit(1))

    mr = MapReduce(
        assign=Assign(
            keys={"k": "l_returnflag"},
            values={"v": "l_quantity", "p": "l_partkey",
                    "d": "l_discount", "st": "l_linestatus"},
        ),
        reduce=FoldReduce({
            "min_q": folds.min_("v"),
            "max_q": folds.max_("v"),
            "var_q": folds.Fold.zip(folds.sum_(v * v), folds.sum_("v"),
                                    folds.count_(), combine=var_of),
            "std_q": folds.Fold.zip(
                folds.sum_(v * v), folds.sum_("v"), folds.count_(),
                combine=lambda ssq, s, n: F.sqrt(var_of(ssq, s, n))),
            "nd_part": folds.count_distinct("p"),
            "any_big_disc": folds.any_(F.col("d") > 0.05),
            "all_pos_qty": folds.all_(v > 0),
            # string, not array: the driver canonicalizer can't hash lists
            "statuses": folds.collect_set("st").map(
                lambda c: F.array_join(F.sort_array(c), ",")),
        }),
    )
    return mr.run(li)


@query(
    "mr_assign_udf",
    oracle="""
    SELECT (l_partkey * 2654435761) % 4294967296 % 8 AS k,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def mr_assign_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AssignM (Core.hs:156-157): the key is computed by arbitrary Python
    over Arrow batches (a Knuth-hash bucket here, so the oracle can mirror
    the arithmetic)."""
    import pandas as pd

    from map_reduce_folds_spark.core import AssignUDF

    li = load_table(spark, sf_dir, "lineitem")

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": (pdf.l_partkey * 2654435761) % (2 ** 32) % 8,
            "v": pdf.l_quantity.astype("int64"),
        })

    mr = MapReduce(
        assign=AssignUDF(assign, schema="k bigint, v bigint",
                         keys=["k"], values=["v"]),
        reduce=FoldReduce({
            "sum_q": folds.sum_("v", dtype="bigint"),
            "n": folds.count_(),
        }),
    )
    return mr.run(li)


@query(
    "mr_null_key_group",
    oracle="""
    SELECT CASE WHEN CAST(l_quantity AS BIGINT) % 2 = 0
                THEN l_partkey % 5 END AS k,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q
    FROM lineitem GROUP BY 1
    """,
)
def mr_null_key_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-key grouping semantics: both engines place NULL keys in one
    group (the reference's Maybe-keyed rows, kept rather than filtered)."""
    li = load_table(spark, sf_dir, "lineitem")
    mr = MapReduce(
        assign=Assign(
            keys={"k": F.when(F.col("l_quantity").cast("bigint") % 2 == 0,
                              F.col("l_partkey") % 5)},
            values={"v": F.col("l_quantity").cast("bigint")},
        ),
        reduce=FoldReduce({
            "n": folds.count_(),
            "sum_q": folds.sum_("v", dtype="bigint"),
        }),
    )
    return mr.run(li)


@query(
    "mr_filtered_folds",
    oracle="""
    SELECT l_returnflag AS k,
           SUM(l_quantity) FILTER (WHERE l_discount > 0.05) AS sum_big_disc,
           COUNT(*) FILTER (WHERE CAST(l_quantity AS BIGINT) % 2 = 0) AS n_even,
           MAX(l_quantity) FILTER (WHERE l_tax = 0) AS max_untaxed,
           SUM(l_quantity) AS sum_all
    FROM lineitem GROUP BY 1
    """,
)
def mr_filtered_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional folds (SQL FILTER clause): differently-filtered
    aggregates fused into ONE .agg — no extra scans or shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    mr = MapReduce(
        assign=Assign(
            keys={"k": "l_returnflag"},
            values={"v": "l_quantity", "d": "l_discount", "t": "l_tax"},
        ),
        reduce=FoldReduce({
            "sum_big_disc": folds.filtered(folds.sum_("v"), F.col("d") > 0.05),
            "n_even": folds.filtered(
                folds.count_(), F.col("v").cast("bigint") % 2 == 0),
            "max_untaxed": folds.filtered(folds.max_("v"), F.col("t") == 0),
            "sum_all": folds.sum_("v"),
        }),
    )
    return mr.run(li)
