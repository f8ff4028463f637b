"""Fold-vocabulary unit tests (SURVEY §2.6), plus a hypothesis property
test mirroring the reference's hedgehog differential property
(test/Test1.hs:54-57: random lists vs a direct oracle)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_reduce_folds_spark import Assign, Filter, FoldReduce, MapReduce, folds


@pytest.fixture(scope="module")
def pairs(spark):
    # (label, value) rows — bench Task 1 shape
    data = [(chr(65 + i % 5), i % 7 + 1) for i in range(100)]
    return spark.createDataFrame(data, "label string, v bigint").cache()


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_builtin_folds(pairs):
    mr = MapReduce(
        assign=Assign(keys={"k": F.lit(1)}, values={"v": "v"}),
        reduce=FoldReduce({
            "s": folds.sum_("v", dtype="bigint"),
            "m": folds.mean_("v"),
            "n": folds.count_(),
            "nc": folds.count_col("v"),
            "nd": folds.count_distinct("v"),
            "mn": folds.min_("v"),
            "mx": folds.max_("v"),
            "fv": folds.variance("v"),
            "sd": folds.stddev("v"),
        }),
    )
    r = _one(mr.run(pairs))
    vals = [i % 7 + 1 for i in range(100)]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((x - mean) ** 2 for x in vals) / (n - 1)
    assert r["s"] == sum(vals)
    assert r["m"] == pytest.approx(mean)
    assert (r["n"], r["nc"], r["nd"]) == (n, n, 7)
    assert (r["mn"], r["mx"]) == (1, 7)
    assert r["fv"] == pytest.approx(var)
    assert r["sd"] == pytest.approx(math.sqrt(var))


def test_any_all_collect(pairs):
    mr = MapReduce(
        assign=Assign(keys={"k": "label"}, values={"v": "v"}),
        reduce=FoldReduce({
            "any6": folds.any_(F.col("v") > 6),
            "all_pos": folds.all_(F.col("v") > 0),
            "st": folds.collect_set("v", dtype="array<bigint>").map(F.sort_array),
        }),
    )
    for r in mr.run(pairs).collect():
        assert r["all_pos"] is True
        assert isinstance(r["st"], list) and r["st"] == sorted(set(r["st"]))


def test_product_fold(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "v bigint")
    mr = MapReduce(
        assign=Assign(keys={"k": F.lit(1)}, values={"v": "v"}),
        reduce=FoldReduce({"p": folds.product_("v")}),
    )
    assert _one(mr.run(df))["p"] == 24.0


def test_first_last_order_caveat(spark):
    # first/last are order-dependent; on a single sorted partition they are
    # deterministic — the documented usage pattern
    df = spark.createDataFrame([(i,) for i in range(10)], "v bigint").coalesce(1)
    mr = MapReduce(
        assign=Assign(keys={"k": F.lit(1)}, values={"v": "v"}),
        reduce=FoldReduce({"f": folds.first_("v", dtype="bigint"),
                           "l": folds.last_("v", dtype="bigint")}),
    )
    r = _one(mr.run(df))
    assert (r["f"], r["l"]) == (0, 9)


def test_zip_struct_result(pairs):
    z = folds.Fold.zip(folds.sum_("v", dtype="bigint"), folds.count_())
    mr = MapReduce(
        assign=Assign(keys={"k": F.lit(1)}, values={"v": "v"}),
        reduce=FoldReduce({"z": z}),
    )
    r = _one(mr.run(pairs))["z"]
    assert (r["_0"], r["_1"]) == (sum(i % 7 + 1 for i in range(100)), 100)


def test_premap_pandas_path(pairs):
    f = folds.fold_from_pandas(lambda p: float(p["v"].sum()), dtype="double")
    pre = f.premap(lambda p: (p * 2).rename(columns={"v": "v"}))
    mr = MapReduce(
        assign=Assign(keys={"k": F.lit(1)}, values={"v": "v"}),
        reduce=FoldReduce({"s2": pre}),
    )
    assert _one(mr.run(pairs))["s2"] == 2.0 * sum(i % 7 + 1 for i in range(100))


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(xs=st.lists(st.integers(min_value=0, max_value=10000), max_size=80))
def test_hypothesis_differential(spark, xs):
    """The reference's hedgehog property, via hypothesis: engine result ==
    direct python oracle for the readme query on arbitrary int lists."""
    direct: dict[bool, int] = {}
    for x in xs:
        if x % 2 == 0:
            direct[x % 3 == 0] = direct.get(x % 3 == 0, 0) + x
    df = spark.createDataFrame([(x,) for x in xs], "x bigint") if xs \
        else spark.createDataFrame([], "x bigint")
    mr = MapReduce(
        unpack=Filter("x % 2 = 0"),
        assign=Assign(keys={"k": F.col("x") % 3 == 0}, values={"v": "x"}),
        reduce=FoldReduce({"s": folds.sum_("v", dtype="bigint")}),
    )
    got = {r["k"]: r["s"] for r in mr.run(df).collect()}
    assert got == direct


def test_premap_routes_builtin_to_pandas_path(spark):
    """premap on a builtin fold must take the pandas path (not crash on
    the Catalyst path)."""
    df = spark.createDataFrame([(1, 2)], "v bigint, w bigint")
    pre = folds.sum_("v").premap(lambda p: p[["w"]].rename(columns={"w": "v"}))
    assert pre.compilable is False
    mr = MapReduce(
        assign=Assign(keys={"k": F.lit(1)}, values={"v": "v", "w": "w"}),
        reduce=FoldReduce({"s": pre}),
    )
    assert mr.run(df).collect()[0]["s"] == 2


def test_fold_functor_and_applicative_laws(pairs):
    """Algebra laws the reference gets from Haskell's type classes, pinned
    here behaviorally: fmap identity/composition on folds, and zip
    projection (zip(a, b) then take the first == a alone)."""
    base = folds.sum_("v", dtype="bigint")

    mr = lambda **fs: MapReduce(  # noqa: E731
        assign=Assign(keys={"k": "label"}, values={"v": "v"}),
        reduce=FoldReduce(fs),
    )

    rows = mr(
        plain=base,
        fmap_id=folds.sum_("v", dtype="bigint").map(lambda c: c),
        fmap_comp=folds.sum_("v", dtype="bigint").map(
            lambda c: (c + 1) * 2),                       # g∘f in one map
        fmap_nested=folds.sum_("v", dtype="bigint")
            .map(lambda c: c + 1).map(lambda c: c * 2),   # f then g
        zip_fst=folds.Fold.zip(folds.sum_("v", dtype="bigint"),
                               folds.count_(),
                               combine=lambda s, n: s),
    ).run(pairs).collect()
    for r in rows:
        assert r["fmap_id"] == r["plain"]
        assert r["fmap_nested"] == r["fmap_comp"] == (r["plain"] + 1) * 2
        assert r["zip_fst"] == r["plain"]


def test_filtered_fold_equals_prefiltered_pipeline(pairs):
    """filtered(fold, cond) over the full stream == the same fold over the
    pre-filtered stream (the FILTER-clause law)."""
    cond = F.col("v") > 3
    fused = MapReduce(
        assign=Assign(keys={"k": "label"}, values={"v": "v"}),
        reduce=FoldReduce({"s": folds.filtered(
            folds.sum_("v", dtype="bigint"), cond)}),
    ).run(pairs)
    prefiltered = MapReduce(
        unpack=Filter(F.col("v") > 3),
        assign=Assign(keys={"k": "label"}, values={"v": "v"}),
        reduce=FoldReduce({"s": folds.sum_("v", dtype="bigint")}),
    ).run(pairs)
    a = {r["k"]: r["s"] for r in fused.collect()}
    b = {r["k"]: r["s"] for r in prefiltered.collect()}
    # fused keeps keys whose every row fails cond (sum NULL); prefiltered
    # drops them — equal on the surviving keys, the law modulo key presence
    assert {k: v for k, v in a.items() if v is not None} == b


def test_distinct_split_rewrite(spark):
    """count_distinct × collect_set triggers the compiler's distinct-
    splitting rewrite: no Expand in the plan, and results (including
    NULL-key groups) equal the single-agg plan's."""
    data = [(None if i % 10 == 0 else chr(65 + i % 3), i % 7, i % 5)
            for i in range(200)]
    df = spark.createDataFrame(data, "label string, p int, v int")
    mr = MapReduce(
        assign=Assign(keys={"k": "label"}, values={"p": "p", "v": "v"}),
        reduce=FoldReduce({
            "nd": folds.count_distinct("p"),
            "nd2": folds.count_distinct("v").map(lambda c: c * 10),
            "s": folds.sum_("v", dtype="bigint"),
            "st": folds.collect_set("v", dtype="array<int>").map(
                lambda c: F.array_join(F.sort_array(c), ","),
                pandas_post=lambda xs: ",".join(map(str, xs))),
        }),
    )
    out = mr.run(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    # oracle: the same folds forced down the one-agg plan
    kv = df.select(F.col("label").alias("k"), "p", "v")
    expected = kv.groupBy("k").agg(
        F.countDistinct("p").alias("nd"),
        (F.countDistinct("v") * 10).alias("nd2"),
        F.sum("v").alias("s"),
        F.array_join(F.sort_array(F.collect_set("v")), ",").alias("st"),
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want
    assert any(r[0] is None for r in got)  # null key group survived the join


def test_distinct_split_global_agg(spark):
    """The split also works with NO grouping keys (global fold → crossJoin
    of two 1-row frames)."""
    df = spark.createDataFrame([(i % 7, i % 5) for i in range(100)], "p int, v int")
    mr = MapReduce(
        assign=Assign(keys={}, values={"p": "p", "v": "v"}),
        reduce=FoldReduce({
            "nd": folds.count_distinct("p"),
            "lst": folds.collect_set("v", dtype="array<int>").map(
                lambda c: F.size(c), pandas_post=len),
        }),
    )
    r = _one(mr.run(df))
    assert r["nd"] == 7 and r["lst"] == 5
