"""Ports of the reference's two benchmark workloads (bench/MapReduce.hs)
as differential tests at the reference's own N=100,000.

Task 1 (bench/MapReduce.hs:47-65): 100k (label, value) pairs, label in
'A'..'Z', value in 1..100; filter even → group by label → mean.
Task 2 (bench/MapReduce.hs:280-306): 100k sparse records — A in 1..100,
B = A mod 47, C = A mod 13 present only when A is even; keep rows having
C → group by C → mean(A+B).

Data is generated deterministically (hash arithmetic, not rand()) so the
python oracle sees the exact same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_folds_spark import Assign, Filter, FoldReduce, MapReduce, folds

N = 100_000


@pytest.fixture(scope="module")
def task1(spark):
    # label = 'A' + (id*2654435761 mod 26), value = 1 + (id*40503 mod 100)
    df = spark.range(N).select(
        F.char(F.lit(65) + (F.col("id") * 2654435761) % 26).alias("label"),
        (F.lit(1) + (F.col("id") * 40503) % 100).alias("value"),
    )
    return df.cache()


def test_task1_mean_by_label(spark, task1):
    mr = MapReduce(
        unpack=Filter("value % 2 = 0"),
        assign=Assign(keys={"label": "label"}, values={"v": "value"}),
        reduce=FoldReduce({
            "mean_v": folds.Fold.zip(folds.sum_("v"), folds.count_(),
                                     combine=lambda s, n: s / n),
            "n": folds.count_(),
        }),
    )
    got = {r.label: (r.mean_v, r.n) for r in mr.run(task1).collect()}

    # direct oracle (bench/MapReduce.hs:68-77), python
    acc: dict[str, list] = {}
    for i in range(N):
        label = chr(65 + (i * 2654435761) % 26)
        value = 1 + (i * 40503) % 100
        if value % 2 == 0:
            s = acc.setdefault(label, [0, 0])
            s[0] += value
            s[1] += 1
    exp = {k: (s / n, n) for k, (s, n) in acc.items()}
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k][1] == exp[k][1]
        assert got[k][0] == pytest.approx(exp[k][0], rel=1e-12)


def test_task2_sparse_mean(spark):
    df = spark.range(N).select(
        (F.lit(1) + (F.col("id") * 2654435761) % 100).alias("a"),
    ).select(
        "a", (F.col("a") % 47).alias("b"),
        F.when(F.col("a") % 2 == 0, F.col("a") % 13).alias("c"),
    )
    mr = MapReduce(
        unpack=Filter(F.col("c").isNotNull()),
        assign=Assign(keys={"c": "c"}, values={"ab": F.col("a") + F.col("b")}),
        reduce=FoldReduce({
            "mean_ab": folds.Fold.zip(folds.sum_("ab"), folds.count_(),
                                      combine=lambda s, n: s / n),
            "n": folds.count_(),
        }),
    )
    got = {r.c: (r.mean_ab, r.n) for r in mr.run(df).collect()}

    acc: dict[int, list] = {}
    for i in range(N):
        a = 1 + (i * 2654435761) % 100
        if a % 2 == 0:
            c = a % 13
            s = acc.setdefault(c, [0, 0])
            s[0] += a + (a % 47)
            s[1] += 1
    exp = {c: (s / n, n) for c, (s, n) in acc.items()}
    assert got == {c: (pytest.approx(m), n) for c, (m, n) in exp.items()} or \
        all(got[c][1] == exp[c][1] and abs(got[c][0] - exp[c][0]) < 1e-9 for c in exp)
