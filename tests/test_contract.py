"""The driver-contract gate as a pytest: every queries() entry vs its
DuckDB oracle at sf0.001 (fast).  tools/check_contract.py runs the same
comparison at sf0.01 — this test exists so a plain `pytest` run catches
query/oracle drift immediately."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR


def _params():
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    return sorted(entrymod.queries().keys()), oracles


QUERY_NAMES, ORACLES = _params()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    from tools.check_contract import compare

    fn = entrymod.queries()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only (no oracle) — covered by recall tests")
    duck_pdf = duck.sql(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"k", "sum_price"}
