from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("MRF_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MEDIUM = os.environ.get("MRF_TEST_SF_DIR_MEDIUM", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from map_reduce_folds_spark.session import get_spark

    spark = get_spark(app_name="mrf-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from map_reduce_folds_spark.sources import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con
