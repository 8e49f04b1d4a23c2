"""Driver-contract schema gate (fast — no query execution).

The driver's correctness compare sorts columns BY NAME before hashing,
so a Spark/oracle column-name mismatch fails even with identical
values. This test builds every ``queries()`` DataFrame (plan only) and
DESCRIBEs every ``oracle_sql()`` statement in DuckDB, asserting the
column sets match, before any expensive value comparison ever runs.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_every_oracle_key_has_a_query(entry):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))


def test_entry_returns_rows(spark, entry):
    df = entry.entry(spark)
    assert len(df.columns) > 0
    assert df.limit(1).count() == 1


def test_query_and_oracle_columns_match(spark, entry, duck):
    qs, oracles = entry.queries(), entry.oracle_sql()
    mismatches = {}
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR)  # plan construction only
        if name in oracles:
            ocols = [
                r[0] for r in duck.sql(f"DESCRIBE {oracles[name]}").fetchall()
            ]
            if sorted(sdf.columns) != sorted(ocols):
                mismatches[name] = (sorted(sdf.columns), sorted(ocols))
    assert not mismatches, mismatches
