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


@pytest.fixture(scope="module")
def query_frames(spark, entry):
    # plan construction only (iterative queries do run their driver
    # loops once here at sf0.001); built once, shared by the tests
    return {name: fn(spark, SF_DIR) for name, fn in entry.queries().items()}


@pytest.mark.slow
def test_query_and_oracle_columns_match(query_frames, entry, duck):
    oracles = entry.oracle_sql()
    mismatches = {}
    for name, sdf in query_frames.items():
        if name in oracles:
            ocols = [
                r[0] for r in duck.sql(f"DESCRIBE {oracles[name]}").fetchall()
            ]
            if sorted(sdf.columns) != sorted(ocols):
                mismatches[name] = (sorted(sdf.columns), sorted(ocols))
    assert not mismatches, mismatches


def test_contract_outputs_are_scalar_and_decimal_free(query_frames):
    """The driver's pandas canonicalizer CRASHES on array/map/struct
    values (unhashable in factorize — CORRECTNESS_r02: kmember_clusters,
    embedding_pca) and stringifies decimals WITH scale, which never
    matches DuckDB's double rendering (r1 events_error_context, r2
    events_sessions). Every contract output column must therefore be a
    scalar, non-decimal type."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    bad = {}
    for name, sdf in query_frames.items():
        offenders = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType))
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, bad


@pytest.mark.slow
def test_oracle_output_types_are_portable(entry, duck):
    """DESCRIBE every oracle and reject output types the driver's
    pandas fetch mangles: DuckDB types any integer sum() as HUGEINT,
    which pandas coerces to float64 so '99111.0' != '99111' under
    stringify (CORRECTNESS_r03: events_props_extract,
    priority_linestatus_counts); DECIMAL stringifies with scale; LIST/
    STRUCT/MAP crash the canonicalizer. Every oracle output column must
    be a plain scalar type — wrap integer sums in CAST(... AS BIGINT)."""
    oracles = entry.oracle_sql()
    bad = {}
    for name, sql in oracles.items():
        offenders = [
            f"{col}:{typ}"
            for col, typ, *_ in duck.sql(f"DESCRIBE ({sql})").fetchall()
            if "HUGEINT" in typ or "DECIMAL" in typ or "[]" in typ
            or "STRUCT" in typ or "MAP" in typ
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, bad


def test_rotation_wastes_no_checked_slot(entry):
    """The driver oracles the FIRST 50 queries() entries. Invariants
    (round-7 amended rule — rows-only entries rotate like everything
    else, they just can't displace changed/new oracled queries):
    (a) a rows-only query may occupy a window slot ONLY while it has
    no green driver record, and must sit BEHIND every oracled
    not-yet-green entry; (b) an oracled not-yet-green query may sit
    outside the window ONLY when the window is already saturated with
    oracled not-yet-green entries (i.e. it will rotate in next round,
    nothing green is wasting its slot)."""
    import __spark_entry__ as m

    names = list(entry.queries())
    oracles = entry.oracle_sql()
    window = names[:50]
    rows_only_in_window = [n for n in window if n not in oracles]
    # (a) only not-yet-green rows-only entries may burn a slot...
    greened = [n for n in rows_only_in_window if n in m._ROWS_ONLY_GREEN]
    assert not greened, greened
    # ...and each sits behind every oracled not-yet-green entry
    oracled_nongreen_pos = [
        i for i, n in enumerate(names)
        if n in oracles and n not in m._DRIVER_CHECKED_GREEN
    ]
    if rows_only_in_window and oracled_nongreen_pos:
        first_rows_only = names.index(rows_only_in_window[0])
        assert first_rows_only > max(oracled_nongreen_pos), (
            f"rows-only {rows_only_in_window[0]} sits ahead of a "
            "changed/new oracled query"
        )
    displaced = [
        n for n in names[50:]
        if n in oracles and n not in m._DRIVER_CHECKED_GREEN
    ]
    if displaced:
        wasted = [
            n for n in window
            if n in m._DRIVER_CHECKED_GREEN or n in m._ROWS_ONLY_GREEN
        ]
        assert not wasted, (
            f"already-green {wasted} occupy checked slots while "
            f"{displaced} wait outside the window"
        )
