"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, compares row count, column names, and an
order-insensitive value hash (rows sorted, values stringified).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def canon(val):
    """Emulate the DRIVER's pandas stringify canonicalizer exactly.

    The driver sorts rows via pandas and hashes str() values, so:
    - list/array/map/struct values CRASH it (unhashable in factorize)
      -> raise here too, so local green predicts driver green;
    - Decimals stringify WITH their scale ('1.5000' != '1.5') -> keep
      them verbatim, never float round-trip;
    - -0.0 stringifies as '-0.0' != '0.0' -> no normalization here
      (queries must normalize on both engine sides instead).
    The previous int-casting canon masked all three classes
    (CORRECTNESS_r02: 6 driver reds invisible locally).
    """
    import datetime

    if val is None:
        return "NULL"
    if isinstance(val, (list, tuple, set, dict)):
        raise TypeError(
            f"unhashable contract value {type(val).__name__}: the driver "
            "canonicalizer crashes on array/map/struct columns"
        )
    if hasattr(val, "__array__") and not isinstance(val, (str, bytes)):
        raise TypeError(
            "unhashable contract value ndarray: the driver canonicalizer "
            "crashes on array columns"
        )
    if isinstance(val, datetime.datetime):
        # pandas Timestamp and datetime str() agree: micros shown only
        # when nonzero — both engines return datetime objects here
        return str(val)
    return str(val)


def frame_sig(cols, rows):
    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    import hashlib

    h = hashlib.md5("\n".join(canon_rows).encode()).hexdigest()
    return sorted_cols, h, canon_rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from dbscan_pyspark_spark.session import get_session

    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt_spark = time.time() - t0
        if name not in oracles:
            # the driver canonicalizes rows-only outputs too (r2:
            # kmember_clusters crashed it) — so crash-check them here
            try:
                frame_sig(scols, [tuple(r) for r in srows])
            except TypeError as e:
                print(f"FAIL  {name}: CANON-CRASH (driver would red): {e}")
                n_fail += 1
                continue
            print(f"rows-only  {name}: {len(srows)} rows  ({dt_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            ores = con.sql(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        dt_duck = time.time() - t0

        try:
            sc, sh, srows_c = frame_sig(scols, [tuple(r) for r in srows])
            oc, oh, orows_c = frame_sig(ocols, orows)
        except TypeError as e:
            print(f"FAIL  {name}: CANON-CRASH (driver would red): {e}")
            n_fail += 1
            continue
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT {len(srows)} vs {len(orows)}")
        if sc != oc:
            status.append(f"SCHEMA {sc} vs {oc}")
        if sh != oh:
            status.append("HASH")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}  (spark {dt_spark:.1f}s duck {dt_duck:.1f}s)")
            if "HASH" in status and len(srows) == len(orows):
                diff_s = [r for r in srows_c if r not in set(orows_c)][:3]
                diff_o = [r for r in orows_c if r not in set(srows_c)][:3]
                print(f"      spark-only: {diff_s}")
                print(f"      duck-only:  {diff_o}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows  (spark {dt_spark:.1f}s duck {dt_duck:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
