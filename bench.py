"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() over the result — no
collect of wide payloads, matching how a cluster job terminates in a
sink). Times include Catalyst planning but not session startup.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and records
the MEDIAN — single-run numbers on a shared host drift +-15% round to
round (round 7's "+12% regression" was pure host variance and cost an
A/B investigation); the medians are what BASELINE.md comparisons should
read. "value" is the sum of medians; "total_wall_all_runs" keeps the
full wall for the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from dbscan_pyspark_spark.operators.dbscan import dbscan  # noqa: E402
from dbscan_pyspark_spark.operators.dedup import minhash_near_dup_pairs  # noqa: E402
from dbscan_pyspark_spark.operators.eps_join import core_points  # noqa: E402
from dbscan_pyspark_spark.operators.events import session_agg  # noqa: E402
from dbscan_pyspark_spark.operators.similarity import cosine_topk  # noqa: E402
from dbscan_pyspark_spark.session import get_session  # noqa: E402
from dbscan_pyspark_spark.sources.tables import (  # noqa: E402
    load_table,
    points_from_customer,
    points_from_lineitem,
)
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_session("bench")

    # JVM warmup: one tiny job per physical-operator family (parquet
    # scan, shuffle agg, broadcast join, window) so the first timed
    # query doesn't absorb one-time class-loading + whole-stage-codegen
    # compilation (~3 s measured — session startup cost, not query cost).
    from pyspark.sql import Window

    warm = load_table(spark, sf_dir, "region")
    warm.join(
        F.broadcast(warm.select("r_regionkey")), "r_regionkey"
    ).groupBy("r_name").agg(F.count(F.lit(1))).count()
    spark.range(1000).select(
        F.row_number().over(Window.orderBy("id")).alias("rn")
    ).agg(F.sum("rn")).count()

    qdefs = entrymod.queries()

    def run_entry_query(name):
        return lambda: qdefs[name](spark, sf_dir).count()

    benches = {
        # scan + agg throughput (TPC-H Q1 shape)
        "q1_pricing_summary": run_entry_query("q1_pricing_summary"),
        # multi-join + agg
        "nation_revenue": run_entry_query("nation_revenue"),
        # window top-k over the fact table
        "topk_per_order": run_entry_query("topk_lineitems_per_order"),
        # grid eps-join core points on the customer point cloud
        "eps_core_points": lambda: core_points(
            points_from_customer(spark, sf_dir), 3.0, 4
        ).count(),
        # full DBSCAN on the lineitem point cloud (the reference's
        # documented failure mode at 1/60 of this scale)
        "dbscan_lineitem": lambda: dbscan(
            points_from_lineitem(spark, sf_dir), eps=2.0, min_pts=16
        ).count(),
        # minhash-LSH near-dup over documents
        "minhash_near_dups": lambda: minhash_near_dup_pairs(
            load_table(spark, sf_dir, "documents"),
            threshold=0.3,
        ).count(),
        # brute-force cosine top-k
        "embedding_topk": run_entry_query("embedding_cosine_topk"),
        # sessionization over events
        "events_sessions": lambda: session_agg(
            load_table(spark, sf_dir, "events"), "30 minutes"
        ).count(),
        # as-of temporal join (merge-scan window formulation)
        "events_asof": run_entry_query("events_asof_error"),
        # winnowing rolling-hash fingerprints (k-gram explode + window min)
        "winnow_fingerprints": run_entry_query("doc_winnow_fingerprints"),
    }

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    t_wall0 = time.time()
    for name, fn in benches.items():
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.time()
            try:
                fn()
                runs.append(round(time.time() - t0, 3))
            except Exception as e:  # record failures as negative sentinel
                print(f"bench {name} failed: {e}", file=sys.stderr)
                runs.append(-1.0)
                break
        all_runs[name] = runs
        if any(t < 0 for t in runs):
            times[name] = -1.0
        else:
            times[name] = sorted(runs)[len(runs) // 2]

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "runs_per_query": n_runs,
                "all_runs": all_runs,
                "total_wall_all_runs": round(time.time() - t_wall0, 3),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
