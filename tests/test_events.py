import datetime as dt

from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.events import session_agg, sliding_agg, tumbling_agg


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


EVENTS = [
    (1, _ts(5), 10, "click", 1.0, "{}"),
    (2, _ts(20), 10, "click", 2.0, "{}"),
    (3, _ts(65), 10, "view", 3.0, "{}"),   # second hour
    (4, _ts(10), 20, "click", 4.0, "{}"),
    (5, _ts(55), 20, "click", 5.0, "{}"),  # 45min gap -> new session for u20
]
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_tumbling(spark):
    df = spark.createDataFrame(EVENTS, COLS)
    out = {
        (r["window_start"].minute + r["window_start"].hour * 60): (
            r["n_events"],
            float(r["sum_value"]),
        )
        for r in tumbling_agg(df, "1 hour").collect()
    }
    assert out[0] == (4, 12.0)  # events at minutes 5,10,20,55
    assert out[60] == (1, 3.0)  # event at minute 65


def test_sliding_counts(spark):
    df = spark.createDataFrame(EVENTS, COLS)
    out = {}
    for r in sliding_agg(df, "1 hour", "30 minutes").collect():
        ws = r["window_start"]
        key = (ws.day, ws.hour * 60 + ws.minute)
        out[key] = r["n_events"]
    # each event lands in exactly 2 windows (duration/slide = 2)
    assert out == {
        (31, 1410): 3,  # [23:30, 00:30) prev day: events 5,10,20
        (1, 0): 4,      # [00:00, 01:00): 5,10,20,55
        (1, 30): 2,     # [00:30, 01:30): 55,65
        (1, 60): 1,     # [01:00, 02:00): 65
    }


def test_sessions_gap(spark):
    df = spark.createDataFrame(EVENTS, COLS)
    rows = session_agg(df, "30 minutes").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["n_events"]))
    # user 10: events at 5,20 merge (15min gap); 65 is separate (45min gap)
    u10 = sorted(by_user[10])
    assert len(u10) == 2 and u10[0][1] == 2 and u10[1][1] == 1
    # user 20: 10 and 55 -> two sessions (45min gap >= 30min)
    u20 = sorted(by_user[20])
    assert len(u20) == 2


def test_rollup_cascade_matches_direct(spark):
    """Each cascaded grain must equal aggregating raw directly at that
    grain (counts and decimal sums are exactly re-aggregable)."""
    from dbscan_pyspark_spark.operators.events import rollup_cascade

    df = spark.createDataFrame(EVENTS, COLS)
    got = {
        (r["grain"], r["window_start"]): (r["n_events"], float(r["sum_value"]))
        for r in rollup_cascade(df, ("1 minute", "1 hour", "1 day")).collect()
    }
    for dur in ("1 minute", "1 hour", "1 day"):
        direct = {
            (dur, r["window_start"]): (r["n_events"], float(r["sum_value"]))
            for r in tumbling_agg(df, dur).collect()
        }
        assert {k: v for k, v in got.items() if k[0] == dur} == direct


def test_funnel_strict_ordering(spark):
    from dbscan_pyspark_spark.operators.events import funnel

    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # user 2: purchase BEFORE click -> reaches step 2 only
        (2, "2024-01-01 09:00:00", "view"),
        (2, "2024-01-01 09:30:00", "click"),
        (2, "2024-01-01 09:10:00", "purchase"),
        # user 3: never viewed -> reaches nothing
        (3, "2024-01-01 08:00:00", "click"),
        (3, "2024-01-01 08:05:00", "purchase"),
        # user 4: simultaneous view+click (strict > excludes), then click
        (4, "2024-01-01 07:00:00", "view"),
        (4, "2024-01-01 07:00:00", "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_type"]: (r["step"], r["n_users"])
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": (1, 3), "click": (2, 2), "purchase": (3, 1)}


def test_cohort_retention_triangle(spark):
    from dbscan_pyspark_spark.operators.events import cohort_retention

    rows = [
        # user 1: first week 2024-01-01 (Mon), active weeks 0 and 2
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-04 10:00:00"),  # same week, distinct-reduced
        (1, "2024-01-16 10:00:00"),
        # user 2: first week 2024-01-08, active weeks 0 and 1
        (2, "2024-01-08 00:00:00"),
        (2, "2024-01-15 00:00:01"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_funnel_user_times_null_propagation(spark):
    from dbscan_pyspark_spark.operators.events import funnel_user_times

    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        (2, "2024-01-01 09:00:00", "view"),  # view only
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["user_id"]: (r["t1"] is not None, r["t2"] is not None, r["t3"] is not None)
        for r in funnel_user_times(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: (True, True, True), 2: (True, False, False)}


def test_funnel_repeated_step_types(spark):
    """Steps may repeat a type: ['click','click'] requires two clicks in
    strictly increasing time order."""
    from dbscan_pyspark_spark.operators.events import funnel

    rows = [
        (1, "2024-01-01 10:00:00", "click"),
        (1, "2024-01-01 10:05:00", "click"),
        (2, "2024-01-01 09:00:00", "click"),  # only one click
        (3, "2024-01-01 08:00:00", "click"),  # two simultaneous clicks:
        (3, "2024-01-01 08:00:00", "click"),  # strict > rejects the 2nd
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["step"]: r["n_users"] for r in funnel(ev, ["click", "click"]).collect()}
    assert out == {1: 3, 2: 1}


def test_transition_counts_small_fixture(spark):
    from dbscan_pyspark_spark.operators.events import transition_counts

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: view -> click -> buy
        (1, t0, 1, "view"), (2, t0 + dt.timedelta(seconds=1), 1, "click"),
        (3, t0 + dt.timedelta(seconds=2), 1, "buy"),
        # user 2: view -> click
        (4, t0, 2, "view"), (5, t0 + dt.timedelta(seconds=1), 2, "click"),
        # user 3: single event, no transitions
        (6, t0, 3, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["share"])
        for r in transition_counts(df).collect()
    }
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("click", "buy")] == (1, round(1 / 3, 6))
    assert len(out) == 2


def test_transition_counts_ties_break_on_event_id(spark):
    from dbscan_pyspark_spark.operators.events import transition_counts

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    # same timestamp: event_id orders the pair deterministically
    df = spark.createDataFrame(
        [(10, t0, 1, "a"), (11, t0, 1, "b")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = transition_counts(df).collect()
    assert [(r["prev_type"], r["next_type"]) for r in out] == [("a", "b")]


def test_scd2_intervals_basic(spark):
    import datetime as dt

    from dbscan_pyspark_spark.operators.events import scd2_intervals

    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        (1, t(0), 1, "bronze"), (2, t(10), 1, "bronze"),  # unchanged repeat
        (3, t(20), 1, "gold"), (4, t(30), 1, "bronze"),   # back-and-forth
        (5, t(0), 2, "silver"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, tier string"
    )
    out = sorted(
        scd2_intervals(
            df, "user_id", "ts", ["tier"], order_cols=("event_id",)
        ).collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    assert [(r["user_id"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out] == [
        (1, "bronze", t(0), t(20), False),
        (1, "gold", t(20), t(30), False),
        (1, "bronze", t(30), None, True),
        (2, "silver", t(0), None, True),
    ]


def test_scd2_intervals_null_attr_runs(spark):
    import datetime as dt

    from dbscan_pyspark_spark.operators.events import scd2_intervals

    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        (1, t(0), 1, None), (2, t(10), 1, None),   # null run extends
        (3, t(20), 1, "a"), (4, t(30), 1, None),   # null is a new state
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, tier string"
    )
    out = sorted(
        scd2_intervals(
            df, "user_id", "ts", ["tier"], order_cols=("event_id",)
        ).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["tier"], r["valid_from"]) for r in out] == [
        (None, t(0)), ("a", t(20)), (None, t(30))
    ]


def test_scd2_no_dedup_keeps_every_row(spark):
    import datetime as dt

    from dbscan_pyspark_spark.operators.events import scd2_intervals

    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    df = spark.createDataFrame(
        [(1, t(0), 1, "x"), (2, t(10), 1, "x")],
        "event_id long, ts timestamp, user_id long, tier string",
    )
    out = scd2_intervals(
        df, "user_id", "ts", ["tier"], order_cols=("event_id",),
        dedup_unchanged=False,
    ).collect()
    assert len(out) == 2


def test_merge_intervals_gaps_and_islands(spark):
    import datetime as dt

    from dbscan_pyspark_spark.operators.events import merge_intervals

    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(minutes=s)
    rows = [
        # user 1: [0,10] + [5,15] overlap; [15,20] touches -> one island;
        # [30,40] separate
        (1, t(0), t(10)), (1, t(5), t(15)), (1, t(15), t(20)), (1, t(30), t(40)),
        # user 2: nested interval [0,60] ⊃ [10,20] -> one island
        (2, t(0), t(60)), (2, t(10), t(20)),
    ]
    df = spark.createDataFrame(rows, "user_id long, s timestamp, e timestamp")
    out = sorted(
        merge_intervals(df, "user_id", "s", "e").collect(),
        key=lambda r: (r["user_id"], r["island"]),
    )
    assert [
        (r["user_id"], r["island"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in out
    ] == [
        (1, 1, t(0), t(20), 3),
        (1, 2, t(30), t(40), 1),
        (2, 1, t(0), t(60), 2),
    ]


def test_resample_ffill_dense_grid(spark):
    import datetime as dt

    from dbscan_pyspark_spark.operators.events import resample_ffill

    t = lambda m: dt.datetime(2026, 1, 1) + dt.timedelta(minutes=m)
    rows = [
        (1, t(0), 10.0),
        (1, t(2), 12.0),   # same 5-min bucket as t(0): last wins
        (1, t(17), 20.0),  # gap of 2 buckets to fill
        (2, t(5), 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = sorted(
        resample_ffill(df, "k", "ts", ["v"], step="5 minutes").collect(),
        key=lambda r: (r["k"], r["bucket_ts"]),
    )
    got = [(r["k"], r["bucket_ts"], r["v"]) for r in out]
    assert got == [
        (1, t(0), 12.0),   # last of bucket
        (1, t(5), 12.0),   # filled
        (1, t(10), 12.0),  # filled
        (1, t(15), 20.0),
        (2, t(5), 5.0),
    ]


def test_resample_ffill_avg_mode(spark):
    import datetime as dt

    from dbscan_pyspark_spark.operators.events import resample_ffill

    t = lambda m: dt.datetime(2026, 1, 1) + dt.timedelta(minutes=m)
    df = spark.createDataFrame(
        [(1, t(0), 10.0), (1, t(1), 20.0)], "k long, ts timestamp, v double"
    )
    out = resample_ffill(df, "k", "ts", ["v"], step="5 minutes", agg="avg").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, 15.0)]


def test_scd2_null_ts_first_row_does_not_split_run(spark):
    from dbscan_pyspark_spark.operators.events import scd2_intervals

    df = spark.createDataFrame(
        [(1, None, 1, "a"), (2, 10, 1, "a"), (3, 20, 1, "b")],
        "event_id long, ts long, k long, attr string",
    )
    out = scd2_intervals(df, "k", "ts", ["attr"], order_cols=("event_id",)).collect()
    # one 'a' run (starting at the null-ts row) and one 'b' run
    assert sorted(r["attr"] for r in out) == ["a", "b"]
