import datetime as dt

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
