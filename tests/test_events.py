"""Event-stream operators: tumbling windows, sessionization,
dedup-to-latest, JSON props — checked against hand-computed pandas
oracles on a deterministic fixture."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from sparkval.pipeline.events import (
    extract_props,
    latest_event_per_user,
    session_stats_per_user,
    sessionize,
    tumbling_window_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(i, minutes, user, etype="click", value=1.0, k=7):
    return (i, T0 + dt.timedelta(minutes=minutes), user, etype, value, '{"k": %d}' % k)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap of 45 min between idx 2 and 3)
        _ev(0, 0, 1), _ev(1, 10, 1), _ev(2, 20, 1),
        _ev(3, 65, 1), _ev(4, 70, 1),
        # user 2: one session, exactly 30-min gaps (30 min is NOT > 30)
        _ev(5, 0, 2, "view", 2.5, 3), _ev(6, 30, 2, "view", 2.5, 3),
        _ev(7, 60, 2, "view", 2.5, 3),
        # user 3: single event
        _ev(8, 90, 3, "error", -1.0, 11),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_sessionize_gap_semantics(spark, events):
    s = {(r["user_id"], r["session_seq"]): r["n_events"] for r in sessionize(events, 30).collect()}
    assert s == {(1, 1): 3, (1, 2): 2, (2, 1): 3, (3, 1): 1}


def test_session_stats_per_user(spark, events):
    got = {r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_s"])
           for r in session_stats_per_user(events, 30).collect()}
    assert got == {1: (2, 5, 20 * 60), 2: (1, 3, 60 * 60), 3: (1, 1, 0)}


def test_latest_event_per_user(spark, events):
    got = {r["user_id"]: r["event_id"] for r in latest_event_per_user(events).collect()}
    assert got == {1: 4, 2: 7, 3: 8}


def test_tumbling_window_counts(spark, events):
    out = tumbling_window_counts(events, "1 hour").collect()
    by_key = {(r["window_start"].minute, r["window_start"].hour, r["event_type"]): r["n_events"]
              for r in out}
    # hour 0: 3 clicks (user1) + 2 views (user2); hour 1: 2 clicks + 1 view + 1 error
    assert by_key[(0, 0, "click")] == 3
    assert by_key[(0, 0, "view")] == 2
    assert by_key[(0, 1, "click")] == 2
    assert by_key[(0, 1, "view")] == 1
    assert by_key[(0, 1, "error")] == 1
    # windows are epoch-aligned: minute component always 0
    assert all(k[0] == 0 for k in by_key)


def test_extract_props_typed(spark, events):
    got = extract_props(events, keys=("k", "missing")).select("event_id", "prop_k", "prop_missing")
    rows = {r["event_id"]: (r["prop_k"], r["prop_missing"]) for r in got.collect()}
    assert rows[0] == (7, None)
    assert rows[5] == (3, None)


def test_sessionize_partition_parity(spark, events):
    """Session assignment is shuffle-order independent (window spec
    orders within user partitions)."""
    a = sessionize(events.repartition(1), 30).orderBy("user_id", "session_seq").collect()
    b = sessionize(events.repartition(7), 30).orderBy("user_id", "session_seq").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_as_of_join_semantics(spark):
    from sparkval.pipeline.events import as_of_join

    left = spark.createDataFrame(
        [(1, 1, T0 + dt.timedelta(minutes=10)),
         (2, 1, T0 + dt.timedelta(minutes=30)),
         (3, 2, T0 + dt.timedelta(minutes=5)),
         (4, 3, T0)],  # user 3 has no right rows at all
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, T0, 1.0),
         (101, 1, T0 + dt.timedelta(minutes=10), 2.0),   # ties with left @10 -> inclusive
         (102, 1, T0 + dt.timedelta(minutes=20), 3.0),
         (103, 2, T0 + dt.timedelta(minutes=6), 9.0)],   # after user2's click
        "rid long, user_id long, ts timestamp, v double",
    )
    out = {r["event_id"]: (r["rid_right"], r["v_right"])
           for r in as_of_join(left, right, ["user_id"], "ts").collect()}
    assert out[1] == (101, 2.0)   # inclusive tie at ts=10
    assert out[2] == (102, 3.0)   # latest at-or-before 30
    assert out[3] == (None, None) # right row is later -> no match
    assert out[4] == (None, None) # no right rows for key


def test_funnel_steps_strict_order(spark):
    """Funnel semantics: steps must occur in order with strictly
    increasing timestamps; same-instant later steps don't count;
    users outside the funnel are absent."""
    from datetime import datetime as dt

    from sparkval.pipeline.events import funnel_steps

    rows = [
        # u1: full funnel in order
        (1, 1, dt(2024, 1, 1, 10, 0), "view"),
        (2, 1, dt(2024, 1, 1, 10, 5), "click"),
        (3, 1, dt(2024, 1, 1, 10, 9), "purchase"),
        # u2: click before view -> only the view counts
        (4, 2, dt(2024, 1, 1, 9, 0), "click"),
        (5, 2, dt(2024, 1, 1, 9, 30), "view"),
        # u3: click at the SAME instant as view -> strict > blocks it
        (6, 3, dt(2024, 1, 1, 8, 0), "view"),
        (7, 3, dt(2024, 1, 1, 8, 0), "click"),
        (8, 3, dt(2024, 1, 1, 8, 1), "purchase"),  # wrong step next -> ignored
        # u4: irrelevant events only -> absent from output
        (9, 4, dt(2024, 1, 1, 7, 0), "error"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = funnel_steps(ev, ["view", "click", "purchase"]).toPandas().set_index("user_id")
    assert out.loc[1, "steps_completed"] == 3
    assert out.loc[1, "completed_at"] == dt(2024, 1, 1, 10, 9)
    assert out.loc[2, "steps_completed"] == 1
    assert out.loc[3, "steps_completed"] == 1
    assert 4 not in out.index
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_steps(ev, [])
