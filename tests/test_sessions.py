"""Edge-semantics tests for the event-time operators in operators/sessions.py
(gap sessionization, tumbling/hopping buckets, distributed merge-asof).

The sf0.01 oracle parity test covers bulk correctness; these pin the
boundary cases an oracle diff can miss when the data never exercises them:
exact-timestamp ties in the as-of join, probes before any build row, and
the gap boundary (> gap starts a session, == gap does not).
"""

import datetime as dt

from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.operators import sessions


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_sessionize_gap_boundary_exclusive(spark):
    # gap=60s: a row exactly 60s after the previous row stays in the same
    # session; 61s starts a new one.
    df = spark.createDataFrame(
        [
            ("u", 1, _ts("2024-01-01 00:00:00")),
            ("u", 2, _ts("2024-01-01 00:01:00")),  # +60s  -> same session
            ("u", 3, _ts("2024-01-01 00:02:01")),  # +61s  -> new session
        ],
        "user_id string, event_id int, ts timestamp",
    )
    out = sessions.sessionize(df, "user_id", "ts", 60, "event_id")
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_asof_join_exact_tie_and_no_match(spark):
    probe = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 00:00:00")),  # before any build -> null
            (2, "u", _ts("2024-01-01 00:10:00")),  # exact tie -> sees 10.0
            (3, "u", _ts("2024-01-01 00:30:00")),  # after both -> newest (20.0)
            (4, "v", _ts("2024-01-01 00:30:00")),  # key with no build -> null
        ],
        "event_id int, user_id string, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 00:10:00"), 10.0),
            ("u", _ts("2024-01-01 00:20:00"), 20.0),
        ],
        "user_id string, ts timestamp, purchase_value double",
    )
    out = sessions.asof_join(
        probe, build, key="user_id", ts_col="ts",
        value_cols=["purchase_value"], probe_tiebreak="event_id",
    )
    got = {r.event_id: r.asof_purchase_value for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: 20.0, 4: None}
    # left-join contract: every probe row survives exactly once
    assert out.count() == probe.count()


def test_asof_join_null_timestamps_and_tiebreak_validation(spark):
    """SQL semantics: a NULL ts never satisfies b.ts <= p.ts / >= p.ts —
    NULL-ts probe rows carry NULL (both directions) and NULL-ts build
    rows match nothing; a non-numeric tiebreak fails loudly instead of
    being silently cast-to-NULL."""
    import pytest

    probe = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 00:15:00")),
            (2, "u", None),  # NULL probe ts -> NULL carry both directions
        ],
        "event_id int, user_id string, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 00:10:00"), 10.0),
            ("u", _ts("2024-01-01 00:20:00"), 20.0),
            ("u", None, 99.0),  # NULL build ts matches nothing
        ],
        "user_id string, ts timestamp, purchase_value double",
    )
    back = sessions.asof_join(
        probe, build, key="user_id", ts_col="ts",
        value_cols=["purchase_value"], probe_tiebreak="event_id",
    )
    assert {r.event_id: r.asof_purchase_value for r in back.collect()} == {
        1: 10.0,
        2: None,
    }
    fwd = sessions.asof_join_forward(
        probe, build, key="user_id", ts_col="ts",
        value_cols=["purchase_value"], probe_tiebreak="event_id",
    )
    assert {r.event_id: r.next_purchase_value for r in fwd.collect()} == {
        1: 20.0,
        2: None,
    }
    with pytest.raises(TypeError, match="must be numeric"):
        sessions.asof_join(
            probe, build, key="user_id", ts_col="ts",
            value_cols=["purchase_value"], probe_tiebreak="user_id",
        )


def test_tumbling_and_hopping_alignment(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 05:59:59"),)], "ts timestamp"
    )
    tumb = df.select(sessions.tumbling_window("ts", 3600).alias("w")).first().w
    assert tumb == _ts("2024-01-01 05:00:00")
    hops = df.select(
        F.explode(sessions.hopping_windows("ts", 3600, 900)).alias("w")
    ).orderBy("w").collect()
    assert [r.w for r in hops] == [
        _ts("2024-01-01 05:00:00"),
        _ts("2024-01-01 05:15:00"),
        _ts("2024-01-01 05:30:00"),
        _ts("2024-01-01 05:45:00"),
    ]


def test_top_n_and_median_small(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 5)] + [("b", 9, 7.0)],
        "event_type string, event_id int, value double",
    )
    top = sessions.top_n_per_group(df, "event_type", "value", "event_id", 2)
    assert {(r.event_type, r.rank, r.value) for r in top.collect()} == {
        ("a", 1, 4.0), ("a", 2, 3.0), ("b", 1, 7.0)
    }
    med = sessions.lower_median_per_group(df, "event_type", "value", "event_id")
    assert {(r.event_type, r.median_value) for r in med.collect()} == {
        ("a", 2.0), ("b", 7.0)
    }


def test_compact_bursts_semantics(spark):
    """K8: a rapid burst collapses to one row carrying the FIRST event;
    a gap larger than gap_seconds opens a new burst; singletons pass
    through with n_events=1."""
    from datetime import datetime, timedelta

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        compact_bursts,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: burst of 3 within 10s, then a lone event 1h later
        (1, 1, t0, "error", 5.0),
        (2, 1, t0 + timedelta(seconds=5), "error", 6.0),
        (3, 1, t0 + timedelta(seconds=10), "error", 7.0),
        (4, 1, t0 + timedelta(hours=1), "click", 1.0),
        # user 2: single event
        (5, 2, t0, "view", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["user_id"], r["burst_id"]): r
        for r in compact_bursts(
            df, key="user_id", ts_col="ts", tiebreak="event_id",
            gap_seconds=60, carry_cols=["event_id", "event_type", "value"],
        ).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    b = got[(1, 1)]
    assert b["n_events"] == 3 and b["first_event_id"] == 1
    assert b["first_event_type"] == "error" and b["first_value"] == 5.0
    assert b["burst_end"] - b["burst_start"] == timedelta(seconds=10)
    assert got[(1, 2)]["n_events"] == 1 and got[(1, 2)]["first_event_id"] == 4
    assert got[(2, 1)]["n_events"] == 1 and got[(2, 1)]["first_event_id"] == 5


def test_top_n_ascending_null_order_values_rank_last(spark):
    """ADVICE r4: the map-side pandas cap puts NULL/NaN order values
    LAST for both sort directions (na_position default); the downstream
    window must agree (asc_nulls_last / desc_nulls_last) or the cap can
    drop a row the window would rank into the top n. Ascending with a
    NULL value in a single partition exercises exactly that path."""
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 3.0), ("a", 3, 1.0), ("a", 4, 2.0)],
        "event_type string, event_id int, value double",
    ).repartition(1)
    top = sessions.top_n_per_group(
        df, "event_type", "value", "event_id", 2, descending=False
    )
    assert {(r.event_type, r.rank, r.value) for r in top.collect()} == {
        ("a", 1, 1.0),
        ("a", 2, 2.0),
    }


def test_eventtime_policy_tolerance_boundary_inclusive(spark):
    """F3 combined policy boundary semantics: an event EXACTLY
    tolerance_seconds behind the high-water mark is KEPT (predicate is
    >= hwm - tol) and clamped; one microsecond later it drops. The
    running mark advances on receipt — a dropped event's own ts can
    never set the mark (it is always below it by construction)."""
    from azure_iot_realtime_data_pipeline_spark.operators.eventtime import (
        eventtime_policy,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(us):
        return t0 + dt.timedelta(microseconds=us)

    m = 1_000_000
    rows = [
        (1, 1, ts(100 * m)),           # sets hwm = 100 s
        (2, 1, ts(40 * m)),            # exactly 60 s behind -> kept, clamped
        (3, 1, ts(40 * m - 1)),        # 60 s + 1 µs behind -> dropped
        (4, 1, ts(150 * m)),           # advances hwm to 150 s
        (5, 1, ts(90 * m)),            # exactly 60 s behind new hwm -> kept
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: r.adjusted_ts
        for r in eventtime_policy(df, tolerance_seconds=60).collect()
    }
    assert set(got) == {1, 2, 4, 5}
    assert got[2] == ts(100 * m)
    assert got[5] == ts(150 * m)


def test_time_weighted_avg_hand_computed(spark):
    # key "u": v=10 holds for 10s, v=20 holds for 20s, v=99 has no
    # successor (weight 0) -> TWA = (10*10 + 20*20)/30 = 16.6667;
    # key "v": single observation -> span 0, twa NULL.
    df = spark.createDataFrame(
        [
            ("u", 1, _ts("2024-01-01 00:00:00"), 10.0),
            ("u", 2, _ts("2024-01-01 00:00:10"), 20.0),
            ("u", 3, _ts("2024-01-01 00:00:30"), 99.0),
            ("v", 4, _ts("2024-01-01 00:00:00"), 42.0),
        ],
        "user_id string, event_id int, ts timestamp, value double",
    )
    out = sessions.time_weighted_avg(df, "user_id", "ts", "value", "event_id")
    got = {r.user_id: r for r in out.collect()}
    assert got["u"].n_obs == 3
    assert got["u"].span_us == 30_000_000
    assert got["u"].twa_value == 16.6667
    assert got["v"].n_obs == 1
    assert got["v"].span_us == 0
    assert got["v"].twa_value is None


def test_gap_fill_exact_hits_midpoint_and_duplicate_ts(spark):
    # obs at 00:00 (v=10) and 02:00 (v=30); 1-h grid -> ticks 00/01/02.
    # 00:00 is an exact hit (locf=interp=10); 01:00 interpolates the
    # midpoint 20; 02:00 is the LAST observation (forward neighbor
    # absent -> interp falls back to locf=30). A duplicate-ts pair at
    # 02:00 must collapse to the max-tiebreak row (v=30, not v=7).
    df = spark.createDataFrame(
        [
            ("u", 1, _ts("2024-01-01 00:00:00"), 10.0),
            ("u", 2, _ts("2024-01-01 02:00:00"), 7.0),
            ("u", 3, _ts("2024-01-01 02:00:00"), 30.0),
        ],
        "user_id string, event_id int, ts timestamp, value double",
    )
    out = sessions.gap_fill(df, "user_id", "ts", "value", "event_id", 3600)
    got = {r.tick.isoformat(): (r.locf_value, r.interp_value) for r in out.collect()}
    assert got == {
        "2024-01-01T00:00:00": (10.0, 10.0),
        "2024-01-01T01:00:00": (10.0, 20.0),
        "2024-01-01T02:00:00": (30.0, 30.0),
    }


def test_gap_fill_no_aligned_tick_inside_span(spark):
    # span (00:30 -> 00:50) contains no aligned hourly tick: the grid
    # is empty and the operator returns zero rows, not an error
    # (F.sequence with start > stop would throw without the guard).
    df = spark.createDataFrame(
        [
            ("u", 1, _ts("2024-01-01 00:30:00"), 1.0),
            ("u", 2, _ts("2024-01-01 00:50:00"), 2.0),
        ],
        "user_id string, event_id int, ts timestamp, value double",
    )
    out = sessions.gap_fill(df, "user_id", "ts", "value", "event_id", 3600)
    assert out.count() == 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50_000),  # offset seconds
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_gap_fill_matches_naive_reference(spark, rows):
    """K10 property test: for arbitrary small single-key series
    (duplicate timestamps included), the operator's (tick, locf,
    interp) equals a naive Python reference computing the same
    dedup/grid/carry/interp rules with the identical double
    arithmetic."""
    import math

    step = 3_600
    data = [("u", i + 1, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=t), float(v))
            for i, (t, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "user_id string, event_id int, ts timestamp, value double"
    )
    out = sessions.gap_fill(df, "user_id", "ts", "value", "event_id", step)
    got = {
        int(r.tick.timestamp()): (r.locf_value, r.interp_value) for r in out.collect()
    }

    base = int(_ts("2024-01-01 00:00:00").replace(tzinfo=dt.timezone.utc).timestamp())
    by_t: dict[int, tuple[int, float]] = {}
    for i, (t, v) in enumerate(rows):
        eid = i + 1
        if t not in by_t or eid > by_t[t][0]:
            by_t[t] = (eid, float(v))
    obs = sorted((t, v) for t, (eid, v) in by_t.items())
    t0, t1 = obs[0][0], obs[-1][0]
    first = math.ceil(t0 / step) * step
    last = math.floor(t1 / step) * step
    want = {}
    for tick in range(first, last + 1, step):
        prev = max((t, v) for t, v in obs if t <= tick)
        nxts = [(t, v) for t, v in obs if t > tick]
        locf = prev[1]
        if not nxts:
            interp = locf
        else:
            nt, nv = min(nxts)
            frac = float((tick - prev[0]) * 1_000_000) / float((nt - prev[0]) * 1_000_000)
            interp = locf + (nv - locf) * frac
        want[base + tick] = (locf, math.floor(interp * 10000.0 + 0.5) / 10000.0)
    assert got == want


def test_rate_of_change_counter_reset_and_zero_gap(spark):
    """K11: increase -> delta/dt; decrease -> counter reset (delta =
    raw new value); duplicate timestamp -> NULL (no elapsed time);
    first event -> NULL."""
    df = spark.createDataFrame(
        [
            ("u", 1, _ts("2024-01-01 00:00:00"), 10.0),
            ("u", 2, _ts("2024-01-01 00:00:10"), 30.0),   # +20 over 10s -> 2.0
            ("u", 3, _ts("2024-01-01 00:00:20"), 5.0),    # reset -> 5/10 -> 0.5
            ("u", 4, _ts("2024-01-01 00:00:20"), 7.0),    # dt=0 -> NULL
        ],
        "user_id string, event_id int, ts timestamp, value double",
    )
    out = {r.event_id: r.rate_per_sec for r in sessions.rate_of_change(
        df, "user_id", "ts", "value", "event_id"
    ).collect()}
    assert out == {1: None, 2: 2.0, 3: 0.5, 4: None}


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # offset seconds
            st.floats(min_value=0, max_value=500, allow_nan=False, width=16),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_time_weighted_avg_matches_naive_reference(spark, rows):
    """K9 property test: for arbitrary single-key series (duplicate
    timestamps included), (n_obs, span_us, twa) equals a naive Python
    reference using the same cents-exact accumulation and final
    floor-rounded division."""
    import math

    data = [
        ("u", i + 1, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=t), float(v))
        for i, (t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id string, event_id int, ts timestamp, value double"
    )
    r = sessions.time_weighted_avg(df, "user_id", "ts", "value", "event_id").collect()[0]

    # naive: sort by (t, id); weighted sum of cents * dt_us
    seq = sorted((t, i + 1, float(v)) for i, (t, v) in enumerate(rows))
    wsum = 0
    for (t0, _, v0), (t1, _, _) in zip(seq, seq[1:]):
        cents = int(math.floor(v0 * 100.0 + 0.5))
        wsum += cents * (t1 - t0) * 1_000_000
    span_us = (seq[-1][0] - seq[0][0]) * 1_000_000
    assert r.n_obs == len(rows)
    assert r.span_us == span_us
    if span_us == 0:
        assert r.twa_value is None
    else:
        want = math.floor((wsum / 100.0) / float(span_us) * 10000.0 + 0.5) / 10000.0
        assert r.twa_value == want


def test_gap_fill_null_values_do_not_shift_anchors(spark):
    """A NULL measurement must not advance the interpolation anchors:
    with obs (0h, 10), (1h, NULL), (2h, 30), the 1h tick interpolates
    the true midpoint 20 between the non-null neighbors (keeping the
    NULL row would anchor prev_ep at 1h and yield 10)."""
    df = spark.createDataFrame(
        [
            ("u", 1, _ts("2024-01-01 00:00:00"), 10.0),
            ("u", 2, _ts("2024-01-01 01:00:00"), None),
            ("u", 3, _ts("2024-01-01 02:00:00"), 30.0),
        ],
        "user_id string, event_id int, ts timestamp, value double",
    )
    out = sessions.gap_fill(df, "user_id", "ts", "value", "event_id", 3600)
    got = {r.tick.isoformat(): (r.locf_value, r.interp_value) for r in out.collect()}
    assert got["2024-01-01T01:00:00"] == (10.0, 20.0)


def test_asof_tolerance_nulls_stale_matches(spark):
    """K12: a match older than the tolerance nulls the carried value
    but keeps the age for alerting; fresh matches carry through; no
    match leaves both NULL."""
    probe = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),  # 1h after build -> fresh
            (2, "u", _ts("2024-01-03 10:00:00")),  # 2d after build -> stale
            (3, "v", _ts("2024-01-01 10:00:00")),  # no build -> both NULL
        ],
        "event_id int, user_id string, ts timestamp",
    )
    build = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:00:00"), 10.0)],
        "user_id string, ts timestamp, purchase_value double",
    )
    out = {
        r.event_id: (r.asof_purchase_value, r.asof_age_us)
        for r in sessions.asof_join_tolerance(
            probe, build, "user_id", "ts", ["purchase_value"], "event_id", 86400
        ).collect()
    }
    assert out[1] == (10.0, 3_600_000_000)
    assert out[2] == (None, 176_400_000_000)
    assert out[3] == (None, None)


def test_ewma_validates_alpha_and_skips_nulls(spark):
    import pytest as _pytest

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import ewma_per_key

    with _pytest.raises(ValueError):
        ewma_per_key(None, "k", "t", "v", "i", alpha=0.0)
    with _pytest.raises(ValueError):
        ewma_per_key(None, "k", "t", "v", "i", alpha=1.5)
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, 10.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 2, None),   # skipped, not zero
        (1, dt.datetime(2024, 1, 1, 0, 0, 2), 3, 20.0),
        (2, dt.datetime(2024, 1, 1), 4, None),            # all-NULL key: no row
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["user_id"]: r for r in ewma_per_key(df, "user_id", "ts", "value", "event_id", alpha=0.5).collect()}
    assert set(out) == {1}
    assert out[1]["n_events"] == 2
    assert out[1]["ewma"] == 15.0  # 0.5*20 + 0.5*10, NULL skipped


def test_mad_is_robust_to_one_extreme(spark):
    """An injected 2.4e305 outlier (the reference's stuck-sensor double,
    preview-output-example.json:13) must not move the MAD, while the
    stddev it pairs against explodes."""
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        mad_per_group,
    )

    base = [("a", i, float(v)) for i, v in enumerate([10, 12, 11, 13, 9, 11, 10])]
    spiked = base + [("a", 99, 2.4e305)]
    cols = ["event_type", "event_id", "value"]
    clean = mad_per_group(spark.createDataFrame(base, cols), "event_type", "value", "event_id").collect()[0]
    dirty = mad_per_group(spark.createDataFrame(spiked, cols), "event_type", "value", "event_id").collect()[0]
    assert clean["mad"] == 1.0
    assert dirty["mad"] == 1.0          # unmoved by the outlier
    assert dirty["median_value"] == 11.0


def test_trend_recovers_known_slope_and_degenerate_nulls(spark):
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        trend_per_group,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 'lin': value climbs exactly 5.0 per day -> slope 5.0, corr 1.0
    for d in range(10):
        rows.append(("lin", base + dt.timedelta(days=d), 100.0 + 5.0 * d))
    # 'flat': constant value -> corr undefined (NULL), slope 0
    for d in range(5):
        rows.append(("flat", base + dt.timedelta(days=d), 42.0))
    # 'one': single point -> zero time span -> both NULL
    rows.append(("one", base, 7.0))
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {r["event_type"]: r for r in trend_per_group(df, "event_type", "ts", "value").collect()}
    assert out["lin"]["slope_per_day"] == 5.0 and out["lin"]["corr"] == 1.0
    assert out["flat"]["slope_per_day"] == 0.0 and out["flat"]["corr"] is None
    assert out["one"]["slope_per_day"] is None and out["one"]["corr"] is None


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50_000),  # offset seconds
            st.one_of(
                st.none(),
                st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_ewma_matches_naive_reference(spark, rows):
    """K13 property test: for arbitrary single-key series (duplicate
    timestamps and NULLs included) the fold equals a naive Python
    recurrence over the same (ts, id) order with identical doubles."""
    import math

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import ewma_per_key

    data = [
        ("u", i + 1, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=t),
         None if v is None else float(v))
        for i, (t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id string, event_id int, ts timestamp, value double"
    )
    out = ewma_per_key(df, "user_id", "ts", "value", "event_id", alpha=0.3).collect()
    ordered = sorted(
        ((t, i + 1, v) for i, (t, v) in enumerate(rows) if v is not None),
    )
    if not ordered:
        assert out == []
        return
    level = None
    for _, _, v in ordered:
        v = float(v)
        level = v if level is None else 0.3 * v + 0.7 * level
    want = math.floor(level * 10000.0 + 0.5) / 10000.0
    assert len(out) == 1
    assert out[0]["n_events"] == len(ordered)
    assert out[0]["ewma"] == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50_000),  # offset seconds
            st.one_of(
                st.none(),
                st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_holt_matches_naive_reference(spark, rows):
    """K18 property test: for arbitrary single-key series (duplicate
    timestamps and NULLs included) the struct fold equals a naive
    Python Holt recurrence over the same (ts, id) order with identical
    doubles — the same duplicated l' subtree, same op order."""
    import math

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import holt_per_key

    data = [
        ("u", i + 1, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=t),
         None if v is None else float(v))
        for i, (t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id string, event_id int, ts timestamp, value double"
    )
    out = holt_per_key(
        df, "user_id", "ts", "value", "event_id", alpha=0.3, gamma=0.2
    ).collect()
    ordered = sorted(
        ((t, i + 1, v) for i, (t, v) in enumerate(rows) if v is not None),
    )
    if not ordered:
        assert out == []
        return
    level, trend = None, 0.0
    for _, _, v in ordered:
        v = float(v)
        if level is None:
            level, trend = v, 0.0
        else:
            nl = 0.3 * v + 0.7 * (level + trend)
            nb = 0.2 * ((0.3 * v + 0.7 * (level + trend)) - level) + (0.8 * trend)
            level, trend = nl, nb
    r4 = lambda x: math.floor(x * 10000.0 + 0.5) / 10000.0
    assert len(out) == 1
    assert out[0]["n_events"] == len(ordered)
    assert out[0]["level"] == r4(level)
    assert out[0]["trend"] == r4(trend)
    assert out[0]["forecast"] == r4(level + trend)


def test_holt_validates_params(spark):
    import pytest as _pytest

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import holt_per_key

    with _pytest.raises(ValueError):
        holt_per_key(None, "k", "t", "v", "i", alpha=0.0)
    with _pytest.raises(ValueError):
        holt_per_key(None, "k", "t", "v", "i", gamma=1.5)


def test_ewma_drops_nan_like_the_streaming_twin(spark):
    """Review regression: NaN measurements (distinct from NULL) must be
    dropped by the batch fold — Arrow hands the streaming twin NULL
    doubles as NaN, so the batch contract matches what the twin can
    honor."""
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import ewma_per_key

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, 10.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 2, float("nan")),
        (1, dt.datetime(2024, 1, 1, 0, 0, 2), 3, 20.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = ewma_per_key(df, "user_id", "ts", "value", "event_id", alpha=0.5).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 2
    assert out[0]["ewma"] == 15.0


def test_data_profile_handles_hostile_column_names(spark):
    """Review regression: double-underscore and quote-bearing column
    names must profile cleanly (metric labels travel beside the
    expressions, never parsed out of alias strings)."""
    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        data_profile,
    )

    df = spark.createDataFrame(
        [(1, None), (2, 3.0)], ["device__id", "o'value"]
    )
    out = {
        (r["col_name"], r["metric"]): r["value"]
        for r in data_profile(
            df, distinct_cols=("device__id",), numeric_cols=("o'value",)
        ).collect()
    }
    assert out[("rows", "rows")] == 2.0
    assert out[("device__id", "nulls")] == 0.0
    assert out[("o'value", "nulls")] == 1.0
    assert out[("device__id", "distinct")] == 2.0
    assert out[("o'value", "min")] == 3.0


def test_cusum_closed_form_matches_naive_recurrence(spark):
    """K15: the prefix-sum identity must equal the textbook clamped
    recurrence s_i = max(0, s_{i-1} + x_i - target - slack), including a
    mid-series downward excursion that resets the statistic."""
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import cusum_per_key

    base = dt.datetime(2024, 1, 1)
    xs = [12.0, 15.0, 8.0, 2.0, 1.0, 14.0, 16.0, 18.0]
    rows = [("k", base + dt.timedelta(seconds=i), i, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = cusum_per_key(
        df, "user_id", "ts", "value", "event_id", target=10.0, slack=0.0, threshold=7.0
    ).collect()[0]
    s, mx, alarms = 0.0, 0.0, 0
    for v in xs:
        s = max(0.0, s + v - 10.0)
        mx = max(mx, s)
        if s > 7.0:
            alarms += 1
    assert out["final_cusum"] == s
    assert out["max_cusum"] == mx
    assert out["n_alarms"] == alarms
    assert out["n"] == len(xs)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=16,
    )
)
def test_cusum_closed_form_matches_naive_on_arbitrary_series(spark, rows):
    """K15 property test: the prefix-sum identity equals the clamped
    recurrence on arbitrary series (duplicate timestamps included),
    computed over the same integer micro-units."""
    import math

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import cusum_per_key

    data = [
        ("k", i + 1, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=t), float(v))
        for i, (t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id string, event_id int, ts timestamp, value double"
    )
    out = cusum_per_key(
        df, "user_id", "ts", "value", "event_id", target=2.0, slack=1.0, threshold=5.0
    ).collect()[0]
    ordered = sorted((t, i + 1, v) for i, (t, v) in enumerate(rows))
    s_mu, mx_mu, alarms = 0, 0, 0
    for _, _, v in ordered:
        d = math.floor(float(v) * 1_000_000 + 0.5) - 3_000_000
        s_mu = max(0, s_mu + d)
        mx_mu = max(mx_mu, s_mu)
        if s_mu > 5_000_000:
            alarms += 1
    assert out["n"] == len(rows)
    assert out["final_cusum"] == math.floor(s_mu / 1e6 * 10000 + 0.5) / 10000
    assert out["max_cusum"] == math.floor(mx_mu / 1e6 * 10000 + 0.5) / 10000
    assert out["n_alarms"] == alarms


def test_audience_overlap_ignores_null_users_and_hostile_profile_names(spark):
    """Review regressions: NULL users must not collapse into one phantom
    user that fabricates intersections (matches the oracle's
    null-rejecting join); backslash-bearing column names must profile
    without corrupting the literal."""
    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        audience_overlap,
        data_profile,
    )

    rows = [(None, "view"), (None, "buy"), (7, "view")]
    df = spark.createDataFrame(rows, "user_id int, event_type string")
    assert audience_overlap(df, "user_id", "event_type").collect() == []

    df2 = spark.createDataFrame([(1.0,)], ["a\\b"])
    out = {(r["col_name"], r["metric"]): r["value"]
           for r in data_profile(df2, numeric_cols=("a\\b",)).collect()}
    assert out[("a\\b", "nulls")] == 0.0
    assert out[("a\\b", "min")] == 1.0


def test_benford_digit_extraction_boundaries(spark):
    """J49: boundary magnitudes must not shift digits (the floor(log10)
    trap this operator avoids by construction): 1000.0 -> 1,
    999.99 -> 9, 1.0 -> 1; sub-1 and NULL values are excluded."""
    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        benford_profile,
    )

    rows = [
        ("t", 1000.0), ("t", 999.99), ("t", 1.0), ("t", 0.5), ("t", None),
        ("t", 10.0), ("t", 95.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["digit"]: r["n"] for r in benford_profile(df, "event_type", "value").collect()}
    assert out == {1: 3, 9: 2}  # 1000, 1, 10 -> digit 1; 999.99, 95 -> 9


def test_state_durations_locf_semantics(spark):
    """K16: a state holds until the NEXT event; the final event's state
    is open and contributes nothing; single-event keys emit no row."""
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        state_durations,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "ok"),
        (1, base + dt.timedelta(seconds=10), 2, "alarm"),
        (1, base + dt.timedelta(seconds=25), 3, "ok"),
        (1, base + dt.timedelta(seconds=30), 4, "alarm"),  # open -> dropped
        (2, base, 5, "ok"),                                # single event
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    out = {
        (r["user_id"], r["state"]): (r["n_intervals"], r["total_seconds"])
        for r in state_durations(df, "user_id", "ts", "event_type", "event_id").collect()
    }
    assert out == {(1, "ok"): (2, 15.0), (1, "alarm"): (1, 15.0)}


def test_sustained_alarms_debounce_semantics(spark):
    """K17: runs break on any at-or-below event; only runs of >=
    min_events emit; NULL never extends a run."""
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        sustained_alarms,
    )

    base = dt.datetime(2024, 1, 1)
    vals = [99.0, 98.0, 97.0, 10.0, 95.0, 94.0, None, 93.0, 92.0, 91.0]
    rows = [(1, base + dt.timedelta(seconds=i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = sustained_alarms(
        df, "user_id", "ts", "value", "event_id", threshold=50.0, min_events=3
    ).collect()
    # runs: [99,98,97] emits; [95,94] broken by NULL (too short);
    # [93,92,91] emits
    got = {(r["n_events"], r["peak_value"]) for r in out}
    assert got == {(3, 99.0), (3, 93.0)}


def test_gini_known_distributions(spark):
    """L22: perfectly even values -> 0; total concentration approaches
    (n-1)/n; negative input raises."""
    import pytest as _pytest

    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        gini_per_group,
    )

    rows = [("even", i, 5.0) for i in range(4)] + [
        ("conc", 0, 0.0), ("conc", 1, 0.0), ("conc", 2, 0.0), ("conc", 3, 100.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "event_id", "value"])
    out = {r["event_type"]: r["gini"] for r in gini_per_group(df, "event_type", "value", "event_id").collect()}
    assert out["even"] == 0.0
    assert out["conc"] == 0.75  # (n-1)/n at n=4
    bad = spark.createDataFrame([("g", 1, -1.0)], ["event_type", "event_id", "value"])
    with _pytest.raises(Exception, match="non-negative"):
        gini_per_group(bad, "event_type", "value", "event_id").collect()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=14,
    )
)
def test_state_durations_matches_naive_reference(spark, rows):
    """K16 property test: LOCF interval totals equal a naive reference
    over arbitrary series (duplicate timestamps resolved by the same
    (ts, id) order)."""
    from collections import defaultdict

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        state_durations,
    )

    data = [
        ("k", i + 1, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=t), s)
        for i, (t, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id string, event_id int, ts timestamp, event_type string"
    )
    got = {
        (r["state"],): (r["n_intervals"], r["total_seconds"])
        for r in state_durations(df, "user_id", "ts", "event_type", "event_id").collect()
    }
    ordered = sorted((t, i + 1, s) for i, (t, s) in enumerate(rows))
    want: dict = defaultdict(lambda: [0, 0])
    for (t0, _, s0), (t1, _, _) in zip(ordered, ordered[1:]):
        want[(s0,)][0] += 1
        want[(s0,)][1] += t1 - t0
    assert got == {k: (n, float(tot)) for k, (n, tot) in want.items()}

def test_scd2_versions_intervals_and_current_flag(spark):
    """K20: consecutive duplicates collapse, NULL attributes version
    null-safely, intervals chain exactly, only the last version per key
    is current."""
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        scd2_history,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, 1, t(0), "a"),
        (2, 1, t(1), "a"),      # duplicate -> collapses
        (3, 1, t(2), None),     # a -> NULL is a change
        (4, 1, t(3), None),     # NULL -> NULL collapses (null-safe)
        (5, 1, t(4), "b"),
        (6, 2, t(0), "x"),      # single-event key: one open version
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, attr string"
    )
    out = sorted(
        (
            (r["user_id"], r["version"], r["attr"],
             r["valid_from"].minute,
             None if r["valid_to"] is None else r["valid_to"].minute,
             r["is_current"])
            for r in scd2_history(df, "user_id", "ts", "attr", "event_id").collect()
        )
    )
    assert out == [
        (1, 1, "a", 0, 2, False),
        (1, 2, None, 2, 4, False),
        (1, 3, "b", 4, None, True),
        (2, 1, "x", 0, None, True),
    ]

def test_availability_gap_accounting(spark):
    """K21: a 10-h silence at a 6-h threshold counts whole as downtime;
    sub-threshold gaps don't; single-event keys have NULL availability."""
    import datetime as dt

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        availability_per_key,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(hours=1)),            # 1h gap: fine
        (3, 1, t0 + dt.timedelta(hours=11)),           # 10h gap: down
        (4, 1, t0 + dt.timedelta(hours=12)),
        (5, 2, t0),                                     # single event
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["user_id"]: r for r in availability_per_key(df, "user_id", "ts", "event_id", 21600).collect()}
    assert out[1]["span_seconds"] == 12 * 3600.0
    assert out[1]["downtime_seconds"] == 10 * 3600.0
    assert out[1]["availability"] == round(1 - 10 / 12, 6)
    assert out[2]["availability"] is None and out[2]["span_seconds"] == 0.0

@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=40_000),  # gap seconds
        min_size=1,
        max_size=15,
    )
)
def test_availability_matches_naive_reference(spark, gaps):
    """K21 property test: for an arbitrary single-key gap sequence the
    operator equals a naive Python accounting — whole gaps above the
    threshold as downtime, integer-microsecond arithmetic."""
    import math

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        availability_per_key,
    )

    thresh_s = 7200
    t = _ts("2024-01-01 00:00:00")
    times = [t]
    for g in gaps:
        t = t + dt.timedelta(seconds=g)
        times.append(t)
    rows = [(i + 1, 1, ts) for i, ts in enumerate(times)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = availability_per_key(df, "user_id", "ts", "event_id", thresh_s).collect()
    span = sum(gaps)
    down = sum(g for g in gaps if g > thresh_s)
    r4 = lambda x: math.floor(x * 10000.0 + 0.5) / 10000.0
    assert len(out) == 1
    assert out[0]["n_events"] == len(times)
    assert out[0]["span_seconds"] == r4(float(span))
    assert out[0]["downtime_seconds"] == r4(float(down))
    if span > 0:
        want = math.floor((1.0 - down * 1e6 / (span * 1e6)) * 1e6 + 0.5) / 1e6
        assert out[0]["availability"] == want
    else:
        assert out[0]["availability"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=60),  # lifespans in days
        min_size=1,
        max_size=12,
    )
)
def test_survival_matches_naive_km(spark, lifespans):
    """L33 property test: arbitrary lifespan multisets — the curve
    equals a naive Python Kaplan-Meier with the identical
    left-to-right double product."""
    import math
    from collections import Counter

    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        survival_curve,
    )

    t0 = _ts("2024-01-01 00:00:00")
    rows = []
    for uid, d in enumerate(lifespans):
        rows.append((uid * 10 + 1, uid, t0))
        rows.append((uid * 10 + 2, uid, t0 + dt.timedelta(days=d)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["t_days"]: (r["deaths"], r["at_risk"], r["survival"])
        for r in survival_curve(df, "user_id", "ts").collect()
    }
    counts = Counter(lifespans)
    n = len(lifespans)
    cum = 0
    prod = 1.0
    want = {}
    for t in sorted(counts):
        d = counts[t]
        at_risk = n - cum
        prod = prod * (1.0 - d / (n - cum))
        cum += d
        want[t] = (d, at_risk, math.floor(prod * 1e6 + 0.5) / 1e6)
    assert got == want

def test_scd2_enrich_reserved_columns_and_shuffle_path(spark):
    """Review regression (K22): facts carrying a reserved column raise
    loudly; the broadcast_dim=False path returns identical rows via the
    shuffle hash join."""
    import datetime as dt

    import pytest as _pytest

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        scd2_enrich,
        scd2_history,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, 1, t(0), "a"),
        (2, 1, t(2), "b"),
        (3, 1, t(4), "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, attrv string"
    )
    dim = scd2_history(ev, "user_id", "ts", "attrv", "event_id")
    facts = ev.select("event_id", "user_id", "ts")
    bc = {
        r["event_id"]: (r["attr"], r["version"])
        for r in scd2_enrich(facts, dim, "user_id", "ts").collect()
    }
    sh = {
        r["event_id"]: (r["attr"], r["version"])
        for r in scd2_enrich(
            facts, dim, "user_id", "ts", broadcast_dim=False
        ).collect()
    }
    assert bc == sh == {1: ("a", 1), 2: ("b", 2), 3: ("b", 2)}
    with _pytest.raises(ValueError, match="reserved column"):
        scd2_enrich(
            facts.withColumn("version", facts["event_id"]), dim, "user_id", "ts"
        )



def test_throttle_per_key_caps_each_window(spark):
    """K24: at most n rows per (key, aligned window), earliest kept,
    deterministic tie-break; quiet keys pass untouched."""
    from datetime import datetime

    from azure_iot_realtime_data_pipeline_spark.operators.sessions import (
        throttle_per_key,
    )

    rows = []
    for i in range(10):  # chatty: 10 events in one minute
        rows.append(("hot", i, datetime(2026, 1, 1, 0, 0, i)))
    rows.append(("hot", 99, datetime(2026, 1, 1, 0, 10, 0)))  # next window
    rows.append(("quiet", 7, datetime(2026, 1, 1, 0, 0, 30)))
    rows.append(("hot", 55, None))  # no event time: cannot be bucketed
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")
    kept = throttle_per_key(
        df, "user_id", "ts", "event_id", n_per_window=3, window_seconds=600
    ).collect()
    hot = sorted(r.event_id for r in kept if r.user_id == "hot")
    assert hot == [0, 1, 2, 99]  # first 3 of window 1, the 1 of window 2;
    # the NULL-ts row is excluded (matches the streaming twin's contract)
    assert [r.event_id for r in kept if r.user_id == "quiet"] == [7]
