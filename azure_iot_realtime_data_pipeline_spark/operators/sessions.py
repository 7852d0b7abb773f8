"""Event-time analytics operators beyond the reference surface: gap
sessionization, tumbling/hopping window aggregation, as-of join, and
top-n per group.

The reference's only windowing is the trailing 60-s anomaly frame
(reference stream-analytics/iot-stream-analytics-query.sql:33-44) and its
dashboard groups by raw (deviceId, enqueuedTime)
(reference docs/Power_BI_Dashboard.png, README.MD:182). A standalone
analytics engine over the same telemetry needs the standard event-time
toolkit; each operator here is the batch form of a Structured-Streaming
idiom (``F.window`` / ``F.session_window`` accept streaming frames
unchanged — the batch query IS the streaming query body).

Scale notes:
- Sessionization is one shuffle on the key (lag + running sum in the same
  window spec — Catalyst plans a single Exchange + Sort, both window
  functions share the frame sort).
- Tumbling/hopping aggregation is a plain hash aggregate on (key, bucket)
  — partial map-side combine applies; hopping fan-out multiplies rows by
  size/slide BEFORE the shuffle, so slide should divide size with a small
  quotient (here 4×).
- The as-of join avoids the O(probe × build) range-join explosion: both
  sides union into ONE dataset sorted per key, and a last-non-null window
  carries the build value forward — one shuffle on the key, linear in
  rows, the classic distributed merge-asof. A range join would re-scan
  the build side per probe row; at 100 TB that is the difference between
  a sort-merge pass and a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.functions.rounding import round_half_up


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str,
) -> DataFrame:
    """Assign gap-based session ids per key: a row starts a new session
    when it arrives more than ``gap_seconds`` after the previous row of
    the same key. Adds ``session_id`` (1-based per key, ordered by time).

    Batch twin of ``F.session_window(ts, gap)``; the explicit lag+cumsum
    form is used because it is expressible in ANSI SQL (oracle-checkable)
    and gives stable integer session ids rather than [start, end) structs.
    """
    ts_sec = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key).orderBy(ts_sec, F.col(tiebreak))
    prev = F.lag(ts_sec).over(w)
    new_session = (
        prev.isNull() | (ts_sec - prev > F.lit(gap_seconds * 1_000_000))
    ).cast("long")
    run = Window.partitionBy(key).orderBy(ts_sec, F.col(tiebreak)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(new_session).over(run))


def tumbling_window(ts_col: str, size_seconds: int) -> Column:
    """Epoch-aligned tumbling bucket start (timestamp). Batch twin of
    ``F.window(ts, f"{size} seconds").start`` — computed arithmetically so
    the DuckDB oracle can reproduce it bit-for-bit."""
    start_sec = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(size_seconds * 1_000_000)) * size_seconds
    return F.timestamp_seconds(start_sec)


def hopping_windows(ts_col: str, size_seconds: int, slide_seconds: int) -> Column:
    """Array of the ``size/slide`` epoch-aligned hopping-window starts an
    event belongs to (newest first). Fan-out happens via ``F.explode``
    BEFORE the aggregation shuffle — map-side multiplication, no join."""
    if size_seconds % slide_seconds != 0:
        raise ValueError("slide must divide size")
    hops = size_seconds // slide_seconds
    anchor = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(slide_seconds * 1_000_000)) * slide_seconds
    return F.array(
        *[F.timestamp_seconds(anchor - F.lit(k * slide_seconds)) for k in range(hops)]
    )


def _require_numeric_tiebreak(probe: DataFrame, probe_tiebreak: str) -> None:
    """The union+carry construction casts the probe tiebreak to long for
    the shared sort; a non-numeric column would be silently NULLed by
    that cast and break determinism — fail loudly instead."""
    from pyspark.sql.types import NumericType

    dt = probe.schema[probe_tiebreak].dataType
    if not isinstance(dt, NumericType):
        raise TypeError(
            f"probe_tiebreak {probe_tiebreak!r} must be numeric, got {dt.simpleString()}"
        )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    probe_tiebreak: str,
) -> DataFrame:
    """Distributed merge-asof: for every probe row, the newest build row
    of the same key with ``build.ts <= probe.ts``.

    Both sides are unioned with a side marker, sorted per key by
    (ts, side) — build rows sort BEFORE probe rows at equal timestamps,
    so an exact-tie build row is visible to the probe row (>= semantics,
    matching DuckDB's ASOF JOIN) — and a last-non-null window carries each
    build value forward onto subsequent probe rows. One shuffle on the
    key; linear in |probe| + |build|.

    ``build`` must be unique per (key, ts) — pre-dedupe for determinism.
    NULL timestamps: a NULL build ts never matches any probe (SQL
    ``b.ts <= p.ts`` is NULL), so those rows are dropped up front; a
    NULL probe ts matches no build row (it sorts NULLS FIRST, before
    every surviving build row) and carries NULL.
    """
    _require_numeric_tiebreak(probe, probe_tiebreak)
    carried = [f"_asof_{c}" for c in value_cols]
    build = build.filter(F.col(ts_col).isNotNull())
    b = build.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_probe_tb"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
        *[F.lit(None).cast(t.dataType).alias(f"_p_{t.name}") for t in probe.schema],
    )
    p = probe.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.col(probe_tiebreak).cast("long").alias("_probe_tb"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(a) for c, a in zip(value_cols, carried)],
        *[F.col(t.name).alias(f"_p_{t.name}") for t in probe.schema],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_side"), F.col("_probe_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = b.unionByName(p)
    for a in carried:
        merged = merged.withColumn(a, F.last(a, ignorenulls=True).over(w))
    out = merged.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_p_{t.name}").alias(t.name) for t in probe.schema],
        *[F.col(a).alias(f"asof_{c}") for c, a in zip(value_cols, carried)],
    )


def asof_join_forward(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    probe_tiebreak: str,
) -> DataFrame:
    """K4 forward direction: for every probe row, the EARLIEST build row
    of the same key with ``build.ts >= probe.ts`` — "time to next
    purchase" analyses. Same one-shuffle union + carry construction as
    ``asof_join``, scanned in DESCENDING time order: at equal
    timestamps build rows sort first so an exact-tie build is visible
    (>= semantics), and last-non-null carries each build value backward
    onto earlier probe rows. ``build`` must be unique per (key, ts).
    NULL timestamps: NULL build ts rows are dropped (``b.ts >= p.ts``
    never matches); NULL probe ts rows sort NULLS LAST in the
    descending scan — where they would wrongly inherit the key's
    earliest build value — so their carry is explicitly nulled in the
    final projection."""
    _require_numeric_tiebreak(probe, probe_tiebreak)
    carried = [f"_asof_{c}" for c in value_cols]
    build = build.filter(F.col(ts_col).isNotNull())
    b = build.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_probe_tb"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
        *[F.lit(None).cast(t.dataType).alias(f"_p_{t.name}") for t in probe.schema],
    )
    p = probe.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.col(probe_tiebreak).cast("long").alias("_probe_tb"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(a) for c, a in zip(value_cols, carried)],
        *[F.col(t.name).alias(f"_p_{t.name}") for t in probe.schema],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc(), F.col("_probe_tb").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = b.unionByName(p)
    for a in carried:
        merged = merged.withColumn(a, F.last(a, ignorenulls=True).over(w))
    out = merged.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_p_{t.name}").alias(t.name) for t in probe.schema],
        *[
            F.when(F.col(ts_col).isNotNull(), F.col(a)).alias(f"next_{c}")
            for c, a in zip(value_cols, carried)
        ],
    )


def interval_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    window_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """K7: event-interval join — every (probe, build) pair of the same
    key with ``build_ts in [probe_ts, probe_ts + window]`` (e.g. "purchase
    within 1 h of a click").

    Scale shape: the naive plan is an equi-join on `key` + range filter,
    which cross-products per key (a key with n probes and m builds
    materializes n*m pairs before filtering). This form buckets time at
    window width and joins on (key, bucket): the build side replicates
    into its 2 covering buckets MAP-SIDE (explode of a 2-element array),
    the join is a pure equi-join AQE can re-plan, and each pair is
    produced exactly once (the range filter then keeps true matches).
    Cross-product scope shrinks from per-key to per-(key, window-bucket).

    Returned columns: probe columns + build columns suffixed `_b`.

    ``how="left"`` keeps probes with no in-window build row (build
    columns NULL). For a LEFT join the range predicate moves INTO the
    join condition (a post-join filter would delete the NULL rows the
    LEFT join exists to keep); an unmatched probe survives exactly once
    because only the build side is bucket-replicated, and a matched pair
    still appears once (the pair joins only in the probe's bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    w_us = window_seconds * 1_000_000
    p_us = F.unix_micros(F.col(probe_ts))
    b_us = F.unix_micros(F.col(build_ts))
    p = probe.withColumn("_pbucket", F.floor(p_us / F.lit(w_us)))
    b = build.withColumn(
        "_bbucket",
        F.explode(
            F.array(
                F.floor(b_us / F.lit(w_us)),
                F.floor(b_us / F.lit(w_us)) - 1,
            )
        ),
    ).select(
        F.col(key).alias("_bkey"),
        F.col("_bbucket"),
        *[
            F.col(c).alias(f"{c}_b")
            for c in build.columns
            if c != key
        ],
    )
    in_range = (
        F.unix_micros(F.col(f"{build_ts}_b")) >= F.unix_micros(F.col(probe_ts))
    ) & (
        F.unix_micros(F.col(f"{build_ts}_b"))
        <= F.unix_micros(F.col(probe_ts)) + F.lit(w_us)
    )
    cond = (
        (F.col(key) == F.col("_bkey"))
        & (F.col("_pbucket") == F.col("_bbucket"))
        & in_range
    )
    return p.join(b, cond, how).drop("_pbucket", "_bbucket", "_bkey")


def _make_topn_cap_fn(group: str, sort_cols: list[str], ascending: bool, n: int):
    """mapInPandas body: per input PARTITION, keep only each group's n
    best rows under (order, tiebreak) — the map-side partial of top-n
    (picklable closure, Arrow-batched). pandas puts NaN/None last for
    either sort direction (na_position default); the downstream window
    therefore orders NULLS LAST explicitly in BOTH directions so the
    cap can never drop a row the window would rank."""

    def fn(batches):
        import pandas as pd

        state = None
        for pdf in batches:
            state = pdf if state is None else pd.concat(
                [state, pdf], ignore_index=True
            )
            state = (
                state.sort_values(sort_cols, ascending=ascending, kind="stable")
                .groupby(group, sort=False, dropna=False)
                .head(n)
            )
        if state is not None and len(state):
            yield state

    return fn


def top_n_per_group(
    df: DataFrame,
    group: str,
    order_col: str,
    tiebreak: str,
    n: int,
    descending: bool = True,
) -> DataFrame:
    """Top-n rows per group (deterministic tiebreak), two-stage: a
    map-side per-partition cap to each group's n best (Arrow
    `mapInPandas`, narrow — the global top-n is contained in the union
    of per-partition top-ns since the tiebreak makes the order total),
    then the rank window over at most n x partitions rows per group.
    The r3 single-window form sorted each group's ENTIRE partition in
    one task — with a single-digit-cardinality group key (dashboards
    rank per metric type) that is a handful of tasks sorting the whole
    corpus at 100 TB; the cap bounds the shuffle instead."""
    capped = df.mapInPandas(
        _make_topn_cap_fn(group, [order_col, tiebreak], not descending, n),
        df.schema,
    )
    oc = (
        F.col(order_col).desc_nulls_last()
        if descending
        else F.col(order_col).asc_nulls_last()
    )
    tb = (
        F.col(tiebreak).desc_nulls_last()
        if descending
        else F.col(tiebreak).asc_nulls_last()
    )
    w = Window.partitionBy(group).orderBy(oc, tb)
    return (
        capped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .withColumnRenamed("_rn", "rank")
    )


def lower_median_per_group(
    df: DataFrame, group: str, value_col: str, tiebreak: str
) -> DataFrame:
    """Exact lower median per group: the element at 1-based position
    ceil(n/2) under (value, tiebreak) order. Selection, not interpolation
    — the result is an actual data value, so Spark and any ANSI oracle
    agree bit-for-bit (percentile_cont interpolation does not).

    Hot-key note: exact rank selection inherently orders the group's
    full contents in one task — with a low-cardinality group key that
    is the whole corpus through a handful of tasks. This is the EXACT
    form; `analytics.quantile_sketch` (L8) is the bounded-state scale
    path (error <= one bucket width), the same exact-vs-sketch pairing
    as COUNT(DISTINCT) vs the J30 KMV sketch."""
    w = Window.partitionBy(group).orderBy(F.col(value_col), F.col(tiebreak))
    cnt = Window.partitionBy(group)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("_rn") == F.ceil(F.col("_n") / 2))
        .select(F.col(group), F.col(value_col).alias("median_" + value_col))
    )


def compact_bursts(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    gap_seconds: int,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """K8 burst compaction (alarm-storm suppression): coalesce each
    rapid-fire burst per key — consecutive events separated by at most
    ``gap_seconds`` — into ONE row carrying the burst's first event.

    The telemetry classic: a flapping sensor emits hundreds of identical
    alerts in seconds; downstream pages once per burst, not once per
    event. Built on the sessionize gap chain (one shuffle on the key,
    lag + running sum sharing a single window sort), then one
    struct-min aggregate per (key, burst) — the representative and the
    burst envelope come from an aggregate with map-side combine, not a
    second window.

    Returns (key, burst_id, burst_start, burst_end, n_events,
    first_<carry_col>...).
    """
    carry_cols = carry_cols or []
    with_burst = sessionize(df, key, ts_col, gap_seconds, tiebreak).withColumnRenamed(
        "session_id", "_burst"
    )
    # ordering fields get reserved aliases so a carry col that IS the
    # tiebreak (the usual case: carry the event id) never collides
    first = F.min(
        F.struct(
            F.col(ts_col).alias("_o_ts"),
            F.col(tiebreak).alias("_o_tb"),
            *[F.col(c) for c in carry_cols],
        )
    ).alias("_first")
    agg = with_burst.groupBy(key, "_burst").agg(
        F.min(ts_col).alias("burst_start"),
        F.max(ts_col).alias("burst_end"),
        F.count("*").alias("n_events"),
        first,
    )
    return agg.select(
        F.col(key),
        F.col("_burst").alias("burst_id"),
        F.col("burst_start"),
        F.col("burst_end"),
        F.col("n_events"),
        *[F.col(f"_first.{c}").alias(f"first_{c}") for c in carry_cols],
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """K9 time-weighted average per key: LOCF (step-function) weighting —
    each observation's value holds until the next observation, so
    TWA = sum(value_i * dt_i) / (t_last - t_first), the standard
    irregular-telemetry aggregate (a plain AVG over-weights chatty
    periods; the reference's dashboard AVGs raw rows,
    reference docs/Power_BI_Dashboard.png, which is exactly that bias).

    Parity/scale shape: dt comes from ONE lead window per key; the
    weighted sum accumulates in DECIMAL (order-free, engine-exact —
    double summation is accumulation-order-dependent) and only the final
    scalar division casts to double. Window and groupBy share the same
    hash partitioning on the key, so Catalyst plans a single Exchange.
    Keys with one observation (span 0) yield NULL twa.

    Returns (key, n_obs, span_us, twa_value).
    """
    ep = F.unix_micros(F.col(ts_col))
    staged = df.select(
        F.col(key),
        ep.alias("_ep"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
        F.col(tiebreak).alias("_tb"),
    )
    w = Window.partitionBy(key).orderBy(F.col("_ep"), F.col("_tb"))
    dt = F.coalesce(F.lead("_ep").over(w) - F.col("_ep"), F.lit(0)).alias("_dt")
    weighted = staged.select(F.col(key), F.col("_v"), dt)
    agg = weighted.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("_dt").alias("span_us"),
        F.sum(F.col("_v") * F.col("_dt").cast("decimal(20,0)")).alias("_wsum"),
    )
    twa = F.when(
        F.col("span_us") > 0,
        round_half_up(F.col("_wsum").cast("double") / F.col("span_us").cast("double")),
    )
    return agg.select(
        F.col(key),
        F.col("n_obs"),
        F.col("span_us"),
        twa.alias("twa_value"),
    )


def gap_fill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    step_seconds: int,
) -> DataFrame:
    """K10 gap-fill / resample: project each key's irregular series onto
    a regular epoch-aligned grid between its first and last observation,
    emitting both LOCF (last-observation-carried-forward) and linear
    interpolation at every tick — the time_bucket_gapfill + locf +
    interpolate trio of every time-series store, absent from Spark.

    Construction (ONE shuffle on the key, no range join):
    1. collapse duplicate (key, ts) observations to the max-tiebreak row;
    2. per-key bounds aggregate (tiny) -> `F.sequence` tick array
       exploded MAP-SIDE (fan-out before any shuffle, like hopping
       windows — never a join against a generated calendar table);
    3. union ticks (null value) with observations and run backward
       last-non-null + forward first-non-null carries over a single
       window sort: (ep, is_obs DESC) puts an observation BEFORE its
       coincident tick, so LOCF at an exact-hit tick sees it while the
       forward frame (current row ->) sees only strictly-later
       observations — which makes the interpolation formula collapse to
       the observed value at exact hits without a special case.

    NULL measurements are dropped up front (same contract as OHLC):
    keeping them would desynchronize the carry anchors — prev/next
    epochs would advance on a row whose value the non-null carry
    skipped, bending the interpolation line. Ticks lie inside
    [first, last] of the NON-NULL observations so a backward neighbor
    always exists; interp falls back to LOCF when no forward neighbor
    exists (only the tick coinciding with the last observation). The interpolation is
    deterministic scalar double math written identically in the oracle;
    the result is round-half-up'd to 4 decimals like every
    accumulation-adjacent surface.

    Returns (key, tick, locf_value, interp_value).
    """
    step_us = step_seconds * 1_000_000
    ep = F.unix_micros(F.col(ts_col))
    # duplicate-(key, ts) collapse to the max-tiebreak row via a struct-max
    # AGGREGATE, not a row_number window: map-side combinable, no sort
    # (the E5/K8/L9 trick; (tiebreak) is unique so value never decides)
    obs = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key),
            ep.alias("_ep"),
            F.struct(F.col(tiebreak).alias("_t"), F.col(value_col).alias("_v")).alias("_o"),
        )
        .groupBy(key, "_ep")
        .agg(F.max("_o").getField("_v").alias("_v"))
    )
    bounds = obs.groupBy(key).agg(F.min("_ep").alias("_mn"), F.max("_ep").alias("_mx"))
    first_tick = F.ceil(F.col("_mn") / F.lit(step_us)) * step_us
    last_tick = F.floor(F.col("_mx") / F.lit(step_us)) * step_us
    grid = (
        bounds.filter(last_tick >= first_tick)
        .select(
            F.col(key),
            F.explode(F.sequence(first_tick, last_tick, F.lit(step_us))).alias("_ep"),
        )
        .select(F.col(key), F.col("_ep"), F.lit(None).cast("double").alias("_v"),
                F.lit(0).alias("_is_obs"))
    )
    unioned = obs.select(key, "_ep", "_v", F.lit(1).alias("_is_obs")).unionByName(grid)
    w = Window.partitionBy(key).orderBy(F.col("_ep"), F.col("_is_obs").desc())
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_ep = F.when(F.col("_is_obs") == 1, F.col("_ep"))
    carried = unioned.select(
        F.col(key),
        F.col("_ep"),
        F.col("_is_obs"),
        F.last("_v", ignorenulls=True).over(back).alias("_locf"),
        F.last(obs_ep, ignorenulls=True).over(back).alias("_prev_ep"),
        F.first("_v", ignorenulls=True).over(fwd).alias("_next_v"),
        F.first(obs_ep, ignorenulls=True).over(fwd).alias("_next_ep"),
    )
    frac = (F.col("_ep") - F.col("_prev_ep")).cast("double") / (
        F.col("_next_ep") - F.col("_prev_ep")
    ).cast("double")
    interp_raw = F.when(F.col("_next_ep").isNull(), F.col("_locf")).otherwise(
        F.col("_locf") + (F.col("_next_v") - F.col("_locf")) * frac
    )
    return (
        carried.filter(F.col("_is_obs") == 0)
        .select(
            F.col(key),
            F.timestamp_micros(F.col("_ep")).alias("tick"),
            F.col("_locf").alias("locf_value"),
            round_half_up(interp_raw).alias("interp_value"),
        )
    )


def rate_of_change(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    counter_reset: bool = True,
) -> DataFrame:
    """K11 per-key rate of change (dv/dt in value-units per second) —
    the Prometheus `rate()` family for telemetry counters: each event's
    delta to its predecessor over their time gap. With
    ``counter_reset`` (default), a DECREASE is treated as a counter
    reset and the delta is the raw new value (the standard
    monotone-counter convention); without it, the signed difference.

    One lag window per key (the event_gaps partitioning). The first
    event of a key and zero-gap duplicates (dt = 0) yield NULL — a rate
    over no elapsed time is undefined, not infinite. Deterministic
    scalar double math, rounded half-up to 4 decimals.

    Returns (tiebreak, key, ts, rate_per_sec).
    """
    ep = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key).orderBy(ep, F.col(tiebreak))
    prev_v = F.lag(F.col(value_col)).over(w)
    dt_us = ep - F.lag(ep).over(w)
    raw_delta = F.col(value_col) - prev_v
    delta = (
        F.when(F.col(value_col) >= prev_v, raw_delta).otherwise(F.col(value_col))
        if counter_reset
        else raw_delta
    )
    rate = F.when(
        dt_us > 0,
        round_half_up(delta / (dt_us.cast("double") / F.lit(1_000_000.0))),
    )
    return df.select(
        F.col(tiebreak),
        F.col(key),
        F.col(ts_col),
        rate.alias("rate_per_sec"),
    )


def asof_join_tolerance(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    probe_tiebreak: str,
    tolerance_seconds: int,
) -> DataFrame:
    """K12 as-of join with a staleness bound (pandas merge_asof's
    `tolerance`): the carried build value is NULLed when the matched
    build row is more than `tolerance_seconds` older than the probe —
    a reading enriched with a too-old calibration is worse than an
    explicitly missing one. Pure composition over `asof_join`: the
    build timestamp rides along as one more carried column and a
    map-side gate nulls stale values, so the one-shuffle linear plan
    is unchanged.

    Returns the probe columns + asof_<value> (NULL when absent OR
    stale) + asof_age_us (the raw staleness, NULL when no match —
    callers alert on it).
    """
    bts = "__asof_bts"
    carried = asof_join(
        probe,
        build.withColumn(bts, F.col(ts_col)),
        key=key,
        ts_col=ts_col,
        value_cols=[*value_cols, bts],
        probe_tiebreak=probe_tiebreak,
    )
    age = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(f"asof_{bts}"))
    fresh = age <= F.lit(tolerance_seconds * 1_000_000)
    return carried.select(
        *[F.col(c) for c in probe.columns],
        *[
            F.when(fresh, F.col(f"asof_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
        age.alias("asof_age_us"),
    )


def ewma_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    alpha: float = 0.3,
) -> DataFrame:
    """K13: exponentially weighted moving average per key — the classic
    telemetry smoother (s_i = alpha*x_i + (1-alpha)*s_{i-1}, seeded
    s_0 = x_0) reporting each key's final smoothed level.

    EWMA is inherently sequential, so the batch-exact form must see each
    key's full ordered series: ONE shuffle on the key collecting
    (ts, tiebreak, value) structs, array_sort for deterministic order,
    then a sequential `F.aggregate` fold — all JVM-side, and the fold
    order is bit-identical to the oracle's list_reduce (same IEEE double
    ops in the same order; only the final level is rounded, 4dp).

    Scale note: per-key state is the key's own history (the same per-key
    bound as any exact reassembly/rank op here); the STREAMING twin
    (`ewma_stream`) is the production path at unbounded history — one
    (count, level) carry cell per key, emission bit-matching this fold
    over the processed prefix. For dense keys, pre-truncate history to a
    trailing window first (the smoother forgets at rate 1-alpha anyway:
     60 events at alpha .3 leave < 1e-9 of the seed's weight).

    NULL and NaN measurements are both dropped (either would poison
    every later level through the recurrence; and the streaming twin
    cannot tell them apart — Arrow delivers NULL doubles as NaN — so
    the batch contract matches what the twin can honor).

    Returns (key, n_events, ewma).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak).alias("k"),
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    fold = F.aggregate(
        F.col("_arr"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["v"]).otherwise(
            F.lit(alpha) * x["v"] + F.lit(1.0 - alpha) * acc
        ),
    )
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_events"), arr.alias("_arr"))
        .select(
            key,
            "n_events",
            round_half_up(fold).alias("ewma"),
        )
    )


def cusum_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 0.0,
) -> DataFrame:
    """K15 one-sided CUSUM drift detection per key — the classic
    change-point statistic (Page 1954): s_i = max(0, s_{i-1} + x_i -
    target - slack), alarming when s crosses `threshold`. EWMA smooths;
    CUSUM accumulates small persistent shifts that per-point thresholds
    and smoothing both miss.

    Distribution trick: the recurrence looks sequential, but the
    clamped sum has a closed form — s_n = S_n - min(0, min_{j<=n} S_j)
    over prefix sums S of (x - target - slack) — so it becomes TWO
    stacked window expressions on one (key, ts, tiebreak) sort: the
    running prefix sum, then the running minimum of that sum. No fold,
    no Python. Deviations are exact int64 micro-units, so prefix sums
    are order-exact integers and both engines agree bit-for-bit;
    doubles appear only in the final /1e6 presentation.

    NULL and NaN measurements are dropped (they carry no evidence of a
    shift). Returns per key: (key, n, final_cusum, max_cusum, n_alarms)
    — n_alarms counts measurements with s strictly above `threshold`.
    """
    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        micro_units,
    )

    v = F.col(value_col).cast("double")
    clean = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(key),
        F.unix_micros(F.col(ts_col)).alias("_t"),
        F.col(tiebreak).alias("_tb"),
        (micro_units(v) - F.lit(int(round((target + slack) * 1_000_000)))).alias(
            "_d"
        ),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_s = clean.withColumn("_S", F.sum("_d").over(w))
    with_c = with_s.withColumn(
        "_c", F.col("_S") - F.least(F.min("_S").over(w), F.lit(0))
    )
    thr_mu = int(round(threshold * 1_000_000))
    return (
        with_c.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.struct(F.col("_t"), F.col("_tb"), F.col("_c"))).alias("_last"),
            F.max("_c").alias("_mx"),
            F.sum(F.when(F.col("_c") > thr_mu, 1).otherwise(0)).alias("n_alarms"),
        )
        .select(
            key,
            "n",
            round_half_up(
                F.col("_last")["_c"].cast("double") / F.lit(1e6)
            ).alias("final_cusum"),
            round_half_up(F.col("_mx").cast("double") / F.lit(1e6)).alias(
                "max_cusum"
            ),
            F.col("n_alarms").cast("long").alias("n_alarms"),
        )
    )


def state_durations(
    df: DataFrame,
    key: str,
    ts_col: str,
    state_col: str,
    tiebreak: str,
) -> DataFrame:
    """K16 time-in-state accounting — "how long was each device in each
    state": LOCF semantics (a state holds from its event until the
    key's next event; the final event holds no duration — its state is
    still open). The uptime/alarm-budget classic.

    One lead window on the key partitioning computes each interval,
    then ONE hash aggregate on (key, state) — both share the key's
    partitioning. Durations sum as exact integer microseconds.

    Returns (key, state, n_intervals, total_seconds) with seconds
    rounded 4dp; keys with a single event produce no row (no closed
    interval), matching the oracle's NULL-lead drop.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key).orderBy(ts_us, F.col(tiebreak))
    iv = (
        df.select(
            F.col(key),
            F.col(state_col).alias("state"),
            (F.lead(ts_us).over(w) - ts_us).alias("_dur_us"),
        )
        .filter(F.col("_dur_us").isNotNull())
    )
    return (
        iv.groupBy(key, "state")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("_dur_us").alias("_tot_us"),
        )
        .select(
            key,
            "state",
            "n_intervals",
            round_half_up(F.col("_tot_us").cast("double") / F.lit(1e6)).alias(
                "total_seconds"
            ),
        )
    )


def sustained_alarms(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    threshold: float,
    min_events: int = 3,
) -> DataFrame:
    """K17 debounced alarming — page only on SUSTAINED threshold
    breaches: consecutive above-threshold runs per key (a run breaks on
    any at-or-below event) that last at least `min_events` events. The
    flapping-sensor fix every alerting pipeline grows; the single-event
    spike that F2 scores is exactly what this suppresses.

    Run detection is the K1 sessionize trick on the FLAG dimension
    instead of time: a run id is the running count of flag CHANGES, so
    one window sort on the key serves both the lag and the running sum;
    the per-run rollup is ONE aggregate on (key, run). NULL/NaN values
    never extend a run (treated as below threshold).

    Returns (key, alarm_start, alarm_end, n_events, peak_value).
    """
    v = F.col(value_col).cast("double")
    above = (v.isNotNull() & ~F.isnan(v) & (v > threshold)).cast("int")
    w = Window.partitionBy(key).orderBy(F.unix_micros(F.col(ts_col)), F.col(tiebreak))
    run = Window.partitionBy(key).orderBy(
        F.unix_micros(F.col(ts_col)), F.col("_tb")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = df.select(
        F.col(key),
        F.col(ts_col),
        F.col(tiebreak).alias("_tb"),
        v.alias("_v"),
        above.alias("_above"),
        F.when(F.lag(above).over(w).isNull() | (F.lag(above).over(w) != above), 1)
        .otherwise(0)
        .alias("_chg"),
    ).withColumn("_run", F.sum("_chg").over(run))
    return (
        flagged.filter(F.col("_above") == 1)
        .groupBy(key, "_run")
        .agg(
            F.min(ts_col).alias("alarm_start"),
            F.max(ts_col).alias("alarm_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("_v").alias("peak_value"),
        )
        .filter(F.col("n_events") >= min_events)
        .drop("_run")
    )


def holt_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    alpha: float = 0.3,
    gamma: float = 0.2,
) -> DataFrame:
    """K18 Holt double-exponential smoothing per key — the
    trend-following upgrade of K13's EWMA (Holt 1957, public): per key
    in (ts, tiebreak) order,

        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = gamma*(l_i - l_{i-1}) + (1-gamma)*b_{i-1}

    seeded l_0 = x_0, b_0 = 0. Reports each key's final level, trend,
    and the one-step-ahead forecast l + b — the feature every capacity
    planner and drift monitor wants that a single EWMA can't give
    (EWMA lags a trending series forever; Holt's trend term closes it).

    Same distribution shape as `ewma_per_key`: ONE shuffle on the key
    collecting (ts, tiebreak, value) structs, array_sort, sequential
    `F.aggregate` fold, all JVM-side. The accumulator is a 2-field
    struct; Spark builds each new struct from the OLD accumulator's
    fields, and the oracle uses a DOUBLE[] accumulator (NOT a struct —
    DuckDB 1.0's list_reduce evaluates struct fields sequentially
    against a mutated accumulator, a measured wrong-answer bug) with
    the textually identical expression tree, so both engines run the
    same IEEE double ops in the same order and only the outputs need
    the portable 4dp rounding. NULL/NaN measurements are dropped, same
    contract (and for the same Arrow reason) as K13.

    Streaming twin: `holt_stream` — a (count, level, trend) carry cell
    per key, the O(1)-state production path at unbounded history.

    Returns (key, n_events, level, trend, forecast).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not 0.0 <= gamma <= 1.0:
        raise ValueError("gamma must be in [0, 1]")
    a = F.lit(float(alpha))
    one_a = F.lit(1.0 - float(alpha))
    g = F.lit(float(gamma))
    one_g = F.lit(1.0 - float(gamma))
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak).alias("k"),
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )

    def step(acc, x):
        # the duplicated l_new subtree is intentional: the oracle's
        # lambda repeats it textually, so both engines recompute the
        # identical ops rather than share a temporary
        l_new = a * x["v"] + one_a * (acc["l"] + acc["b"])
        b_new = g * ((a * x["v"] + one_a * (acc["l"] + acc["b"])) - acc["l"]) + (
            one_g * acc["b"]
        )
        return F.when(
            acc["l"].isNull(),
            F.struct(x["v"].alias("l"), F.lit(0.0).alias("b")),
        ).otherwise(F.struct(l_new.alias("l"), b_new.alias("b")))

    fold = F.aggregate(
        F.col("_arr"),
        F.struct(
            F.lit(None).cast("double").alias("l"), F.lit(0.0).alias("b")
        ),
        step,
    )
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_events"), arr.alias("_arr"))
        .withColumn("_st", fold)
        .select(
            key,
            "n_events",
            round_half_up(F.col("_st.l")).alias("level"),
            round_half_up(F.col("_st.b")).alias("trend"),
            round_half_up(F.col("_st.l") + F.col("_st.b")).alias("forecast"),
        )
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    tiebreak: str,
) -> DataFrame:
    """K20 SCD Type-2 dimension build — collapse an attribute's event
    history into versioned validity intervals (valid_from, valid_to,
    is_current): the slowly-changing-dimension table every warehouse
    keeps for as-of joins, built from the raw change feed. K16's
    time-in-state aggregates durations away; this KEEPS the intervals,
    including each key's OPEN current version (valid_to NULL).

    One window sort per key does everything: a change row is one whose
    attribute differs from its lag (first row included — lag NULL with
    a non-null attribute counts as a change, and NULL-to-value
    transitions compare via null-safe equality); consecutive duplicates
    collapse away; valid_to is the lead of valid_from OVER THE CHANGE
    ROWS ONLY (the second window runs on the filtered, already-
    partitioned stream — no extra shuffle). Version numbers come from
    the same sort.

    Returns (key, attr, version, valid_from, valid_to, is_current).
    """
    w = Window.partitionBy(key).orderBy(
        F.unix_micros(F.col(ts_col)), F.col(tiebreak)
    )
    tagged = df.select(
        F.col(key),
        F.col(ts_col),
        F.col(tiebreak).alias("_tb"),
        F.col(attr_col).alias("attr"),
        F.lag(F.col(attr_col)).over(w).alias("_prev"),
        F.row_number().over(w).alias("_rn"),
    )
    changes = tagged.filter(
        (F.col("_rn") == 1) | ~F.col("attr").eqNullSafe(F.col("_prev"))
    )
    wc = Window.partitionBy(key).orderBy(
        F.unix_micros(F.col(ts_col)), F.col("_tb")
    )
    return changes.select(
        F.col(key),
        F.col("attr"),
        F.row_number().over(wc).alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(wc).alias("valid_to"),
        F.lead(F.col(ts_col)).over(wc).isNull().alias("is_current"),
    )


def availability_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    offline_gap_seconds: int,
) -> DataFrame:
    """K21 availability / uptime report — the SLA number every device
    fleet dashboard leads with: a device is OFFLINE during any silence
    longer than `offline_gap_seconds` between consecutive events; the
    WHOLE such gap counts as downtime (the threshold decides whether a
    silence counts, not how much of it). availability =
    1 - downtime/span over the key's observed [first, last] span.

    K12's event_gaps lists the gaps; this is the rolled-up fleet
    number. One window sort per key (lead) feeding ONE aggregate on the
    same partitioning; all duration math in exact integer microseconds,
    doubles only at the final division. Single-event keys have zero
    span: availability NULL (undefined, not 100%).

    Returns (key, n_events, span_seconds, downtime_seconds,
    availability) — seconds 4dp, availability 6dp.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key).orderBy(ts_us, F.col(tiebreak))
    gap = F.lead(ts_us).over(w) - ts_us
    thresh = int(offline_gap_seconds) * 1_000_000
    per = (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(key), ts_us.alias("_t"), gap.alias("_gap"))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("_t") - F.min("_t")).alias("_span"),
            F.sum(
                F.when(F.col("_gap") > thresh, F.col("_gap")).otherwise(
                    F.lit(0)
                )
            ).alias("_down"),
        )
    )
    return per.select(
        key,
        "n_events",
        round_half_up(F.col("_span").cast("double") / F.lit(1e6)).alias(
            "span_seconds"
        ),
        round_half_up(F.col("_down").cast("double") / F.lit(1e6)).alias(
            "downtime_seconds"
        ),
        F.when(
            F.col("_span") > 0,
            round_half_up(
                F.lit(1.0)
                - F.col("_down").cast("double") / F.col("_span").cast("double"),
                6,
            ),
        ).alias("availability"),
    )


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """K22 point-in-time enrichment against a K20 SCD Type-2 dimension:
    each fact row joins the dimension VERSION that was valid at its
    event time (valid_from <= ts < valid_to, open current version
    matches everything from valid_from on) — the as-of semantics every
    warehouse needs to avoid leaking future attribute values into
    historical facts.

    Plan shape: a LOW-CHURN dimension (|keys| x few versions) is the
    small side and broadcasts — the interval predicate evaluates
    map-side on the fact stream, zero fact shuffles. For a HIGH-CHURN
    attribute the version table is the same order as the change feed
    itself; pass broadcast_dim=False and the join pins to a shuffle
    hash join on the key equality (the range conditions ride as the
    join residual) instead of shipping a fact-sized table to every
    executor. Left join either way: facts before their key's first
    version (or with no dimension key) keep NULL attributes. Facts must
    not already carry attr/version/valid_from/valid_to columns (the
    join output names them).
    """
    d = dim.select(
        F.col(key).alias("_dk"),
        F.col("attr"),
        F.col("version"),
        F.col("valid_from"),
        F.col("valid_to"),
    )
    reserved = {"attr", "version", "valid_from", "valid_to"}
    clash = reserved & set(facts.columns)
    if clash:
        raise ValueError(
            f"scd2_enrich: facts already carry reserved column(s) {sorted(clash)}"
        )
    d = F.broadcast(d) if broadcast_dim else d.hint("shuffle_hash")
    cond = (
        (facts[key] == F.col("_dk"))
        & (facts[ts_col] >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (facts[ts_col] < F.col("valid_to")))
    )
    return facts.join(d, cond, "left").drop(
        "_dk", "valid_from", "valid_to"
    )


def trapezoid_integral(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """K19 cumulative trapezoidal integral per key — energy from power:
    the running integral of an irregular telemetry series over time
    (kW -> kWh, flow -> volume), the metering aggregate the K9 TWA is
    the average of. Each step adds (v + prev_v)/2 * dt; the increment
    pins to integer micro-units of value*seconds (== value*microseconds
    exactly, one floor per step), so the per-key running SUM is
    order-free int64 arithmetic — cross-engine exact, and the final
    division to double is the only float step.

    Scale shape: the lag and the cumulative sum share ONE key-
    partitioned sort (same window spec), so the whole operator is a
    single exchange on the key; NULL AND NaN measurements are excluded
    up front (either would poison every later cumulative value on the
    key — and matches the streaming twin, whose Arrow path cannot tell
    the two apart). Products stay < 2^63: |v| < 4.3e3 * dt_us < 2.1e15 us (66
    years) before overflow at this telemetry's value range.

    Returns (key, tiebreak, ts, energy) with energy the running
    integral INCLUDING the current observation."""
    ep = F.unix_micros(F.col(ts_col))
    v = F.col(value_col).cast("double")
    staged = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(key),
        F.col(tiebreak),
        F.col(ts_col),
        ep.alias("_ep"),
        v.alias("_v"),
    )
    w = Window.partitionBy(key).orderBy("_ep", tiebreak)
    pv = F.lag("_v").over(w)
    pe = F.lag("_ep").over(w)
    inc = F.when(
        pe.isNotNull(),
        F.floor(
            (F.col("_v") + pv) / 2.0 * (F.col("_ep") - pe).cast("double")
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        staged.withColumn("_inc", inc)
        .withColumn("_cum", F.sum("_inc").over(wc))
        .select(
            F.col(key),
            F.col(tiebreak),
            F.col(ts_col),
            (F.col("_cum").cast("double") / F.lit(1_000_000.0)).alias(
                "energy"
            ),
        )
    )


def downsample_lttb(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    n_out: int = 20,
) -> DataFrame:
    """K23 largest-triangle downsampling to ~n_out points per key — the
    standard time-series thinning operator (Steinarsson 2013; what
    Grafana/Timescale ship as `lttb`): per equal-count bucket, keep the
    point forming the LARGEST triangle with its neighbor-bucket
    anchors, preserving visual extremes where naive bucket-means
    flatten them.

    This is the FIXED-ANCHOR variant: anchors are the neighbor buckets'
    centroids rather than the previously-selected point. Classic LTTB
    threads the selection sequentially through every bucket (an
    inherently serial scan per key); fixed anchors make every bucket's
    argmax independent — embarrassingly parallel across (key, bucket) —
    at a quality difference the original paper measures as marginal.
    Boundary buckets anchor on the key's first/last points, which the
    classic algorithm pins anyway.

    Cross-engine exactness: bucket centroids divide DECIMAL(38,0) /
    int64-micro sums (order-free) once into double; the triangle
    cross-product runs in fixed-order double arithmetic on those exact
    quotients and pins to micro before the argmax; ties break on the
    tiebreak column. Scale shape: one key-partitioned window pass for
    (rn, n), one (key, bucket) aggregate for centroids + boundary
    structs, anchor lag/lead on the TINY bucket table, then one
    shuffle-hash join back and the per-bucket argmax on the SAME
    (key, bucket) partitioning — two scans of the input lineage (the
    DSIR/fit-then-score pattern), never a per-key serial pass."""
    ep = F.unix_micros(F.col(ts_col))
    v = F.col(value_col).cast("double")
    from azure_iot_realtime_data_pipeline_spark.operators.analytics import (
        micro_units,
    )

    wk = Window.partitionBy(key).orderBy("_ep", tiebreak)
    wn = Window.partitionBy(key)
    rows = (
        # |v| beyond the micro-unit domain is excluded like NaN: inside
        # the centroid SUM a micro_units NULL would silently shift the
        # anchor (the count still includes the row) while the oracle
        # raises — exclusion keeps both engines on the same rows.
        df.filter(v.isNotNull() & ~F.isnan(v) & (F.abs(v) < F.lit(9.2233720368547e12)))
        .select(
            F.col(key),
            F.col(tiebreak),
            F.col(ts_col),
            ep.alias("_ep"),
            v.alias("_v"),
        )
        .withColumn("_rn", F.row_number().over(wk))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn(
            # explicit floor, NOT a bare cast: DuckDB CAST(double AS
            # BIGINT) rounds half-away while Spark's cast truncates —
            # floor() is the one spelling both engines agree on
            "_b",
            F.floor(
                (F.col("_rn") - 1).cast("long") * n_out / F.col("_n")
            ).cast("long"),
        )
    )
    cent = rows.groupBy(key, "_b").agg(
        F.count(F.lit(1)).alias("_bn"),
        F.sum(F.col("_ep").cast("decimal(38,0)")).alias("_sx"),
        F.sum(micro_units(F.col("_v"))).alias("_sy"),
        F.min(F.struct("_ep", tiebreak, "_v")).alias("_first"),
        F.max(F.struct("_ep", tiebreak, "_v")).alias("_last"),
    )
    wb = Window.partitionBy(key).orderBy("_b")
    cx = (F.col("_sx").cast("double") / F.col("_bn").cast("double")).alias("_cx")
    cy = (
        F.col("_sy").cast("double") / F.col("_bn").cast("double") / F.lit(1e6)
    ).alias("_cy")
    c = cent.select(key, "_b", cx, cy, "_first", "_last")
    anchors = c.select(
        key,
        "_b",
        # prev anchor: previous bucket's centroid, else the key's FIRST
        # point (min over the whole key partition of the first structs)
        F.coalesce(
            F.lag("_cx").over(wb),
            F.min("_first").over(wn)["_ep"].cast("double"),
        ).alias("_ax"),
        F.coalesce(
            F.lag("_cy").over(wb), F.min("_first").over(wn)["_v"]
        ).alias("_ay"),
        F.coalesce(
            F.lead("_cx").over(wb),
            F.max("_last").over(wn)["_ep"].cast("double"),
        ).alias("_zx"),
        F.coalesce(
            F.lead("_cy").over(wb), F.max("_last").over(wn)["_v"]
        ).alias("_zy"),
    )
    j = rows.join(anchors.hint("shuffle_hash"), [key, "_b"])
    # twice the triangle area, fixed evaluation order. Pinned to WHOLE
    # units (not micro): the x axis is epoch MICROSECONDS, so areas run
    # ~1e11-1e16 — a 1e6 micro scale would cross int64/the micro_units
    # overflow guard and NULL the argmax; sub-unit area differences are
    # ties at this axis scale by construction.
    # 2A = (B-A) x (C-A) = (ax-zx)(yb-ay) - (ax-xb)(ZY-AY). Review r7
    # s5 pass 3 caught the second term SIGN-INVERTED ((ay-zy)) — that
    # scores distance from a mirror-image of the anchor line, keeping
    # collinear points and DROPPING spikes on any sloped trend; the
    # oracle mirrored the same wrong expression so parity could not see
    # it. The sloped-anchor test now pins the true formula.
    area2 = (
        (F.col("_ax") - F.col("_zx")) * (F.col("_v") - F.col("_ay"))
        - (F.col("_ax") - F.col("_ep").cast("double")) * (F.col("_zy") - F.col("_ay"))
    )
    scored = j.withColumn(
        "_a", F.floor(F.abs(area2) + F.lit(0.5)).cast("long")
    )
    wr = Window.partitionBy(key, "_b").orderBy(
        F.col("_a").desc(), F.col(tiebreak).asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") == 1)
        .select(
            F.col(key),
            F.col("_b").alias("bucket"),
            F.col(tiebreak),
            F.col(ts_col),
            F.col("_v").alias("value"),
        )
    )


def throttle_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    n_per_window: int,
    window_seconds: int,
) -> DataFrame:
    """K24 per-key rate limiting: keep the FIRST n events per key per
    epoch-aligned window, drop the rest — the ingest-protection
    operator in front of a hot sink (a chatty device cannot starve the
    pipeline; the kept rows are deterministic, not rate-dependent).
    One exchange: the (key, window) rank's partitioning; deterministic
    (ts, tiebreak) order. Epoch-aligned integer bucket arithmetic —
    identical on any engine. NULL-timestamp rows are EXCLUDED (review
    r7 s5 pass 4): an event with no event time cannot be rate-bucketed,
    and the streaming twin's state machine necessarily drops them — a
    batch form that admitted n of them per key would break the
    batch-equivalence contract."""
    bucket = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(window_seconds * 1_000_000)
    ).cast("long")
    w = Window.partitionBy(F.col(key), bucket).orderBy(
        F.col(ts_col), F.col(tiebreak)
    )
    return (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_window)
        .drop("_rn")
    )
