"""Bucketed-table co-located join: the storage-layout shuffle
eliminator, plan-gated.

The session-scoped `spark` fixture has a default warehouse dir; tables
created here are dropped on the way out so the suite stays rerunnable.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
from azure_iot_realtime_data_pipeline_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, sf_smoke, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    write_bucketed(ev, "ev_bkt", "user_id", n_buckets=8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "user_id"), "cust_bkt", "user_id",
        n_buckets=8,
    )
    yield "ev_bkt", "cust_bkt"
    spark.sql("DROP TABLE IF EXISTS ev_bkt")
    spark.sql("DROP TABLE IF EXISTS cust_bkt")


def test_cobucketed_join_has_no_exchange(spark, sf_smoke, bucketed_pair):
    """Two tables bucketed on the join key with equal bucket counts must
    join with ZERO Exchange — the storage layout already co-locates the
    keys, so the only remaining work is the per-bucket merge. The same
    join over plain parquet shuffles (Exchange present), proving the
    gate measures bucketing and not some session default."""
    ev_t, cust_t = bucketed_pair
    # disable broadcast so the join strategy is the big-big SMJ path the
    # bucketing exists to serve (broadcast would mask the exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ev_t).join(read_table(spark, cust_t), "user_id")
        p = _plan(joined)
        assert "Exchange" not in p, p
        # plain-parquet control: same join, shuffles both sides
        ev = load_table(spark, sf_smoke, "events").select(
            "event_id", "user_id", "value"
        )
        cust = load_table(spark, sf_smoke, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        p_plain = _plan(ev.join(cust, "user_id"))
        assert "Exchange" in p_plain, p_plain
        # and the bucketed join returns the same rows as the plain one
        got = joined.count()
        want = ev.join(cust, "user_id").count()
        assert got == want > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    """A groupBy on the bucket key reuses the storage partitioning too —
    no Exchange before the aggregate (map-side-only plan)."""
    ev_t, _ = bucketed_pair
    agg = read_table(spark, ev_t).groupBy("user_id").agg(F.sum("value").alias("s"))
    p = _plan(agg)
    assert "Exchange" not in p, p


def test_date_partitioned_scan_prunes_partitions(spark, sf_smoke, tmp_path):
    """Date partitioning must turn a time predicate into partition
    pruning: the filtered scan reads strictly fewer files than the
    unfiltered one, and the predicate appears as a PartitionFilter
    (directory-level skip), not a row-level PushedFilter."""
    from azure_iot_realtime_data_pipeline_spark.sources.bucketed import (
        write_date_partitioned,
    )

    ev = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(ev, path)
    part = spark.read.parquet(path)
    n_dates = part.select("event_date").distinct().count()
    assert n_dates > 1, "testdata spans one date — pruning unobservable"
    one_day = part.filter(
        F.col("event_date") == part.agg(F.max("event_date")).collect()[0][0]
    )
    p = _plan(one_day)
    # the date predicate must land in PartitionFilters — the
    # directory-level skip applied at file listing (inputFiles() can't
    # witness it: it reports the ANALYZED plan, before pruning)
    scan_line = next(ln for ln in p.splitlines() if "PartitionFilters" in ln)
    assert "event_date" in scan_line, p
    # row-consistency: partition column reconstructs the same split
    assert one_day.count() == ev.filter(
        F.to_date("ts")
        == ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
    ).count() > 0


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_smoke, tmp_path):
    """DPP: when the partitioned fact joins a dimension whose FILTER
    implies a partition subset, Spark injects a runtime partition-prune
    subquery (`dynamicpruning` in the plan) — at 100 TB this skips
    every irrelevant day's directory without a static predicate on the
    fact. The capability needs no engine code (it is Catalyst's), but
    it only fires on a partitioned layout, which is exactly what
    write_date_partitioned provides."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
    from azure_iot_realtime_data_pipeline_spark.sources.bucketed import (
        write_date_partitioned,
    )

    ev = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "events_part")
    write_date_partitioned(ev, path)
    fact = spark.read.parquet(path)
    # dimension: a two-day calendar slice (filtered on a non-partition
    # attribute so static pruning cannot see through it)
    dim = (
        fact.select("event_date").distinct().orderBy("event_date").limit(2)
        .withColumn("tag", F.lit("keep"))
    )
    dim_path = str(tmp_path / "dim")
    dim.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "keep")
    joined = fact.join(dim, "event_date").groupBy("event_date").count()
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain(mode="formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan

def test_clustered_write_rowgroup_stats_are_selective(spark, sf_smoke, tmp_path):
    """write_clustered: within every written file the cluster column's
    row-group min/max ranges must be sorted and non-overlapping (that
    is what makes parquet statistics prune on a point predicate), and
    the partition directories must exist. Dropping sortWithinPartitions
    fails the non-overlap assertion directly (hash-distributed keys
    span the full range in every group)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
    from azure_iot_realtime_data_pipeline_spark.sources.bucketed import (
        write_clustered,
    )

    from pyspark.sql import functions as F

    # pin every row to one date so the whole table lands in ONE file:
    # at 64 KiB blocks that file must split into several row groups,
    # which is what makes the non-overlap assertion bite
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    dst = str(tmp_path / "clustered")
    write_clustered(
        ev, dst, ts_col="ts", cluster_cols=("user_id",),
        files_per_partition=1,
        # force multiple small row groups so the non-overlap assertion
        # below actually exercises statistics granularity (8 KiB block
        # -> ~8 groups on the smoke table)
        writer_options={"parquet.block.size": "8192"},
    )
    dirs = [d for d in os.listdir(dst) if d.startswith("event_date=")]
    assert dirs, "expected Hive-style date directories"

    def rg_ranges(f):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = schema_names.index("user_id")
        out = []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            out.append((st.min, st.max))
        return out

    files = glob.glob(os.path.join(dst, "event_date=*", "*.parquet"))
    assert files
    multi = 0
    for f in files:
        rng = rg_ranges(f)
        for (lo, hi) in rng:
            assert lo <= hi
        for (prev_lo, prev_hi), (lo, hi) in zip(rng, rng[1:]):
            assert prev_hi <= lo, (f, rng)  # non-overlapping, sorted
        if len(rng) > 1:
            multi += 1
    assert multi > 0, "expected multi-row-group files at 8 KiB blocks"

def test_zorder_key_narrows_both_dimensions(spark, sf_smoke, tmp_path):
    """zorder_key + write_clustered: vs the lexicographic (user, hour)
    sort — where row groups are narrow on user but span hour's full
    range — the Morton-interleaved sort must shrink the average
    per-row-group HOUR range while keeping user ranges bounded. That
    range shrinkage is exactly what lets a predicate on either
    dimension skip row groups."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
    from azure_iot_realtime_data_pipeline_spark.sources.bucketed import (
        write_clustered,
        zorder_key,
    )

    ev = load_table(spark, sf_smoke, "events")
    mn = ev.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    # pin the write date so everything lands in one partition dir; the
    # hour index is the second clustering dimension under test
    ev2 = load_table(spark, sf_smoke, "events").select(
        "event_id",
        "user_id",
        ((F.unix_micros("ts") - F.lit(mn)) / F.lit(3_600_000_000)).cast("long").alias("hour_idx"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )

    def avg_ranges(dst):
        files = glob.glob(os.path.join(dst, "event_date=*", "*.parquet"))
        tot_u = tot_h = n = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ui, hi = names.index("user_id"), names.index("hour_idx")
            for g in range(md.num_row_groups):
                su = md.row_group(g).column(ui).statistics
                sh = md.row_group(g).column(hi).statistics
                tot_u += su.max - su.min
                tot_h += sh.max - sh.min
                n += 1
        return tot_u / n, tot_h / n, n

    lex = str(tmp_path / "lex")
    write_clustered(
        ev2, lex, cluster_cols=("user_id", "hour_idx"),
        writer_options={"parquet.block.size": "8192"},
    )
    zo = str(tmp_path / "zo")
    z = ev2.withColumn("_z", zorder_key(F.col("user_id"), F.col("hour_idx")))
    write_clustered(
        z, zo, cluster_cols=("_z",),
        writer_options={"parquet.block.size": "8192"},
    )
    u_lex, h_lex, n_lex = avg_ranges(lex)
    u_zo, h_zo, n_zo = avg_ranges(zo)
    assert n_lex > 1 and n_zo > 1
    # Z-order must narrow the second dimension dramatically...
    assert h_zo < h_lex * 0.6, (h_zo, h_lex)
    # ...without giving up all locality on the first
    assert u_zo < (u_lex + 1) * 64, (u_zo, u_lex)



def test_registered_bucketed_join_query_plan_and_result(spark, sf_smoke):
    """The REGISTERED q_bucketed_join path (the one the driver oracles):
    join strategy is ShuffledHashJoin over the co-bucketed layout with
    zero Exchange below the join — the only hash exchange in the whole
    plan is the final 5-row segment aggregate. The query also
    self-gates (raises if the join shuffles), so this test double-locks
    the shape the CORRECTNESS entry certifies."""
    from azure_iot_realtime_data_pipeline_spark.plans.queries import (
        q_bucketed_join,
    )

    df = q_bucketed_join(spark, sf_smoke)
    p = _plan(df)
    assert "ShuffledHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # formatted mode prints each node once in the tree ("Exchange (8)")
    # and once in the detail section ("(8) Exchange") — count tree nodes
    assert p.count("Exchange (") == 1, p  # the segment aggregate only
    rows = {r.segment: r.n_events for r in df.collect()}
    assert sum(rows.values()) > 0

    # write-once reuse (r11 verdict #5): a repeated invocation in the
    # same session must SKIP the write phase — it measures the join
    # alone, the production read-path shape. Poison write_bucketed to
    # prove the warm path never touches it, and the answer is stable.
    import hashlib
    import os

    from azure_iot_realtime_data_pipeline_spark.sources import bucketed

    def _boom(*a, **k):  # pragma: no cover - failure signal only
        raise AssertionError("warm q_bucketed_join must not rewrite")

    orig = bucketed.write_bucketed
    bucketed.write_bucketed = _boom
    try:
        warm = {r.segment: r.n_events for r in
                q_bucketed_join(spark, sf_smoke).collect()}
    finally:
        bucketed.write_bucketed = orig
    assert warm == rows

    # table names are namespaced by an md5 of the ABSOLUTE sf_dir so
    # same-basename suites under a shared warehouse can never collide
    tag = (
        os.path.basename(os.path.normpath(sf_smoke)).replace(".", "_")
        + "_"
        + hashlib.md5(os.path.abspath(sf_smoke).encode()).hexdigest()[:8]
    )
    assert spark.catalog.tableExists(f"bkt_events_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS bkt_events_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS bkt_cust_{tag}")
