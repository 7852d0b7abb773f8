"""Cardinality sketches for corpus-scale profiling.

A 100 TB pipeline constantly asks "how many distinct X per Y"
(users per event type, domains per language, shingles per shard) where
an exact COUNT(DISTINCT) shuffles every distinct value. The KMV
(k-minimum-values) sketch answers with bounded per-group state: keep
only the k smallest hash values of the distinct set; the k-th smallest
of n uniform hashes sits near k/(n+1) of the hash space, so
n_hat = (k-1) / U_(k) estimates the cardinality (Bar-Yossef et al.,
RANDOM'02 — the classic distinct-elements sketch; standard error
~ 1/sqrt(k-2)).

Engine-portability is the design driver here (same policy as the
portable MinHash/SimHash twins in dedup.py): the hash is the md5-derived
`portable_hash32`, every arithmetic step is integer-exact until one
final f64 division, and the estimator is therefore a DETERMINISTIC
function any SQL engine reproduces bit-for-bit — unlike
`approx_count_distinct` (HLL++), whose sketch layout is Spark-internal
and can never hash-match another engine. Spark's native HLL remains the
right choice when only Spark reads the sketch; this operator is the
cross-engine-auditable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.functions.rounding import round_half_up
from azure_iot_realtime_data_pipeline_spark.operators.dedup import portable_hash32


def kmv_distinct(
    df: DataFrame,
    group: str,
    id_col: str,
    k: int = 64,
    out: str = "distinct_est",
) -> DataFrame:
    """(group, n_kept, distinct_est): KMV distinct-count estimate of
    `id_col` per `group`.

    Shape: hash -> per-group hash-dedup -> rank window keeps the k
    smallest -> one tiny agg row per group. Groups with fewer than k
    distinct hashes report the EXACT count (the sketch holds the whole
    distinct set); larger groups report (k-1) * 2^32 / kth_min_hash,
    rounded half-up to 4 dp so the one f64 division compares exactly
    across engines.

    Scale notes: the dedup + rank pair is ONE shuffle on (group, hash)
    — the same key the exact distinct would shuffle — but downstream
    state collapses to k longs per group, so the agg output is tiny and
    re-aggregation (e.g. per-day sketches merged to per-month) stays
    cheap: KMV sketches merge by unioning hash sets and re-taking the k
    smallest, which is exactly re-running this operator over unioned
    kept-hash tables. A JVM TypedImperativeAggregate could push the
    k-smallest selection into the map-side partial combine and skip the
    full distinct shuffle; that is a swap point, not a plan change —
    the estimator arithmetic (and the oracle) stays identical.
    """
    h = portable_hash32(F.col(id_col).cast("string"))
    # NULL ids are not countable entities — and a NULL hash would sit at
    # opposite ends of the rank window in Spark (NULLS FIRST) vs other
    # engines (DuckDB: NULLS LAST), silently corrupting the k-th min.
    hashed = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(group), h.alias("_h"))
        .dropDuplicates([group, "_h"])
    )
    w = Window.partitionBy(group).orderBy(F.col("_h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = kept.groupBy(group).agg(
        F.count("*").alias("n_kept"), F.max("_h").alias("_kth")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        round_half_up(F.lit(float(k - 1)) * F.lit(2.0**32) / F.col("_kth"))
    )
    return agg.select(
        F.col(group),
        F.col("n_kept").cast("long").alias("n_kept"),
        est.alias(out),
    )
