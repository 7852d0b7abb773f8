"""Corpus-management operators (J19-J23): properties the oracle parity
check can't see — split stability and balance, decontamination edge
cases, masking behavior on adversarial strings."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.operators import corpus
from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table


def test_hash_split_is_deterministic_and_balanced(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    split = docs.select("doc_id", corpus.hash_split(F.col("doc_id")).alias("s"))
    counts = {r["s"]: r["n"] for r in split.groupBy("s").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    # 80/10/10 within loose binomial bounds at n=500
    assert 0.7 < counts["train"] / total < 0.9
    assert 0.04 < counts["val"] / total < 0.18
    assert 0.04 < counts["test"] / total < 0.18
    # deterministic: re-evaluation and re-partitioning give the same map
    again = {
        r["doc_id"]: r["s"]
        for r in split.repartition(7).collect()
    }
    first = {r["doc_id"]: r["s"] for r in split.collect()}
    assert first == again


def test_hash_split_bounds_validation():
    with pytest.raises(ValueError):
        corpus.split_bounds(0.0, 0.5)
    with pytest.raises(ValueError):
        corpus.split_bounds(0.9, 0.2)
    lo, hi = corpus.split_bounds(0.8, 0.1)
    assert (lo, hi) == ("cccc", "e666")


def test_decontaminate_removes_benchmark_and_keeps_short_docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),        # overlaps benchmark -> drop
        (2, "one two three four five"),       # clean -> keep
        (3, "tiny doc"),                      # < 3 tokens, no shingles -> keep
        (4, "alpha beta gamma"),              # the benchmark doc itself -> drop
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = docs.filter(F.col("doc_id") == 4)
    kept = sorted(r["doc_id"] for r in corpus.decontaminate(docs, bench).collect())
    assert kept == [2, 3]


def test_repetition_score_extremes(spark):
    rows = [
        (1, "a b c a b c a b c a b c"),  # heavy 3-gram repetition
        (2, "q w e r t y u i o p"),      # all distinct
        (3, "xy"),                        # sub-3-token
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["rep"]
        for r in docs.select(
            "doc_id", corpus.repetition_score(F.col("text")).alias("rep")
        ).collect()
    }
    assert got[3] == 0.0
    assert got[2] == 0.0
    assert got[1] > 0.5


def test_mask_pii_patterns(spark):
    rows = [
        (1, "mail me at jane.doe+spam@sub.example.org thanks"),
        (2, "card 12345678901234 and short 123456 stays"),
        (3, "no pii here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    n_email, n_digit = corpus.pii_counts(F.col("text"))
    got = {
        r["doc_id"]: (r["m"], r["ne"], r["nd"])
        for r in docs.select(
            "doc_id",
            corpus.mask_pii(F.col("text")).alias("m"),
            n_email.alias("ne"),
            n_digit.alias("nd"),
        ).collect()
    }
    assert got[1] == ("mail me at <EMAIL> thanks", 1, 0)
    # 7+ digits masked, 6-digit run untouched
    assert got[2] == ("card <NUM> and short 123456 stays", 0, 1)
    assert got[3] == ("no pii here", 0, 0)


def test_normalize_text_collapses_whitespace(spark):
    rows = [(1, "  Hello\t\tWORLD \n mixed   Case  ")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = docs.select(corpus.normalize_text(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == "hello world mixed case"


def test_stratified_sample_rates_and_determinism(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    rates = {"en": 0.25, "zh": 0.75}
    got = corpus.stratified_sample(docs, "lang", "doc_id", rates, default_rate=0.5)
    by_lang = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # loose binomial bounds per stratum
    assert 0.1 < by_lang["en"] / base["en"] < 0.45
    assert 0.55 < by_lang["zh"] / base["zh"] < 0.95
    # deterministic under repartitioning
    ids1 = sorted(r["doc_id"] for r in got.collect())
    ids2 = sorted(r["doc_id"] for r in corpus.stratified_sample(
        docs.repartition(13), "lang", "doc_id", rates, default_rate=0.5).collect())
    assert ids1 == ids2


def test_stratified_sample_rate_validation():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.stratified_sample_flag(F.lit("x"), F.lit(1), {"x": 1.5})


def test_tf_idf_and_bm25_properties(spark):
    from azure_iot_realtime_data_pipeline_spark.operators import relevance

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple banana cherry durian"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ti = {(r["doc_id"], r["term"]): (r["tf"], r["tf_idf"]) for r in relevance.tf_idf(docs).collect()}
    # tf counts repeated terms
    assert ti[(1, "apple")][0] == 2
    # rarer term ("durian", df=1) outweighs ubiquitous "banana" (df=3) at equal tf
    assert ti[(3, "durian")][1] > ti[(3, "banana")][1]
    bm = {(r["doc_id"], r["term"]): r["bm25"] for r in relevance.bm25(docs).collect()}
    assert bm[(3, "durian")] > bm[(3, "banana")]
    # BM25 term-frequency saturation: tf=2 scores higher than tf=1 for the
    # same term, but less than 2x (diminishing returns)
    one = {(r["doc_id"], r["term"]): r["bm25"] for r in relevance.bm25(
        spark.createDataFrame([(1, "apple pear"), (2, "apple apple pear")], ["doc_id", "text"])
    ).collect()}
    assert one[(2, "apple")] > one[(1, "apple")]
    assert one[(2, "apple")] < 2 * one[(1, "apple")]


def test_hex_threshold_saturation_and_edges(spark):
    """rate=1.0 must keep EVERY row: format(0x10000,'04x')=='10000'
    compares lexicographically below most md5 prefixes, so saturated
    thresholds use 'g' (> any hex digit)."""
    assert corpus.hex_threshold(1.0) == "g"
    assert corpus.hex_threshold(0.0) == "0000"
    assert corpus.hex_threshold(0.5) == "8000"
    rows = [(i, "s" if i % 2 else "t") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    keep_all = corpus.stratified_sample(df, "stratum", "id", {"s": 1.0, "t": 1.0})
    assert keep_all.count() == 200
    keep_none = corpus.stratified_sample(df, "stratum", "id", {"s": 0.0}, default_rate=0.0)
    assert keep_none.count() == 0
    # default_rate is validated like per-stratum rates
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.stratified_sample_flag(F.lit("x"), F.lit(1), {}, default_rate=1.5)


def test_repetition_score_null_text(spark):
    """NULL text scores 0.0 (the oracle's COALESCE), never NULL."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
    docs = spark.createDataFrame([(1, None), (2, "a b c d")], schema)
    got = {r["doc_id"]: r["rep_score"] for r in corpus.repetition_scores(docs).collect()}
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_pack_sequences_contiguous_bins(spark):
    """Packing invariants: bins fill contiguously per shard; a doc larger
    than the budget occupies its own bin(s) without splitting; total
    token mass is preserved."""
    rows = [
        (0, " ".join(["w"] * 100)),   # shard 0
        (8, " ".join(["w"] * 100)),   # shard 0
        (16, " ".join(["w"] * 300)),  # shard 0 -> oversized vs budget 256
        (24, " ".join(["w"] * 100)),  # shard 0
        (1, " ".join(["w"] * 50)),    # shard 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["bin"])
        for r in corpus.pack_sequences(docs, token_budget=256, n_shards=8).collect()
    }
    # shard 0 order by id: cum-before = 0, 100, 200, 500
    assert got[0] == (0, 100, 0)
    assert got[8] == (0, 100, 0)
    assert got[16] == (0, 300, 0)   # starts in bin 0 (preceding cum 200)
    assert got[24] == (0, 100, 1)   # preceding cum 500 -> bin 1
    assert got[1] == (1, 50, 0)


def test_importance_sample_tracks_weight(spark):
    """Keep-rate follows the weight: weight 0 keeps nothing, 1 keeps all,
    0.3 keeps ~30%; deterministic under repartitioning."""
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    assert corpus.importance_sample(df, "doc_id", F.lit(0.0)).count() == 0
    assert corpus.importance_sample(df, "doc_id", F.lit(1.0)).count() == 2000
    n = corpus.importance_sample(df, "doc_id", F.lit(0.3)).count()
    assert 0.22 < n / 2000 < 0.38
    a = sorted(r["doc_id"] for r in corpus.importance_sample(df, "doc_id", F.lit(0.3)).collect())
    b = sorted(r["doc_id"] for r in corpus.importance_sample(df.repartition(7), "doc_id", F.lit(0.3)).collect())
    assert a == b


def test_uniform_hash_full_int64_range(spark):
    """Overflow regression: ids past ~3.47e9 must still draw in [0,1)
    (raw id*mult wraps int64 negative and made u negative -> keep-all);
    negative ids fold back into range too."""
    ids = [0, 1, 3_474_355_200, 2**62, -17, -(2**40)]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    us = {r["doc_id"]: r["u"] for r in df.select(
        "doc_id", corpus.uniform_hash(F.col("doc_id")).alias("u")).collect()}
    for i, u in us.items():
        assert 0.0 <= u < 1.0, (i, u)
    # weight 0 keeps nothing even for huge/negative ids
    assert corpus.importance_sample(df, "doc_id", F.lit(0.0)).count() == 0


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0), st.floats(min_value=0.0, max_value=1.0))
def test_hex_threshold_monotone(r1, r2):
    """Threshold ordering must follow rate ordering (lexicographic hex
    compare + the 'g' saturation sentinel): a higher rate can never
    select FEWER prefixes."""
    t1, t2 = corpus.hex_threshold(r1), corpus.hex_threshold(r2)
    if r1 <= r2:
        assert t1 <= t2, (r1, r2, t1, t2)
    # 'g' sorts above every 4-char hex string
    assert corpus.hex_threshold(1.0) > "ffff"


def test_chunk_documents_edges(spark):
    """J29 boundary semantics: empty doc -> no chunks; doc shorter than
    one chunk -> single whole chunk; longer docs -> stride-96 starts,
    32-token overlap between consecutive chunks, every token covered."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import chunk_documents

    toks200 = " ".join(f"t{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, ""), (2, "a b c"), (3, toks200)], "doc_id long, text string"
    )
    out = chunk_documents(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc  # empty doc yields no chunks
    assert [(r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in by_doc[2]] == [
        (0, 3, "a b c")
    ]
    chunks3 = sorted(by_doc[3], key=lambda r: r["chunk_idx"])
    # starts 0, 96, 192 -> lengths 128, 104, 8
    assert [(r["chunk_idx"], r["n_tokens"]) for r in chunks3] == [
        (0, 128), (1, 104), (2, 8)
    ]
    # 32-token overlap: chunk 0's last 32 tokens == chunk 1's first 32
    c0 = chunks3[0]["chunk_text"].split(" ")
    c1 = chunks3[1]["chunk_text"].split(" ")
    assert c0[-32:] == c1[:32]
    # full coverage: union of chunks == original token sequence
    assert c0[:96] + c1[:96] + chunks3[2]["chunk_text"].split(" ") == toks200.split(" ")

    import pytest

    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, chunk_tokens=32, overlap_tokens=32)


def test_repeated_spans_keep_rule_and_counts(spark):
    """J32: a span shared by two docs is flagged in both, kept exactly
    once (min doc, min start), and within-doc repeats count as
    occurrences but not extra docs."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from azure_iot_realtime_data_pipeline_spark.operators.dedup import repeated_spans

    boiler = "a b c d"  # the 4-token span shared verbatim
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    df = spark.createDataFrame(
        [
            (1, f"x {boiler} y"),
            (2, f"p q {boiler}"),
            (3, f"{boiler} z {boiler}"),  # twice within one doc
            (4, "totally unrelated words here"),
        ],
        schema,
    )
    got = repeated_spans(df, w=4).collect()
    shared = [r for r in got if r["n_docs"] >= 2]
    # every occurrence row reports the same totals for the shared span
    span_rows = [r for r in shared if r["n_occurrences"] == 4]
    assert {(r["doc_id"], r["start_tok"]) for r in span_rows} == {
        (1, 2), (2, 3), (3, 1), (3, 6)
    }
    assert all(r["n_docs"] == 3 for r in span_rows)
    keeps = [(r["doc_id"], r["start_tok"]) for r in span_rows if r["keep"] == 1]
    assert keeps == [(1, 2)]  # min doc, min start
    assert all(r["doc_id"] != 4 for r in got)


def test_domain_mixture_balances_token_shares(spark, sf_oracle):
    """J33: after resampling, no source exceeds its equal-share token
    budget by more than sampling noise, and under-represented sources
    are never upsampled (rate caps at 1.0)."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        domain_mixture_sample,
    )
    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table

    docs = load_table(spark, sf_oracle, "documents")
    kept = domain_mixture_sample(docs, budget_frac=0.5)
    rows = kept.collect()
    assert len(rows) > 0
    rates = {r["source"]: r["rate"] for r in rows}
    assert all(0.0 < r <= 1.0 for r in rates.values())
    # determinism: re-running yields the identical sample
    again = {(r["doc_id"], r["source"]) for r in domain_mixture_sample(
        docs, budget_frac=0.5).collect()}
    assert {(r["doc_id"], r["source"]) for r in rows} == again


def test_repeat_regions_merges_overlapping_spans(spark):
    """J32b: overlapping keep=0 windows coalesce into one maximal
    region; disjoint repeats stay separate regions; the keeper doc
    contributes no region for its kept occurrence."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from azure_iot_realtime_data_pipeline_spark.operators.dedup import (
        repeated_span_regions,
    )

    # doc 2 repeats doc 1's 5-token run "a b c d e": windows (a b c d),
    # (b c d e) both repeat -> doc 2 gets ONE merged region of 5 tokens.
    # doc 2 also shares the disjoint run "p q r s" -> second region.
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    df = spark.createDataFrame(
        [
            (1, "a b c d e zz p q r s"),
            (2, "a b c d e yy ww p q r s"),
        ],
        schema,
    )
    got = {
        (r["doc_id"], r["region_start"], r["region_end"], r["n_tokens"])
        for r in repeated_span_regions(df, w=4).collect()
    }
    # doc 1 keeps everything (min doc wins both spans) -> regions only in doc 2
    assert got == {(2, 1, 6, 5), (2, 8, 12, 4)}


def test_domain_mixture_and_spans_handle_empty_input(spark):
    """Empty-corpus edges: the mixture's grand-total SUM is NULL over
    zero rows (must not crash building the budget), and repeated_spans
    over docs all shorter than w yields no rows."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        domain_mixture_sample,
    )
    from azure_iot_realtime_data_pipeline_spark.operators.dedup import repeated_spans

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ])
    empty = spark.createDataFrame([], schema)
    out = domain_mixture_sample(empty)
    assert out.columns == ["doc_id", "source", "n_tokens", "rate"]
    assert out.count() == 0
    short = spark.createDataFrame([(1, "s", "too short"), (2, "s", "too short")], schema)
    assert repeated_spans(short, w=10).count() == 0


def test_curate_corpus_dedups_normalization_collapsed_variants(spark):
    """The curation chain's dedup stage keys on the NORMALIZED text:
    case/whitespace variants of one document must collapse to a single
    survivor (min doc_id), while distinct texts all survive. (The
    synthetic corpus has no exact dups, so the driver oracle exercises
    the chain but not the collapse — this pins it.)"""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from azure_iot_realtime_data_pipeline_spark.plans.queries import q_curate_corpus

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ])
    df = spark.createDataFrame(
        [
            (1, "s", "The Quick   Brown Fox"),
            (2, "s", "the quick brown fox"),        # same after normalize
            (3, "s", "  THE QUICK\tBROWN FOX  "),   # same after normalize
            (4, "s", "a different document"),
        ],
        schema,
    )
    import unittest.mock as mock

    with mock.patch(
        "azure_iot_realtime_data_pipeline_spark.plans.queries.load_table",
        return_value=df,
    ):
        out = q_curate_corpus(spark, "ignored")
        rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 4}  # min doc_id wins the collapsed trio
    assert rows[1]["n_tokens"] == 4 and rows[4]["n_tokens"] == 3
    assert rows[1]["lang_pred"] == "en"  # 'the' survives lowercasing


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=20).map(" ".join),
        min_size=2,
        max_size=6,
    )
)
def test_repeated_spans_invariants(spark, texts):
    """Property (random tiny corpora over a 7-token alphabet, w=3):
    every keep=0 occurrence has exactly one keep=1 keeper with the same
    span hash; every reported span's n_docs/n_occurrences match a
    recount; regions per doc never overlap and are each >= w tokens."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from azure_iot_realtime_data_pipeline_spark.operators.dedup import (
        repeated_span_regions,
        repeated_spans,
    )

    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    df = spark.createDataFrame(list(enumerate(texts)), schema)
    rows = repeated_spans(df, w=3).collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["span_hash"], []).append(r)
    for h, occ in by_hash.items():
        assert sum(r["keep"] for r in occ) == 1, h
        assert len({r["doc_id"] for r in occ}) == occ[0]["n_docs"] >= 2
        assert len(occ) == occ[0]["n_occurrences"]
        keeper = min((r["doc_id"], r["start_tok"]) for r in occ)
        got_keeper = next((r["doc_id"], r["start_tok"]) for r in occ if r["keep"])
        assert got_keeper == keeper
    regions = repeated_span_regions(df, w=3).collect()
    per_doc = {}
    for r in regions:
        assert r["n_tokens"] == r["region_end"] - r["region_start"] >= 3
        per_doc.setdefault(r["doc_id"], []).append(
            (r["region_start"], r["region_end"])
        )
    for doc, ivs in per_doc.items():
        ivs.sort()
        for (s1, e1), (s2, _e2) in zip(ivs, ivs[1:]):
            assert s2 > e1, (doc, ivs)  # strictly disjoint after merge


def test_top_ngrams_surfaces_planted_boilerplate(spark):
    """J36: a phrase planted across many docs must rank first with
    df == number of docs containing it (not occurrences — within-doc
    repeats count once), and ties break on shingle text ascending."""
    boiler = "subscribe to our newsletter"
    rows = [
        # boilerplate twice IN THE SAME DOC -> still df +1 for that doc
        (i, f"unique words {i} alpha {boiler} middle {boiler} tail")
        for i in range(6)
    ] + [(100, "totally unrelated content here"), (101, "more unrelated words again")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = corpus.top_ngrams(df, shingle_k=3, top_k=20).collect()
    assert got[0]["df"] == 6
    by_shingle = {r["shingle"]: r["df"] for r in got}
    assert by_shingle.get("subscribe to our") == 6
    assert by_shingle.get("to our newsletter") == 6
    # deterministic tie-break: equal-df shingles in text order
    top_df = [r["df"] for r in got]
    assert top_df == sorted(top_df, reverse=True)
    equal = [r["shingle"] for r in got if r["df"] == got[0]["df"]]
    assert equal == sorted(equal)


def test_top_ngrams_plan_is_take_ordered(spark, sf_smoke):
    """The top-k must plan as TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort through one task."""
    import contextlib
    import io

    docs = load_table(spark, sf_smoke, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus.top_ngrams(docs).explain(mode="simple")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange SinglePartition" not in p, p


def test_weighted_sample_invariants(spark):
    """J39 A-ES invariants that hold DETERMINISTICALLY under the fixed
    uniform_hash draw: (a) non-positive weights are never sampled, even
    when the group is under-full; (b) raising one row's weight (others
    fixed) never worsens its rank — ln(u)/w is increasing in w for the
    same u."""
    from pyspark.sql import functions as F

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        weighted_sample_per_group,
    )

    rows = [("g", i, 0.5) for i in range(1, 9)] + [("g", 9, 0.0), ("g", 10, -1.0)]
    df = spark.createDataFrame(rows, "source string, doc_id long, w double")
    out = weighted_sample_per_group(df, "source", "doc_id", F.col("w"), k=20)
    got = {r.doc_id: r.rank for r in out.collect()}
    assert set(got) == set(range(1, 9))  # w<=0 excluded despite k=20

    boosted = spark.createDataFrame(
        [("g", i, 0.5 if i != 5 else 50.0) for i in range(1, 9)],
        "source string, doc_id long, w double",
    )
    base_rank = got[5]
    new_rank = {
        r.doc_id: r.rank
        for r in weighted_sample_per_group(
            boosted, "source", "doc_id", F.col("w"), k=20
        ).collect()
    }[5]
    assert new_rank <= base_rank


def test_quality_filter_value_threshold_keeps_ties(spark):
    """J40: the cut is the quality VALUE at rank ceil(n*(1-keep)); every
    doc at or above it survives — ties at the cut are all kept."""
    from pyspark.sql import functions as F

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        quality_filter,
    )

    rows = [("s", i, q) for i, q in enumerate(
        [0.1, 0.2, 0.2, 0.3, 0.5, 0.6, 0.7, 0.8], start=1
    )]
    df = spark.createDataFrame(rows, "source string, doc_id long, q double")
    # n=8, keep 0.75 -> cut at rank ceil(2)=2 -> cut value 0.2; doc 1
    # (0.1) drops, BOTH 0.2 docs survive (value threshold)
    out = quality_filter(df, "source", "doc_id", F.col("q"), keep_frac=0.75)
    assert {r.doc_id for r in out.collect()} == {2, 3, 4, 5, 6, 7, 8}


def test_token_budget_prefix_rule(spark):
    """J41: selection is the PREFIX of the (quality DESC, id) order —
    the first overflowing doc truncates the group even when a later
    smaller doc would still fit (documented trade; chunk long docs
    first if it matters)."""
    from pyspark.sql import functions as F

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        token_budget_select,
    )

    rows = [
        ("s", 1, 300, 0.9),
        ("s", 2, 400, 0.8),
        ("s", 3, 400, 0.7),  # cum 1100 > 1000 -> truncates
        ("s", 4, 100, 0.6),  # would fit, but prefix rule excludes it
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, nt long, q double")
    out = token_budget_select(
        df, "source", "doc_id", F.col("nt"), F.col("q"), budget_tokens=1000
    )
    got = {r.doc_id: r.cum_tokens for r in out.collect()}
    assert got == {1: 300, 2: 700}


def test_minhash_dedup_incremental_scope(spark):
    """J42: a batch doc near-identical to a CORPUS doc drops; a unique
    batch doc survives; two identical docs WITHIN the batch both
    survive (within-batch dedup is J3/J26's job — documented scope)."""
    from azure_iot_realtime_data_pipeline_spark.operators.dedup import (
        minhash_dedup_incremental,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame([(2, base)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            (1, base),                      # in corpus -> dropped
            (3, "completely different words about spark shuffles and exchanges here"),
            (5, "another unique text on bucketed joins and broadcast thresholds ok"),
            (7, "another unique text on bucketed joins and broadcast thresholds ok"),
        ],
        "doc_id long, text string",
    )
    out = minhash_dedup_incremental(batch, corpus, est_threshold=0.5)
    assert {r.doc_id for r in out.collect()} == {3, 5, 7}


def test_unigram_logprob_orders_common_above_rare(spark):
    """J43: a doc of corpus-frequent tokens must outscore a doc of
    singleton tokens, and every score is <= 0 (log-probabilities)."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        unigram_logprob_scores,
    )

    common = "the the the cat cat sat sat sat on the mat"
    docs = spark.createDataFrame(
        [
            (1, common),
            (2, common),
            (3, "zyx wvu tsr qpo nml kji"),  # singletons -> near the floor
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.logprob_mean for r in unigram_logprob_scores(docs).collect()}
    assert out[1] == out[2] > out[3]
    assert all(v <= 0 for v in out.values())


def test_unigram_logprob_empty_corpus_returns_empty(spark):
    """Review fix: an empty (or all-whitespace) corpus returns the
    documented empty result instead of crashing on a NULL token total."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        unigram_logprob_scores,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_logprob_scores(empty).count() == 0
    blank = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    assert unigram_logprob_scores(blank).count() == 0


def test_quality_filter_keep_all_short_circuits(spark):
    """Review fix: keep_frac=1.0 is the identity (the q=0 rank selects
    nothing, which would otherwise DROP every group via the inner
    join)."""
    from pyspark.sql import functions as F

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        quality_filter,
    )

    df = spark.createDataFrame(
        [("s", 1, 0.1), ("s", 2, 0.9)], "source string, doc_id long, q double"
    )
    out = quality_filter(df, "source", "doc_id", F.col("q"), keep_frac=1.0)
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_remove_frequent_lines_drops_shared_boilerplate(spark):
    # 'cookie banner' appears in 3 docs -> dropped; unique lines survive
    # in order; doc 4 is ALL boilerplate -> empty clean_text, not a
    # missing row; blank lines never count toward frequency.
    rows = [
        (1, "cookie banner\nalpha one\nbeta two"),
        (2, "gamma three\ncookie banner\n\ndelta four"),
        (3, "epsilon five\ncookie banner"),
        (4, "cookie banner"),
        (5, "zeta six\neta seven"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in corpus.remove_frequent_lines(df, min_docs=3).collect()
    }
    assert len(out) == 5
    assert out[1]["clean_text"] == "alpha one\nbeta two"
    assert out[2]["clean_text"] == "gamma three\ndelta four"
    assert out[3]["clean_text"] == "epsilon five"
    assert out[4]["clean_text"] == ""
    assert out[4]["kept_segments"] == 0 and out[4]["removed_segments"] == 1
    assert out[5]["clean_text"] == "zeta six\neta seven"
    assert out[5]["removed_segments"] == 0


def test_remove_frequent_lines_counts_docs_not_occurrences(spark):
    # a line repeated 5x inside ONE doc is not boilerplate (distinct-doc
    # count = 1); the same line across min_docs docs is.
    rows = [
        (1, "refrain\nrefrain\nrefrain\nrefrain\nrefrain\nsolo line"),
        (2, "other text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in corpus.remove_frequent_lines(df, min_docs=2).collect()
    }
    assert out[1]["removed_segments"] == 0
    assert out[1]["clean_text"].count("refrain") == 5


def test_remove_frequent_segments_broadcasts_tiny_frequent_set(spark, sf_oracle):
    # plan gate: the frequent-set mark join is a BroadcastHashJoin (the
    # corpus side never shuffles for the mark) and the corpus-side
    # exchanges are the hash-table counts + ONE reassembly aggregate.
    docs = load_table(spark, sf_oracle, "documents")
    segs = corpus.chunk_documents(docs, chunk_tokens=8, overlap_tokens=0)
    out = corpus.remove_frequent_segments(
        segs, "doc_id", "chunk_idx", "chunk_text", min_docs=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_remove_frequent_lines_treats_delimiter_literally(spark):
    # review regression: '.' is a regex metacharacter — it must split
    # on literal dots only (the rejoin uses it literally too)
    rows = [
        (1, "shared tail.alpha.beta"),
        (2, "shared tail.gamma"),
        (3, "shared tail"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in corpus.remove_frequent_lines(df, min_docs=3, delimiter=".").collect()
    }
    assert out[1]["clean_text"] == "alpha.beta"
    assert out[2]["clean_text"] == "gamma"
    assert out[3]["clean_text"] == ""
    assert out[3]["removed_segments"] == 1


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_remove_frequent_segments_matches_naive_reference(spark, docs):
    """J46 property test: for arbitrary small corpora (segments drawn
    from a 6-symbol alphabet so cross-doc repeats are common), the
    operator equals a naive Python reference applying the same
    distinct-doc-count >= min_docs rule and position-order reassembly."""
    min_docs = 2
    rows = [
        (i, pos, f"s{tok}")
        for i, segs in enumerate(docs)
        for pos, tok in enumerate(segs)
    ]
    if not rows:
        return
    seg_df = spark.createDataFrame(rows, "doc_id long, pos int, seg string")
    got = {
        r["doc_id"]: (r["kept_segments"], r["removed_segments"], r["clean_text"])
        for r in corpus.remove_frequent_segments(
            seg_df, "doc_id", "pos", "seg", min_docs=min_docs
        ).collect()
    }
    from collections import defaultdict

    seen = defaultdict(set)
    for i, segs in enumerate(docs):
        for tok in segs:
            seen[f"s{tok}"].add(i)
    frequent = {s for s, d in seen.items() if len(d) >= min_docs}
    want = {}
    for i, segs in enumerate(docs):
        if not segs:
            continue  # no segments -> no row, matching the group-by
        kept = [f"s{t}" for t in segs if f"s{t}" not in frequent]
        removed = len(segs) - len(kept)
        want[i] = (len(kept), removed, " ".join(kept))
    assert got == want

def test_bigram_lm_denominator_fixed_before_pruning(spark):
    """J49: P(w2|w1) denominates over ALL continuations of w1 even when
    min_count prunes some of them — probabilities must NOT renormalize
    over survivors; single-token and empty docs contribute nothing."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import bigram_lm

    docs = spark.createDataFrame(
        [
            (1, "a b a b a c"),   # pairs: ab, ba, ab, ba, ac
            (2, "a b"),           # ab
            (3, "solo"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {(r["w1"], r["w2"]): r for r in bigram_lm(docs, min_count=2).collect()}
    # a->b n=3, a->c n=1 (pruned): P(b|a) = 3/4, not 3/3
    assert set(out) == {("a", "b"), ("b", "a")}
    assert out[("a", "b")]["n"] == 3 and out[("a", "b")]["prob"] == 0.75
    assert out[("b", "a")]["n"] == 2 and out[("b", "a")]["prob"] == 1.0

def _naive_bpe(word_counts, n_merges, min_pair_count=2):
    """Reference BPE on a word-frequency dict: max-count pair (ties:
    lexicographic smallest), greedy left-to-right non-overlapping
    rewrite — Sennrich et al. 2016 semantics."""
    words = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0
                ) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        new_words = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def test_bpe_matches_naive_reference_on_classic_corpus(spark):
    """J51: the distributed learner reproduces the reference BPE merge
    list (order, pairs, weighted counts) on a hand-checkable corpus,
    including the overlapping-run greedy rewrite."""
    from collections import Counter

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        bpe_learn_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaa banana",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    wc = Counter(w for t in texts for w in t.split() if w)
    want = _naive_bpe(wc, 8)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges(docs, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=30,
    )
)
def test_bpe_matches_naive_reference_property(spark, words):
    """J51 property test: arbitrary small corpora (heavy duplicate and
    overlapping-pair pressure from a 3-letter alphabet) — merge lists
    must match the reference exactly."""
    from collections import Counter

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    want = _naive_bpe(Counter(words), 5)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges(docs, n_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want

def test_bpe_merge_prefix_stability(spark):
    """VERDICT r5 #6: two stability laws for the rows-only J51 surface.
    (a) Budget growth: the first k rules of an n>k-merge run equal the
    k-merge run exactly (greedy BPE never revises earlier rules).
    (b) Corpus replication: duplicating every document scales each
    pair_count by the replication factor but leaves the (rank, left,
    right) rule sequence identical — the argmax order is count-ratio
    driven, so uniform growth cannot reorder it."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        bpe_learn_merges,
    )

    texts = ["low low low lower lowest", "new newer newest low", "banana band"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    full = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    short = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    assert full[: len(short)] == short

    tripled = spark.createDataFrame(
        [(100 * k + i, t) for k in range(3) for i, t in enumerate(texts)],
        ["doc_id", "text"],
    )
    grown = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges(tripled, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert [(g[0], g[1], g[2]) for g in grown] == [(f[0], f[1], f[2]) for f in full]
    assert [g[3] for g in grown] == [3 * f[3] for f in full]


def test_bpe_driver_and_distributed_paths_agree(spark):
    """r13 optimization gate: bpe_learn_merges' bounded driver fast path
    (vocab table collected, greedy loop in Python) and the distributed
    iteration (forced via driver_vocab_rows=0) must produce the SAME
    merge list — rank, pair, and weighted count — on a corpus with
    overlapping runs and ties."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        bpe_learn_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaa banana band",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )

    def rows(df):
        return [
            (r["merge_rank"], r["left"], r["right"], r["pair_count"])
            for r in df.orderBy("merge_rank").collect()
        ]

    fast = rows(bpe_learn_merges(docs, n_merges=8))
    dist = rows(bpe_learn_merges(docs, n_merges=8, driver_vocab_rows=0))
    assert fast == dist
    assert len(fast) > 0


def test_bpe_encode_driver_and_distributed_paths_agree(spark, monkeypatch):
    """r14 optimization gate (the learner's gate extended to the APPLY
    side): bpe_encode's bounded driver fast path (distinct words
    collected, rules applied via _bpe_rewrite_local, broadcast literal
    vocab) and the distributed nested-fold path (forced by patching the
    vocab bound to 0) must produce identical rows INCLUDING the ordered
    bpe_tokens arrays — on a corpus with overlapping runs, ties, empty
    docs and repeated words."""
    from azure_iot_realtime_data_pipeline_spark.operators import corpus

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaa banana band",
        "",
        "aaa aaa aaa",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = corpus.bpe_learn_merges(docs, n_merges=6)

    def rows(df):
        return sorted(
            (
                r["doc_id"], r["n_words"], r["n_chars"], r["n_bpe_tokens"],
                tuple(r["bpe_tokens"]),
            )
            for r in df.collect()
        )

    fast = rows(corpus.bpe_encode(docs, merges, keep_tokens=True))
    fused = rows(corpus.bpe_train_encode(docs, n_merges=6, keep_tokens=True))
    monkeypatch.setattr(corpus, "BPE_DRIVER_VOCAB_ROWS", 0)
    dist = rows(corpus.bpe_encode(docs, merges, keep_tokens=True))
    dist_fused = rows(
        corpus.bpe_train_encode(
            docs, n_merges=6, keep_tokens=True, driver_vocab_rows=0
        )
    )
    assert fast == dist
    # the r14 fused train→apply operator equals the composition on both
    # its driver and its distributed-fallback path
    assert fused == fast
    assert dist_fused == fast
    assert any(r[3] < r[2] for r in fast)  # at least one merge applied


def test_dedup_pipeline_verify_prunes_false_candidates(spark):
    """J52: exact-Jaccard verification keeps true near-dups and prunes
    candidate pairs whose real overlap is below the verify threshold."""
    from azure_iot_realtime_data_pipeline_spark.operators.dedup import (
        dedup_verified_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, "completely different text about spark engines and shuffles at scale")],
        ["doc_id", "text"],
    )
    out = dedup_verified_pairs(
        docs, est_threshold=0.0, verify_threshold=0.5
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)
    row = next(r for r in out if (r["doc_a"], r["doc_b"]) == (1, 2))
    assert row["jaccard"] >= 0.5



def test_ccnet_buckets_per_language_terciles(spark):
    """J55: equal-count rank terciles WITHIN each language; head holds
    the best LM scores under the deterministic (score DESC, doc_id ASC)
    order, and bucket sizes per language differ by at most one."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        ccnet_buckets,
    )

    rows = []
    # lang A: 7 docs — 'common common' scores high (frequent tokens),
    # increasingly rare-token soup scores lower
    for i in range(7):
        rows.append((i, "common " * (8 - i) + f"rare{i} " * i, "en"))
    # lang B: 5 docs
    for i in range(5):
        rows.append((100 + i, "shared " * (6 - i) + f"junk{i} " * i, "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "de"}
    for lang, rs in by_lang.items():
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r.bucket] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        # rank order respects (score DESC, doc_id ASC) bucket monotonicity
        order = sorted(rs, key=lambda r: (-r.logprob_mean, r.doc_id))
        idxs = [r.bucket_idx for r in order]
        assert idxs == sorted(idxs), (lang, idxs)


def test_temperature_mixture_alpha_limits(spark):
    """J56: alpha=1 reproduces natural shares, alpha=0 is uniform,
    alpha=0.7 sits between; weights sum to ~1 and epochs = weight/p."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        temperature_mixture,
    )

    rows = [(i, "tok " * 90, "big") for i in range(9)] + [
        (100, "tok " * 10, "small")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def as_map(alpha):
        return {
            r.source: r for r in temperature_mixture(docs, alpha=alpha).collect()
        }

    nat = as_map(1.0)
    assert abs(nat["big"].weight - nat["big"].p) < 1e-5
    assert abs(nat["small"].weight - 0.012195) < 1e-5  # 10/820
    uni = as_map(0.0)
    assert abs(uni["big"].weight - 0.5) < 1e-5
    assert abs(uni["small"].weight - 0.5) < 1e-5
    mid = as_map(0.7)
    assert nat["small"].weight < mid["small"].weight < uni["small"].weight
    assert abs(sum(r.weight for r in mid.values()) - 1.0) < 1e-5
    for r in mid.values():
        assert abs(r.epochs - r.weight / r.p) < 1e-3
    # the up-weighted small source repeats; the big one is under-sampled
    assert mid["small"].epochs > 1.0 > mid["big"].epochs


def test_hard_negatives_excludes_near_dups_before_rank(spark):
    """J57: a candidate above dup_threshold is INVISIBLE (does not eat a
    slot), the survivors re-rank contiguously, and no returned cosine
    crosses the threshold."""
    from azure_iot_realtime_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        hard_negatives,
    )

    # query q0 = [1,0]; candidate 1 is its near-dup (cos=1.0), the rest
    # fan out at decreasing cosine
    import math

    def vec(theta):
        return [float(math.cos(theta)), float(math.sin(theta))]

    q = spark.createDataFrame([(0, vec(0.0))], "query_id long, qv array<float>")
    cands = [(1, vec(0.0))] + [
        (i, vec(0.12 * (i - 1))) for i in range(2, 8)
    ]
    c = spark.createDataFrame(cands, "cand_id long, cv array<float>")
    plain = cosine_topk(q, c, k=3).collect()
    hard = hard_negatives(q, c, k=3, dup_threshold=0.999).collect()
    assert [r.cand_id for r in plain][0] == 1  # dup tops the plain rank
    got = [r.cand_id for r in hard]
    assert 1 not in got and len(got) == 3  # excluded, slots refilled
    assert [r.rank for r in hard] == [1, 2, 3]
    assert all(r.cosine < 0.999 for r in hard)


def test_frozen_lm_scoring_is_bit_identical_to_batch(spark, sf_smoke):
    """Frozen-model scoring (the incremental/streaming path) must
    reproduce the batch scorer EXACTLY: the model's lp integers are
    collected from the same Spark plan and the mapInPandas mean replays
    the identical IEEE sequence, so every (doc_id, n_tokens,
    logprob_mean) triple matches bit-for-bit."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        freeze_unigram_model,
        score_with_frozen_lm,
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_smoke, "documents")
    want = {
        r.doc_id: (r.n_tokens, r.logprob_mean)
        for r in unigram_logprob_scores(docs).collect()
    }
    model = freeze_unigram_model(docs)
    got = {
        r.doc_id: (r.n_tokens, r.logprob_mean)
        for r in score_with_frozen_lm(docs, model).collect()
    }
    assert got == want
    assert len(got) > 0


def test_ccnet_assign_null_middle_min_collapses_to_head_tail(spark):
    """ADVICE r7: a language whose batch split produced no 'middle'
    rows (1-2 doc stratum) has NULL middle_min; assignment must
    collapse middle into head/tail deterministically (NULL only for
    UNSEEN languages), never let the NULL comparison route rows
    through an undefined branch."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        ccnet_assign,
    )

    thresholds = spark.createDataFrame(
        [("xx", -5.0, None)], "lang string, head_min double, middle_min double"
    )
    scored = spark.createDataFrame(
        [
            (1, "xx", -4.0),   # >= head_min -> head
            (2, "xx", -5.0),   # boundary tie -> higher bucket (head)
            (3, "xx", -9.0),   # below head_min, no middle stratum -> tail
            (4, "yy", -1.0),   # unseen language -> NULL
        ],
        "doc_id long, lang string, logprob_mean double",
    )
    got = {r.doc_id: r.bucket for r in ccnet_assign(scored, thresholds).collect()}
    assert got == {1: "head", 2: "head", 3: "tail", 4: None}


def test_ccnet_assign_matches_batch_buckets_off_boundary(spark, sf_smoke):
    """Threshold assignment of the SAME corpus agrees with the batch
    rank split everywhere except exact boundary-score ties (where the
    rank split arbitrates by doc_id but thresholds send every tie to
    the higher bucket — the documented divergence)."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        ccnet_assign,
        ccnet_buckets,
        ccnet_thresholds,
        freeze_unigram_model,
        score_with_frozen_lm,
    )

    docs = load_table(spark, sf_smoke, "documents")
    bucketed = ccnet_buckets(docs)
    batch = {r.doc_id: r for r in bucketed.collect()}
    thresholds = ccnet_thresholds(bucketed)
    bounds = {
        r.lang: {r.head_min, r.middle_min} for r in thresholds.collect()
    }
    scored = score_with_frozen_lm(
        docs, freeze_unigram_model(docs), carry_cols=("lang",)
    )
    assigned = {r.doc_id: r.bucket for r in ccnet_assign(scored, thresholds).collect()}
    assert set(assigned) == set(batch)
    checked = 0
    for did, b in batch.items():
        if b.logprob_mean in bounds[b.lang]:
            continue  # boundary tie: divergence is the documented contract
        assert assigned[did] == b.bucket, (did, assigned[did], b.bucket)
        checked += 1
    assert checked > len(batch) * 0.8  # the exemption must stay rare


def test_frozen_lm_score_and_assign_work_on_a_stream(spark, sf_smoke, tmp_path):
    """The production shape: new docs arrive as a STREAM, score against
    the frozen model (stateless mapInPandas) and bucket-assign against
    broadcast thresholds — append mode, no watermark, no state. The
    streamed assignment must equal the batch assignment of the same
    rows."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        ccnet_assign,
        ccnet_buckets,
        ccnet_thresholds,
        freeze_unigram_model,
        score_with_frozen_lm,
    )

    docs = load_table(spark, sf_smoke, "documents")
    model = freeze_unigram_model(docs)
    thresholds = ccnet_thresholds(ccnet_buckets(docs))
    staged = str(tmp_path / "docs_stream")
    docs.coalesce(2).write.mode("overwrite").parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    scored = score_with_frozen_lm(stream, model, carry_cols=("lang",))
    q = (
        ccnet_assign(scored, thresholds)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ccnet_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_ccnet"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.doc_id: r.bucket
        for r in spark.sql("select doc_id, bucket from ccnet_stream").collect()
    }
    batch_scored = score_with_frozen_lm(docs, model, carry_cols=("lang",))
    want = {
        r.doc_id: r.bucket for r in ccnet_assign(batch_scored, thresholds).collect()
    }
    assert got == want and len(got) > 0


def test_temperature_mixture_zero_token_source_gets_null_epochs(spark):
    """A source whose docs are all empty-text: p=0, weight=0, epochs
    NULL (0/0 is undefined — Spark's zero-divisor NULL and DuckDB's
    IEEE NaN would otherwise diverge; review r7)."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        temperature_mixture,
    )

    rows = [(1, "tok tok tok", "real"), (2, "", "hollow"), (3, "  ", "hollow")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in temperature_mixture(docs, alpha=0.7).collect()}
    assert out["hollow"].p == 0.0 and out["hollow"].weight == 0.0
    assert out["hollow"].epochs is None
    assert out["real"].weight == 1.0 and out["real"].epochs == 1.0


def test_frozen_lm_empty_model_scores_nothing(spark):
    """A model frozen from an empty/all-empty-text corpus must score
    ZERO rows — the batch scorer's contract — not fabricate mean=0.0
    'perfect' scores that would route junk to the head bucket
    (review r7)."""
    from azure_iot_realtime_data_pipeline_spark.operators.relevance import (
        freeze_unigram_model,
        score_with_frozen_lm,
    )

    empty = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    model = freeze_unigram_model(empty)
    assert model == {"vocab": {}, "floor_lp": None}
    docs = spark.createDataFrame([(7, "some new text")], "doc_id long, text string")
    assert score_with_frozen_lm(docs, model).count() == 0


def _ref_bpe_encode(word: str, rules: list[tuple[str, str]]) -> list[str]:
    """Plain-python mirror of bpe_encode's fold: rules in rank order,
    each greedy left-to-right non-overlapping."""
    syms = list(word)
    for a, b in rules:
        out: list[str] = []
        for ch in syms:
            if out and out[-1] == a and ch == b:
                out[-1] = a + b
            else:
                out.append(ch)
        syms = out
    return syms


def test_bpe_encode_matches_reference_on_learned_rules(spark):
    """J63: encoding the training corpus with its own learned merges
    equals the python reference per word; concatenation reconstructs
    every word (the fold never loses characters); n_chars ==
    n_bpe_tokens under zero merges."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        bpe_encode,
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [
            (0, "low lower lowest low low"),
            (1, "newer newest new knew"),
            (2, "aaa aaaa baaab"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(docs, n_merges=6, min_pair_count=2)
    rules = [
        (r["left"], r["right"]) for r in merges.orderBy("merge_rank").collect()
    ]
    assert rules  # the fixture must actually learn something
    got = {
        r.doc_id: r
        for r in bpe_encode(docs, merges, keep_tokens=True).collect()
    }
    for doc_id, text in [(0, "low lower lowest low low"),
                         (1, "newer newest new knew"),
                         (2, "aaa aaaa baaab"), (3, "")]:
        words = [w for w in text.split(" ") if w]
        want = [t for w in words for t in _ref_bpe_encode(w, rules)]
        assert list(got[doc_id].bpe_tokens) == want, doc_id
        assert got[doc_id].n_bpe_tokens == len(want)
        assert "".join(want) == "".join(words)  # reconstruction
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_chars == sum(len(w) for w in words)
    # zero merges: every word splits to single chars
    empty = merges.limit(0)
    zero = {r.doc_id: r for r in bpe_encode(docs, empty).collect()}
    for i in zero:
        assert zero[i].n_bpe_tokens == zero[i].n_chars


def test_stratified_split_exact_proportions_per_stratum(spark):
    """J70: every stratum — including one SMALLER than a split slot —
    gets exact floor proportions; weights validate; assignment is
    deterministic across runs."""
    import pytest

    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        stratified_split,
    )

    rows = [(i, "en", "web") for i in range(100)]
    rows += [(100 + i, "fr", "web") for i in range(10)]
    rows += [(200, "de", "web")]  # 1-row stratum: all rows -> last split
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = stratified_split(docs, ["lang", "source"]).collect()
    from collections import Counter

    c = Counter((r.lang, r.split) for r in out)
    assert c[("en", "train")] == 80 and c[("en", "val")] == 10
    assert c[("en", "test")] == 10
    assert c[("fr", "train")] == 8 and c[("fr", "val")] == 1
    assert c[("fr", "test")] == 1
    assert c[("de", "test")] == 1  # floor(0.8*1)=0, floor(0.9*1)=0
    again = stratified_split(docs, ["lang", "source"]).collect()
    assert {(r.doc_id, r.split) for r in again} == {
        (r.doc_id, r.split) for r in out
    }
    with pytest.raises(ValueError, match="1000000"):
        stratified_split(docs, ["lang"], weights_ppm=(("a", 1), ("b", 2)))
    # single-split tuple is valid: everything labels as that split
    # (review r7 s5 pass 4: the empty CASE chain crashed on .otherwise)
    allrows = stratified_split(
        docs, ["lang"], weights_ppm=(("all", 1_000_000),)
    ).collect()
    assert {r.split for r in allrows} == {"all"} and len(allrows) == 111


def test_ngram_kl_zero_on_identical_and_positive_on_disjoint(spark):
    """J71: KL(a||a) is ~0 (only smoothing-lattice dust); disjoint
    vocabularies score far higher; column contract carries both totals."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import ngram_kl

    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, "omega psi chi phi") for i in range(20)],
        "doc_id long, text string",
    )
    same = ngram_kl(a, a).collect()[0]
    assert abs(same.kl_nats) < 1e-3
    assert same.a_feats == same.b_feats > 0
    diff = ngram_kl(a, b).collect()[0]
    assert diff.kl_nats > 0.3  # disjoint vocab (smoothing over 1024
    # buckets bounds the per-bucket ratio at this tiny feature count)


def test_shard_assign_layout_contracts(spark, sf_smoke):
    """J76: every doc lands in exactly one of n_shards roughly-equal
    shards; within a shard, pos is 1..size with cum_tokens the exact
    running token sum; the layout is deterministic across runs; and
    within-shard order is NOT id order (the reproducible-shuffle
    property a training loader needs)."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import shard_assign

    docs = load_table(spark, sf_smoke, "documents")
    out = shard_assign(docs, n_shards=8).collect()
    assert len(out) == docs.filter(F.col("doc_id").isNotNull()).count()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(8))
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 0 and max(sizes) / min(sizes) < 2.5, sizes
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
        cum = 0
        for r in rows:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
    # reproducible shuffle: same layout on a second run, but not id order
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in
             shard_assign(docs, n_shards=8).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in out}
    some_shard = max(by_shard.values(), key=len)
    ids_by_pos = [r["doc_id"] for r in sorted(some_shard, key=lambda r: r["pos"])]
    assert ids_by_pos != sorted(ids_by_pos)


def test_ngram_diversity_separates_template_farm_from_diverse_source(spark):
    """J79 boundaries: a source of near-identical template docs scores
    far lower distinct-trigram ratio than a diverse source; a source
    whose docs all have < k tokens reports 0 trigrams and NULL
    trigram_ttr (never a division error); an empty-text source reports
    NULL ttr."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        ngram_diversity,
    )

    template = "click here to claim your free prize now"
    rows = [(i, template, "farm") for i in range(20)]
    rows += [
        (100 + i, f"unique document number {i} discussing topic {i * 7} deeply", "varied")
        for i in range(20)
    ]
    rows += [(200, "too short", "tiny"), (201, "", "empty")]
    rows += [(202, "null source still gets its real ratios computed", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in ngram_diversity(docs).collect()}
    assert out[None]["n_tokens"] == 8 and out[None]["ttr"] == 1.0
    assert out["farm"]["trigram_ttr"] < 0.1
    assert out["varied"]["trigram_ttr"] > 0.5
    assert out["farm"]["ttr"] < out["varied"]["ttr"]
    assert out["tiny"]["n_trigrams"] == 0 and out["tiny"]["trigram_ttr"] is None
    assert out["empty"]["n_tokens"] == 0 and out["empty"]["ttr"] is None
    assert out["empty"]["n_distinct_tokens"] == 0


def test_collocations_rank_real_phrases_above_independents(spark):
    """J80 semantics: a corpus where 'new york' always co-occurs scores
    that bigram's PMI far above a bigram of two frequent-but-independent
    words; hapax bigrams are pruned by min_count; empty corpora return
    an empty frame instead of dividing by zero."""
    from azure_iot_realtime_data_pipeline_spark.operators.corpus import (
        collocations,
    )

    phrase_doc = "visited new york today and yesterday"
    rows = [(i, phrase_doc, "s") for i in range(10)]
    # 'and'/'today' both frequent but adjacent only here:
    rows += [(100 + i, "today and tomorrow maybe", "s") for i in range(10)]
    rows += [(200, "rare hapax pairing", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["w1"], r["w2"]): r for r in collocations(docs, min_count=5).collect()}
    assert ("new", "york") in out
    assert ("rare", "hapax") not in out  # hapax pruned
    indep = out[("today", "and")]
    assert out[("new", "york")]["pmi"] > indep["pmi"]
    # empty corpus: empty result, no division error
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert collocations(empty).count() == 0


def test_bpe_encode_fixed_rules_digram_equivalence(spark):
    """q_bpe_encode_fixed's oracle premise, pinned on adversarial
    words: for pairwise character-disjoint unchained rules, the greedy
    left-to-right fold (the REAL bpe_encode machinery) equals
    chars - sum of non-overlapping digram counts — including repeat
    runs (erer/eer/ere), cross-rule adjacency (thin/thein), and words
    with no matches at all."""
    from azure_iot_realtime_data_pipeline_spark.plans.queries import (
        BPE_FIXED_RULES,
    )
    from azure_iot_realtime_data_pipeline_spark.operators import corpus

    words = [
        "ther", "erer", "eer", "ere", "thth", "thin", "thein", "xyzzy",
        "masou", "asas", "aassas", "inin", "thhe", "tth", "outhouse",
    ]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(BPE_FIXED_RULES)],
        "merge_rank long, left string, right string",
    )
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in corpus.bpe_encode(docs, merges).collect()
    }

    def digram_count(w: str, d: str) -> int:
        return (len(w) - len(w.replace(d, ""))) // 2

    for i, w in enumerate(words):
        want = len(w) - sum(digram_count(w, a + b) for a, b in BPE_FIXED_RULES)
        assert got[i] == want, (w, got[i], want)

    # and against the true greedy fold in plain python
    def greedy(w: str) -> int:
        syms = list(w)
        for a, b in BPE_FIXED_RULES:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return len(syms)

    for i, w in enumerate(words):
        assert got[i] == greedy(w), w
