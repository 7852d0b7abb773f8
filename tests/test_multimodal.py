"""Multimodal plumbing tests: binary columns, mapInPandas batch shapes,
decode-stub gating, frame-sampling fan-out (Phase 4 north-star ops)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.operators import dedup, multimodal
from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    return multimodal.attach_payload(docs)


def test_payload_is_binary_with_typed_meta(media):
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<content_type:string,n_bytes:bigint")
    row = media.limit(1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_media_features_match_local_hash(spark, sf_smoke, media):
    feats = {r["doc_id"]: r for r in multimodal.media_features(media).collect()}
    docs = load_table(spark, sf_smoke, "documents").limit(20).collect()
    for d in docs:
        payload = d["text"].encode("utf-8")
        f = feats[d["doc_id"]]
        assert f["n_bytes"] == len(payload)
        assert f["sha256"] == hashlib.sha256(payload).hexdigest()
        assert f["magic"] == payload[:4].hex()


def test_image_meta_deterministic_and_bounded(media):
    rows = multimodal.image_meta(media).collect()
    assert rows
    for r in rows:
        assert 64 <= r["width"] < 256
        assert 64 <= r["height"] < 256
        assert 1 <= r["channels"] <= 4
    again = {(r["doc_id"], r["width"], r["height"]) for r in multimodal.image_meta(media).collect()}
    assert {(r["doc_id"], r["width"], r["height"]) for r in rows} == again


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n")


def test_frame_sampling_fans_out(media):
    frames = multimodal.sample_frames(media, frame_bytes=64, every_n=2)
    n_media = media.count()
    assert frames.count() >= n_media  # >=1 frame per doc, fan-out allowed
    one = (
        frames.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.min("frame_idx").alias("first_idx"))
        .collect()
    )
    assert all(r["first_idx"] == 0 for r in one)
    sizes = media.select("doc_id", F.length("payload").alias("n_bytes")).collect()
    by_id = {r["doc_id"]: r["n_bytes"] for r in sizes}
    import math

    for r in one:
        expected = math.ceil(max(by_id[r["doc_id"]] // 64, 1) / 2)
        assert r["n"] == expected, r["doc_id"]


def test_embedding_near_dup_lsh_is_subset_of_exact(spark, sf_smoke):
    """The LSH-bucketed scale path returns a subset of the exact pairs
    (candidate generation may miss, must never invent)."""
    emb = load_table(spark, sf_smoke, "embeddings").filter(F.col("vec_id") < 120)
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup(emb, threshold=0.25).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup(
            emb, threshold=0.25, num_planes=2, dim=64
        ).collect()
    }
    assert lsh <= exact
    assert exact  # threshold tuned so the test is non-vacuous


def test_embedding_near_dup_exact_refuses_unbounded_input(spark, sf_smoke):
    """VERDICT r5 #5: the num_planes=0 all-pairs crossJoin is a bounded-
    slice tool; pointing it at anything larger than max_exact_rows must
    raise (naming the LSH escape hatch), never silently run O(n^2)."""
    import pytest

    emb = load_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="num_planes>0"):
        dedup.embedding_near_dup(emb, threshold=0.25, max_exact_rows=10)
    # explicit raise of the bound is the documented override
    small = emb.filter(F.col("vec_id") < 30)
    assert (
        dedup.embedding_near_dup(small, threshold=-1.0, max_exact_rows=30)
        .count()
        == 30 * 29 // 2
    )


def test_image_ahash_pairs_find_duplicate_payloads(spark):
    """J44 pairs: identical payloads -> hamming 0 and paired; the
    unrelated doc pairs with nothing at the threshold (fake-decode
    signatures are avalanche-random for different payloads)."""
    from azure_iot_realtime_data_pipeline_spark.operators import multimodal

    docs = spark.createDataFrame(
        [
            (1, "the same exact image payload bytes"),
            (2, "the same exact image payload bytes"),
            (3, "a completely different payload"),
        ],
        "doc_id long, text string",
    )
    media = multimodal.attach_payload(docs)
    pairs = multimodal.image_ahash_pairs(media, max_hamming=8).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert got.get((1, 2)) == 0
    assert all(k == (1, 2) for k in got)


def test_image_ahash_bit_convention(spark):
    """Pixel 0 (first sha256 hex digit) maps to the MSB of the first
    output hex char — pinned against a hand-computed signature."""
    import hashlib

    from azure_iot_realtime_data_pipeline_spark.operators import multimodal

    payload = "x".encode()
    px = [int(c, 16) for c in hashlib.sha256(payload).hexdigest()]
    mean = sum(px) / 64.0
    bits = 0
    for i, p in enumerate(px):
        if p > mean:
            bits |= 1 << (63 - i)
    want = format(bits, "016x")

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    got = multimodal.image_ahash(multimodal.attach_payload(docs)).collect()[0]
    assert got.ahash_hex == want
