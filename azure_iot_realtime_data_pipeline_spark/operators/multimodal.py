"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north-star extension per the build contract; no analog in the
reference, which is telemetry-only): image/audio/video assets ride as
`binary` columns with a typed metadata struct beside them, and every
media operator is a Pandas-UDF batch transform over `mapInPandas` —
Arrow moves the bytes columnar-batch-wise, Python touches each batch
once, and the plan stays a single narrow map stage (no shuffle, no
driver collect), which is the only shape that survives 100 TB of blobs.

The decode step is STUBBED: this container ships no image/audio codecs
(no PIL/cv2/ffmpeg), so `decode_image` raises NotImplementedError
unless a codec is importable, and `fake_decode_meta` provides a
deterministic stand-in (dimensions derived from payload bytes) so the
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is fully real and fully tested. Swapping the stub for a
real codec changes no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata contract for media rows
MEDIA_SCHEMA = (
    "doc_id BIGINT, modality STRING, payload BINARY, "
    "meta STRUCT<content_type: STRING, n_bytes: BIGINT>"
)

FEATURE_SCHEMA = "doc_id BIGINT, n_bytes BIGINT, sha256 STRING, magic STRING"

IMAGE_META_SCHEMA = "doc_id BIGINT, width INT, height INT, channels INT"

FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_payload BINARY"


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary payload stand-in: the UTF-8 bytes of `text`
    posing as an opaque blob, with the typed metadata struct beside it.
    Real ingestion would read blob files; every operator below only sees
    (binary, meta) and cannot tell the difference."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("image").alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over mapInPandas: byte length, sha256
    hex, and the 4-byte magic prefix — the no-codec subset of what a
    real pipeline computes before routing by container type."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "magic": payloads.map(lambda b: b[:4].hex()),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - requires codec
    """REAL decode path — unavailable in this container (no PIL/cv2).
    Kept as the single swap point for production."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/cv2); "
            "use fake_decode_meta for plumbing tests"
        ) from exc


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (width, height, channels)
    derived from the payload digest — stable across runs/engines."""
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    channels = 1 + d[2] % 4
    return width, height, channels


def image_meta(media: DataFrame) -> DataFrame:
    """Decode-and-measure via mapInPandas (stubbed decode). The plan is
    the production plan: narrow map over Arrow batches."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "channels": dims.map(lambda t: t[2]).astype("int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(extract, IMAGE_META_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Video frame-sampling analog: treat the payload as concatenated
    fixed-size frames and emit every n-th one. Output rows fan out (one
    per sampled frame) but stay within the same narrow map stage —
    mapInPandas may return more rows than it receives."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // frame_bytes, 1)
                for i in range(0, n_frames, every_n):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_payload": pd.Series(out_frames, dtype="object"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


AHASH_SCHEMA = "doc_id BIGINT, ahash_hex STRING"


def fake_decode_pixels(payload: bytes) -> list[int]:
    """Deterministic stand-in for decode-and-resize: an 8x8 grayscale
    grid of 4-bit pixels from the payload's sha256 hex digest (64 hex
    chars -> 64 pixels). The REAL path decodes the image and averages
    into an 8x8 luma grid; everything downstream of the pixel list is
    the production algorithm either way."""
    h = hashlib.sha256(payload).hexdigest()
    return [int(c, 16) for c in h]


def image_ahash(media: DataFrame) -> DataFrame:
    """J44 image average-hash (aHash): bit i of the 64-bit signature is
    set iff pixel_i exceeds the grid mean — the classic perceptual
    fingerprint whose hamming distance survives re-encode/resize on
    real decodes (on the fake decode only exact payloads collide; the
    plumbing, banding and pair math are the production shape). Narrow
    Arrow map, zero shuffle; signature emitted as a 16-char hex string
    (engine-portable, same convention as simhash_hex_portable)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b: bytes) -> str:
                px = fake_decode_pixels(b)
                mean = sum(px) / 64.0
                bits = 0
                for i, p in enumerate(px):
                    if p > mean:
                        bits |= 1 << (63 - i)
                return format(bits, "016x")

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash_hex": pdf["payload"].map(one)}
            )

    return media.select("doc_id", "payload").mapInPandas(extract, AHASH_SCHEMA)


def image_ahash_pairs(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image candidate pairs at hamming <= max_hamming:
    the signature table self-joins on 4 exact-match BANDS of 16 bits
    each (any pair within hamming 8 of a 64-bit signature agrees on at
    least one quarter by pigeonhole... for hamming <= 3 bands-1;
    banding at 4x16 guarantees recall for hamming <= 3 and catches most
    of hamming <= 8 — the standard LSH-for-hamming trade), then exact
    hamming via per-hex-digit XOR popcounts, all JVM expressions."""
    from pyspark.sql import functions as F

    sig = image_ahash(media)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("ahash_hex", b * 4 + 1, 4).alias("bkey"),
            )
            for b in range(4)
        ]
    )
    banded = sig.select(
        "doc_id", "ahash_hex", F.explode(bands).alias("bs")
    ).select(
        "doc_id", "ahash_hex", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    digit = lambda side, i: F.conv(  # noqa: E731
        F.substring(F.col(f"{side}.ahash_hex"), i + 1, 1), 16, 10
    ).cast("int")
    hamming = sum(
        F.bit_count(digit("a", i).bitwiseXOR(digit("b", i))) for i in range(16)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
