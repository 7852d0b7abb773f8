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
