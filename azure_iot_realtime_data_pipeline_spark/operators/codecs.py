"""Pure-python/numpy codecs for PUBLIC container formats.

Everything here implements published specifications with only the
standard library (zlib for PNG's DEFLATE) and numpy — no PIL/cv2/
ffmpeg. This closes three of the "compressed codec" swap points that
`operators/multimodal.py` documented since r10:

- PNG (W3C PNG spec / RFC 2083): full decode of 8-bit non-interlaced
  images in all five color types (gray, RGB, palette, gray+alpha,
  RGBA) including all five scanline filters (None/Sub/Up/Average/
  Paeth), plus an encoder with a selectable filter so round-trip tests
  exercise every unfilter path. PNG *is* a compressed codec (DEFLATE +
  predictive filters) — with this module the image decode path is real
  for a genuinely compressed format, not just for uncompressed
  containers.
- G.711 µ-law / A-law companded audio (ITU-T G.711; the expansion
  arithmetic follows the public-domain CCITT reference implementation
  shipped with Sun's g711.c): WAV format codes 7 and 6 now decode to
  linear PCM instead of raising.
- YUV4MPEG2 ("Y4M", the mjpegtools/ffmpeg interchange format): header
  + FRAME-marker parsing for C420*/C422/C444/Cmono chroma modes, so
  the video modality has a REAL frame decoder (raw planes), not just
  the MJPEG boundary walk.

The remaining swap points after this module: JPEG/video *entropy*
decode (Huffman+DCT) and perceptual audio codecs (MP3/AAC) — see
`multimodal.decode_image`.

All decoders validate headers and raise ValueError on malformed input
(never a bare crash inside an Arrow UDF) and NotImplementedError on
valid-but-unsupported variants (16-bit PNG, Adam7 interlace, ADPCM),
keeping the quarantine-vs-swap-point contract of the WAV/netpbm
decoders.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG (W3C spec): 8-bit, non-interlaced, all color types + all filters
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (before palette expansion)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk, verifying the CRC the spec
    stores over type+data — a torn/corrupt payload fails loudly here
    instead of producing garbage pixels downstream."""
    pos = len(PNG_SIGNATURE)
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor exactly as specified (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters into (height, stride) uint8.

    Up (2) is fully vectorized; Sub (1) reduces to a cumulative sum per
    byte-lane (out[x] = raw[x] + out[x-bpp] telescopes); Average (3)
    and Paeth (4) are genuinely sequential in x (each byte needs the
    reconstructed left neighbor) so they run a per-byte loop — PNG rows
    at test scale are small, and the whole decode sits inside one
    Arrow-batched map stage."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        )
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: out[x] = line[x] + out[x-bpp] telescopes
            cur = (
                (np.cumsum(line.reshape(-1, bpp).astype(np.uint32), axis=0))
                % 256
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype == 3:  # Average
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8 ndarray. Supports bit depth 8, interlace
    0 (progressive Adam7 raises NotImplementedError — a valid but
    unsupported variant, same contract as ADPCM in `decode_wav`), all
    five color types; palette images expand through PLTE to RGB."""
    b = bytes(payload)
    if b[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    if color_type not in _PNG_SAMPLES:
        raise ValueError(f"unknown PNG color type {color_type}")
    samples = _PNG_SAMPLES[color_type]
    stride = width * samples
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data does not match dimensions")
    img = _unfilter(raw, height, stride, samples).reshape(
        height, width, samples
    )
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/invalid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    return img


def _filter_scanlines(
    img: np.ndarray, filter_type: int, bpp: int
) -> bytes:
    """Apply ONE filter type to every scanline (encoders may vary the
    filter per row; a fixed one keeps the stream deterministic and the
    round-trip tests able to target each unfilter path)."""
    height, stride = img.shape
    prev = np.zeros(stride, dtype=np.uint8)
    out = bytearray()
    for y in range(height):
        cur = img[y]
        out.append(filter_type)
        if filter_type == 0:
            line = cur
        elif filter_type == 1:
            left = np.concatenate(
                [np.zeros(bpp, dtype=np.uint8), cur[:-bpp]]
            )
            line = cur - left
        elif filter_type == 2:
            line = cur - prev
        elif filter_type == 3:
            left = np.concatenate(
                [np.zeros(bpp, dtype=np.uint8), cur[:-bpp]]
            )
            line = cur - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) >> 1
            ).astype(np.uint8)
        elif filter_type == 4:
            line = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (int(cur[x]) - _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        out.extend(line.tobytes())
        prev = cur
    return bytes(out)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    arr: np.ndarray, filter_type: int = 1, level: int = 6
) -> bytes:
    """(H, W, C) uint8 -> PNG bytes (8-bit, non-interlaced). Channel
    count picks the color type (1 gray, 2 gray+alpha, 3 RGB, 4 RGBA);
    `filter_type` applies one spec filter to every scanline before
    DEFLATE — real predictive compression, and the dial the round-trip
    tests turn to cover every unfilter branch."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (H, W, 1..4) uint8, got {a.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = _filter_scanlines(a.reshape(h, w * c), filter_type, c)
    idat = zlib.compress(raw, level)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# G.711 companded audio (ITU-T G.711 via the public-domain CCITT
# reference arithmetic): µ-law and A-law byte -> 16-bit linear PCM
# ---------------------------------------------------------------------------


def ulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """µ-law bytes -> int32 linear samples (16-bit scale, ±32124).
    Vectorized transcription of the CCITT ulaw2linear():
    complement, rebuild mantissa+bias, shift by the segment, strip the
    bias, apply the sign."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where((u & 0x80) != 0, 0x84 - t, t - 0x84)


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int32 linear samples (16-bit scale, ±32256).
    Vectorized CCITT alaw2linear(): XOR 0x55, expand mantissa, segment
    0/1 special-cased per the spec, sign bit SET means positive."""
    a = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    mant = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(
        seg == 0,
        mant + 8,
        np.where(seg == 1, mant + 0x108, (mant + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where((a & 0x80) != 0, t, -t)


# ---------------------------------------------------------------------------
# YUV4MPEG2 ("Y4M") raw video container
# ---------------------------------------------------------------------------

#: chroma tag -> bytes per frame as a fraction of w*h (num, den)
_Y4M_CHROMA = {
    "420": (3, 2),
    "420jpeg": (3, 2),
    "420mpeg2": (3, 2),
    "420paldv": (3, 2),
    "422": (2, 1),
    "444": (3, 1),
    "mono": (1, 1),
}


def decode_y4m(payload: bytes):
    """YUV4MPEG2 -> (meta dict, list of per-frame plane byte blocks).

    The published mjpegtools interchange grammar: a space-separated
    parameter line (`YUV4MPEG2 W<w> H<h> F<n>:<d> [C<chroma>] ...`)
    then repeated `FRAME[ params]\\n` + exactly one frame of raw planes
    (Y then subsampled Cb, Cr). Frames are fixed-size, so the walk is
    pure offset arithmetic — no entropy decode. A torn trailing frame
    is dropped (the MJPEG salvage rule)."""
    b = bytes(payload)
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = b.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M missing stream-header newline")
    w = h = None
    fps_num, fps_den = 25, 1
    chroma = "420jpeg"  # the spec default when C is absent
    for tok in b[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C":
            chroma = val
    if not w or not h or w <= 0 or h <= 0:
        raise ValueError("Y4M missing/invalid W or H")
    if chroma not in _Y4M_CHROMA:
        raise NotImplementedError(f"Y4M chroma mode C{chroma} not supported")
    num, den = _Y4M_CHROMA[chroma]
    frame_bytes = (w * h * num) // den
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(b):
        if not b.startswith(b"FRAME", pos):
            raise ValueError(f"Y4M expected FRAME marker at offset {pos}")
        fnl = b.find(b"\n", pos)
        if fnl < 0:
            break  # torn frame header: drop
        start = fnl + 1
        if start + frame_bytes > len(b):
            break  # torn trailing frame: drop
        frames.append(b[start : start + frame_bytes])
        pos = start + frame_bytes
    meta = {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "chroma": chroma,
        "n_frames": len(frames),
    }
    return meta, frames


def encode_y4m(
    frames_y: list[np.ndarray], fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Mono Y4M from a list of equal-shape (H, W) uint8 luma frames —
    the deterministic synthesis twin of `decode_y4m` (mono keeps the
    oracle arithmetic on raw codepoints; chroma modes only change the
    per-frame byte count, which the decoder tests cover directly)."""
    if not frames_y:
        raise ValueError("need at least one frame")
    h, w = frames_y[0].shape
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Cmono\n" % (w, h, fps[0], fps[1])
    )
    for f in frames_y:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        out += b"FRAME\n"
        out += np.asarray(f, dtype=np.uint8).tobytes()
    return bytes(out)
