"""Pure-python/numpy codecs for PUBLIC container formats.

Everything here implements published specifications with only the
standard library (zlib for PNG's DEFLATE) and numpy — no PIL/cv2/
ffmpeg. This closes three of the "compressed codec" swap points that
`operators/multimodal.py` documented since r10:

- PNG (W3C PNG spec / RFC 2083): full decode of 8/16-bit
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
- Baseline JPEG (ITU-T T.81 sequential DCT): full entropy decode
  (canonical Huffman, FF00 unstuffing, RSTn restarts, dequant,
  de-zigzag, orthonormal IDCT, chroma upsampling, BT.601) plus an
  encoder with the Annex K example tables — the lossy codec is real,
  and constant 8x8 blocks at DC quant step 8 round-trip bit-exactly
  (the oracle anchor of `q_jpeg_roundtrip_stats`).
- Progressive JPEG (T.81 Annex G, Huffman): multi-scan coefficient
  accumulation — DC successive approximation, single-component
  spectral AC scans with EOB runs, the G.1.2.3 correction-bit
  refinement protocol — plus a four-phase scan-script encoder, so
  every progressive decode path is round-trip exercised
  (`q_jpeg_progressive_stats` shares the baseline hash-exact anchor).
- WARC (ISO 28500): plain and Common Crawl member-gzip crawl-archive
  parse/build with torn-record/member salvage and RFC-5322-style
  folded header lines.
- IMA ADPCM (the Interactive Multimedia Association reference
  algorithm; WAV format code 0x11): per-block predictive 4-bit decode
  and a greedy reference encoder.

- GIF87a/89a: full variable-width LZW decode (CLEAR/EOI, KwKwK case,
  12-bit cap with table resets), global/local color tables, the
  published 4-pass interlace, extension skipping; plus an LZW encoder
  so the round-trip is testable end to end.

The remaining swap points after this module: MPEG Layer II/III and
AAC perceptual audio (Layer I decodes for real below — subband +
scalefactor + adaptive allocation; its Table B.3 window constants are
a documented constant-table swap inside it) and motion-compensated
video — see `decode_mpeg1_levels` / `multimodal.split_jpeg_frames`
for the documented NotImplementedError boundaries.

All decoders validate headers and raise ValueError on malformed input
(never a bare crash inside an Arrow UDF) and NotImplementedError on
valid-but-unsupported variants (sub-byte PNG depths, arithmetic-coded
or hierarchical JPEG), keeping the quarantine-vs-swap-point contract
of the WAV/netpbm decoders. Adam7 interlace and 16-bit depth decode
for real since r11.
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

#: Quarantine cap on header-declared canvas allocations. The image
#: decoders allocate their output canvas from header-declared
#: dimensions BEFORE any pixel data is validated, so a tiny hostile
#: payload declaring e.g. a 65535x65535 logical screen would force a
#: multi-GB allocation and MemoryError/OOM the Arrow worker instead of
#: raising the contractual ValueError. 2^26 pixels (64 Mpx, ~192 MB as
#: RGB8, ~512 MB as RGBA16) is far above any plausible document image
#: and comfortably below executor memory.
_MAX_CANVAS_PIXELS = 1 << 26


def _check_canvas_dims(w: int, h: int, what: str) -> None:
    """Reject nonpositive or cap-exceeding header-declared dimensions
    BEFORE the canvas allocation they would size — malformed input
    must raise ValueError per the module's quarantine contract, never
    a bare MemoryError inside an Arrow UDF."""
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid {what} dimensions {w}x{h}")
    if w * h > _MAX_CANVAS_PIXELS:
        raise ValueError(
            f"{what} dimensions {w}x{h} exceed the "
            f"{_MAX_CANVAS_PIXELS}-pixel quarantine cap"
        )


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


#: Adam7 pass grid (W3C PNG spec §8.2): (x0, y0, dx, dy) per pass.
#: Each pass is an independently filtered sub-image; empty passes
#: (zero width or height at the image's size) contribute NO bytes.
_ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W, C) ndarray (uint8, or uint16 for 16-bit depth).
    Supports bit depths 8 AND 16, interlace 0 AND Adam7 interlace 1
    (seven independently filtered sub-images scattered back onto the
    pass grid), all five color types; palette images expand through
    PLTE to RGB."""
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
    _check_canvas_dims(width, height, "PNG")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    if color_type not in _PNG_SAMPLES:
        raise ValueError(f"unknown PNG color type {color_type}")
    if depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not spec-valid")
    samples = _PNG_SAMPLES[color_type]
    # PNG filters operate on BYTES with bpp = bytes per pixel, so the
    # 16-bit path reuses the same unfilter at doubled lane width and
    # combines big-endian byte pairs afterwards
    sw = depth // 8  # sample width in bytes
    bpp = samples * sw
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # chunk CRCs pass but DEFLATE is torn
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from None

    def _combine(bytes_img: np.ndarray, h: int, w: int) -> np.ndarray:
        if sw == 1:
            return bytes_img.reshape(h, w, samples)
        return (
            bytes_img.reshape(h, w * samples, 2)
            .astype(np.uint16)[:, :, 0] * 256
            + bytes_img.reshape(h, w * samples, 2).astype(np.uint16)[:, :, 1]
        ).reshape(h, w, samples)

    if interlace == 1:
        img = np.zeros(
            (height, width, samples), dtype=np.uint16 if sw == 2 else np.uint8
        )
        pos = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = max(0, -(-(width - x0) // dx))
            ph = max(0, -(-(height - y0) // dy))
            if pw == 0 or ph == 0:
                continue  # empty pass: no scanlines, no filter bytes
            pstride = pw * bpp
            need = ph * (pstride + 1)
            if pos + need > len(raw):
                raise ValueError("PNG pixel data does not match dimensions")
            sub = _unfilter(raw[pos : pos + need], ph, pstride, bpp)
            img[y0::dy, x0::dx] = _combine(sub, ph, pw)
            pos += need
        if pos != len(raw):
            raise ValueError("PNG pixel data does not match dimensions")
    else:
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG pixel data does not match dimensions")
        img = _combine(_unfilter(raw, height, stride, bpp), height, width)
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
    arr: np.ndarray,
    filter_type: int = 1,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """(H, W, C) uint8 (or uint16 -> 16-bit depth) -> PNG bytes.
    Channel count picks the
    color type (1 gray, 2 gray+alpha, 3 RGB, 4 RGBA); `filter_type`
    applies one spec filter to every scanline before DEFLATE — real
    predictive compression, and the dial the round-trip tests turn to
    cover every unfilter branch. `interlace=True` emits the Adam7
    layout (seven independently filtered pass sub-images, empty passes
    omitted) so the decoder's scatter path is round-trip testable."""
    src = np.asarray(arr)
    if src.dtype not in (np.uint8, np.uint16):
        raise ValueError(
            f"encode_png expects uint8 or uint16 pixels, got {src.dtype} "
            "(an int16/int32 grid with values >255 would wrap silently)"
        )
    depth = 16 if src.dtype == np.uint16 else 8
    a = src
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (H, W, 1..4) image, got {a.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace)
    )
    bpp = c * (depth // 8)

    def _rows(sub: np.ndarray) -> np.ndarray:
        # (h', w', c) -> byte rows: PNG filters work on bytes, so the
        # 16-bit path filters the big-endian byte view at doubled bpp
        hh = sub.shape[0]
        if depth == 8:
            return sub.reshape(hh, -1)
        return (
            sub.astype(">u2").reshape(hh, -1).view(np.uint8).reshape(hh, -1)
        )

    if interlace:
        raw = b"".join(
            _filter_scanlines(_rows(a[y0::dy, x0::dx]), filter_type, bpp)
            for x0, y0, dx, dy in _ADAM7_PASSES
            if a[y0::dy, x0::dx].size
        )
    else:
        raw = _filter_scanlines(_rows(a), filter_type, bpp)
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
            rest = b[pos : pos + 5]
            if b"FRAME".startswith(rest):
                break  # payload torn mid-marker: drop, like other tears
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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81, sequential DCT, Huffman): decode + encode
# ---------------------------------------------------------------------------
#
# The full entropy path in numpy/stdlib: segment parse (DQT/DHT/SOF0/
# DRI/SOS), canonical Huffman decode with FF00 unstuffing and RSTn
# resets, dequantize, de-zigzag, orthonormal 2-D IDCT, integer-factor
# chroma upsampling, BT.601 YCbCr->RGB. The encoder covers grayscale
# and 4:4:4 / subsampled color with the spec's Annex K example Huffman
# tables. Progressive (SOF2), arithmetic coding and 12-bit precision
# raise NotImplementedError — valid-but-unsupported variants.
#
# Exactness anchor (what the oracle gate leans on): a constant 8x8
# block has only a DC coefficient (8 * (v - 128)); with DC quant step
# 8 the quantized value is v - 128 exactly, and the orthonormal IDCT
# returns the constant v bit-exactly — so constant-block images
# round-trip losslessly through the REAL encoder+decoder, which is how
# `q_jpeg_roundtrip_stats` can hash-match a character-level oracle
# despite JPEG being lossy in general.

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis: M[u, x] = C(u)/2 * cos((2x+1)u*pi/16);
    forward F = M @ s @ M.T, inverse s = M.T @ F @ M."""
    u = np.arange(8).reshape(-1, 1)
    x = np.arange(8).reshape(1, -1)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] = 0.5 / np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()

# T.81 Annex K.3 example Huffman tables: (BITS counts per code length
# 1..16, HUFFVAL symbol list) — the tables virtually every baseline
# encoder ships.
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol} per T.81 C.2."""
    table: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], huffval: list[int]) -> dict:
    """{symbol: (code, length)} — the encoder-side view."""
    return {
        sym: (code, length)
        for (length, code), sym in _huff_decode_table(bits, huffval).items()
    }


class _HuffTable:
    """Decode table with an 8-bit first-level LUT: for every 8-bit
    window, the symbol and length of the (<=8-bit) code it starts
    with, or length 0 when the code runs longer — then `_huff_read`
    falls back to the canonical per-bit walk over `map`. Build cost is
    at most 256 fills per table (once per DHT segment), and the LUT
    turns the per-symbol hot path from ~L dict probes into one list
    index (T.81 tables put all frequent symbols well inside 8 bits)."""

    __slots__ = ("map", "lut_sym", "lut_len")

    def __init__(self, table: dict):
        self.map = table
        self.lut_sym = [0] * 256
        self.lut_len = [0] * 256
        for (length, code), sym in table.items():
            if length <= 8:
                start = code << (8 - length)
                for i in range(start, start + (1 << (8 - length))):
                    self.lut_sym[i] = sym
                    self.lut_len[i] = length


class _BitReader:
    """Entropy-segment bit reader: FF00 unstuffing, RSTn handling
    (byte-align + swallow the marker), EOI stops the stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bits(self, n: int) -> int:
        """MSB-first n-bit read against the multi-byte buffer (the
        per-coefficient magnitude path — once per nonzero coefficient,
        so it earns the same local-caching as `_huff_read`). The
        buffer holds whole absorbed bytes (bitbuf masked to nbits);
        markers are never absorbed — hitting one clears the buffer
        (any residue is byte-alignment padding) and surfaces it."""
        data = self.data
        pos = self.pos
        bitbuf = self.bitbuf
        nbits = self.nbits
        while nbits < n:
            if pos >= len(data):
                raise ValueError("JPEG entropy data truncated")
            byte = data[pos]
            pos += 1
            if byte == 0xFF:
                nxt = data[pos] if pos < len(data) else 0xD9
                if nxt == 0x00:
                    pos += 1
                else:
                    self.pos = pos - 1  # rewind: caller sees the marker
                    self.bitbuf, self.nbits = 0, 0
                    raise _MarkerHit(nxt)
            bitbuf = (bitbuf << 8) | byte
            nbits += 8
        nbits -= n
        v = (bitbuf >> nbits) & ((1 << n) - 1)
        self.pos = pos
        self.bitbuf = bitbuf & ((1 << nbits) - 1)
        self.nbits = nbits
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and byte-align (T.81 E.2.4). Any
        buffered bits are pre-marker padding — refill never absorbs a
        byte past the pad byte, so discarding the buffer IS the
        byte-align."""
        self.nbits = 0
        self.bitbuf = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected JPEG restart marker")


class _MarkerHit(Exception):
    """A non-stuffing marker appeared inside entropy data (EOI/RSTn)."""

    def __init__(self, marker: int):
        self.marker = marker


def _huff_read(reader: _BitReader, table: _HuffTable) -> int:
    """Canonical-code read, LUT-accelerated: buffer 8 bits (eagerly,
    stopping at markers), index the table's first-level LUT once, and
    only codes longer than 8 bits fall back to the per-bit dict walk.
    This is the per-symbol hot path (once per DC and once per AC run)
    — the LUT replaces up to 8 shift+probe iterations with one list
    index, and reader state stays cached in locals throughout. Near
    stream end / markers the window pads with 1-bits (T.81's own pad
    value): padding can only influence LUT entries whose code length
    exceeds the real bits available, and those reject below."""
    data = reader.data
    pos = reader.pos
    bitbuf = reader.bitbuf
    nbits = reader.nbits
    marker = -1
    while nbits < 8:
        if pos >= len(data):
            break
        byte = data[pos]
        if byte == 0xFF:
            nxt = data[pos + 1] if pos + 1 < len(data) else 0xD9
            if nxt != 0x00:
                marker = nxt
                break
            pos += 2
        else:
            pos += 1
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
    if nbits >= 8:
        window = (bitbuf >> (nbits - 8)) & 0xFF
    else:
        window = ((bitbuf << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF
    ln = table.lut_len[window]
    if ln:
        if ln <= nbits:
            nbits -= ln
            reader.pos = pos
            reader.bitbuf = bitbuf & ((1 << nbits) - 1)
            reader.nbits = nbits
            return table.lut_sym[window]
        # the code needs bits that do not exist in the stream
        if marker >= 0:
            reader.pos = pos
            reader.bitbuf, reader.nbits = 0, 0
            raise _MarkerHit(marker)
        raise ValueError("JPEG entropy data truncated")
    if nbits < 8:
        # fewer than 8 real bits left and no <=8-bit code matches:
        # a longer code cannot complete either
        if marker >= 0:
            reader.pos = pos
            reader.bitbuf, reader.nbits = 0, 0
            raise _MarkerHit(marker)
        raise ValueError("JPEG entropy data truncated")
    # slow path: the code is longer than 8 bits — continue the
    # canonical walk from the 8-bit prefix
    code = window
    nbits -= 8
    get = table.map.get
    for length in range(9, 17):
        if nbits == 0:
            while True:  # byte refill incl. FF00 unstuffing
                if pos >= len(data):
                    raise ValueError("JPEG entropy data truncated")
                bitbuf = data[pos]
                pos += 1
                if bitbuf != 0xFF:
                    break
                nxt = data[pos] if pos < len(data) else 0xD9
                if nxt == 0x00:
                    pos += 1
                    break
                reader.pos = pos - 1  # rewind: caller sees the marker
                reader.bitbuf, reader.nbits = 0, 0
                raise _MarkerHit(nxt)
            nbits = 8
        nbits -= 1
        code = (code << 1) | ((bitbuf >> nbits) & 1)
        sym = get((length, code))
        if sym is not None:
            reader.pos = pos
            reader.bitbuf = bitbuf & ((1 << nbits) - 1)
            reader.nbits = nbits
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (H, W, C) uint8 (C = 1 grayscale or
    3 RGB via BT.601). Supports SOF0/SOF1 8-bit, integer chroma
    subsampling factors, DRI/RSTn; SOF2 progressive and arithmetic
    coding raise NotImplementedError."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at offset {pos}")
        while pos + 2 <= n and b[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes: FF padding before a marker
        if pos + 2 > n:
            raise ValueError("truncated JPEG stream in fill bytes")
        marker = b[pos + 1]
        if marker in (0x01, *range(0xD0, 0xD8)):
            pos += 2
            continue
        if marker == 0xD9:  # EOI: progressive frames reconstruct below
            break
        size = int.from_bytes(b[pos + 2 : pos + 4], "big")
        seg = b[pos + 4 : pos + 2 + size]
        if size < 2 or len(seg) != size - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("truncated JPEG DHT table header")
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                if i + 17 + nsym > len(seg):
                    raise ValueError("truncated JPEG DHT symbol list")
                vals = list(seg[i + 17 : i + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    _huff_decode_table(bits, vals)
                )
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF segment")
            prec, h, w, nc = seg[0], int.from_bytes(seg[1:3], "big"), int.from_bytes(seg[3:5], "big"), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} not supported")
            if len(seg) < 6 + nc * 3:
                raise ValueError("truncated JPEG SOF component list")
            _check_canvas_dims(w, h, "JPEG frame")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3], seg[7 + ci * 3], seg[8 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            if marker == 0xC2:
                # per-component quantized-coefficient grids (in block
                # units, MCU-padded), accumulated across scans
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if any(
                    not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4)
                    for c in comps
                ):
                    raise ValueError("invalid JPEG sampling factors")
                if any(hmax % c["h"] or vmax % c["v"] for c in comps):
                    raise NotImplementedError(
                        "non-integer JPEG chroma sampling ratio not supported"
                    )
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                frame["geom"] = (hmax, vmax, mcus_x, mcus_y)
                frame["coef"] = {
                    c["id"]: np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                    )
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if len(seg) < 1 + ns * 2 + 3:
                raise ValueError("truncated JPEG SOS header")
            if not frame.get("progressive") and ns != len(frame["comps"]):
                # spec-valid non-interleaved multi-scan layout: the MCU
                # geometry below assumes one interleaved scan — fail as
                # unsupported, never decode with misaligned geometry
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG not supported"
                )
            scan = []
            for si in range(ns):
                cs, tds = seg[1 + si * 2], seg[2 + si * 2]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"JPEG SOS references unknown component {cs}"
                    )
                scan.append((comp, tds >> 4, tds & 0xF))
            if not frame.get("progressive"):
                return _decode_scan(
                    b, pos + 2 + size, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
            ah, al = seg[3 + ns * 2] >> 4, seg[3 + ns * 2] & 0xF
            hmax, vmax, mcus_x, mcus_y = frame["geom"]
            data_start = pos + 2 + size
            try:
                if ss == 0:  # DC scan (Se must be 0 per G.1.1.1)
                    if se != 0:
                        raise ValueError(
                            "JPEG progressive DC scan with Se != 0"
                        )
                    if ns == 1:
                        # ANY single-component scan is non-interleaved
                        # (T.81 A.2.3): one block per MCU over the
                        # component's own block grid — including a
                        # lone-component frame with factors > 1
                        c0 = scan[0][0]
                        solo = dict(c0)
                        solo["h"] = solo["v"] = 1
                        cw = -(-frame["w"] * c0["h"] // hmax)
                        ch = -(-frame["h"] * c0["v"] // vmax)
                        bx_n, by_n = -(-cw // 8), -(-ch // 8)
                        end = _decode_dc_scan(
                            b, data_start, frame,
                            [(solo, scan[0][1], scan[0][2])],
                            huff_dc, ah, al, restart_interval,
                            frame["coef"], (bx_n, by_n),
                        )
                    else:
                        end = _decode_dc_scan(
                            b, data_start, frame, scan, huff_dc, ah, al,
                            restart_interval, frame["coef"],
                            (mcus_x, mcus_y),
                        )
                else:  # AC scan: single component only (G.1.1.1)
                    if ns != 1:
                        raise ValueError(
                            "JPEG progressive AC scan must be single-component"
                        )
                    if not 1 <= ss <= se <= 63:
                        raise ValueError("invalid JPEG spectral band")
                    comp, _td, ta = scan[0]
                    act = huff_ac.get(ta)
                    if act is None:
                        raise ValueError("JPEG missing AC Huffman table")
                    cw = -(-frame["w"] * comp["h"] // hmax)
                    ch = -(-frame["h"] * comp["v"] // vmax)
                    bx_n, by_n = -(-cw // 8), -(-ch // 8)
                    end = _decode_ac_scan(
                        b, data_start, comp, act, ss, se, ah, al,
                        restart_interval, frame["coef"], (bx_n, by_n),
                    )
            except _MarkerHit as mh:
                # a well-formed scan never refills into the next marker
                # (padding covers the last partial byte), so this is
                # always a short/corrupt scan — quarantine-able
                raise ValueError(
                    f"unexpected marker 0xFF{mh.marker:02X} inside "
                    "progressive JPEG scan data"
                ) from None
            pos = _next_marker_pos(b, end)
            continue
        pos += 2 + size
    if frame is not None and frame.get("progressive"):
        hmax, vmax, mcus_x, mcus_y = frame["geom"]
        return _reconstruct_jpeg(
            frame, frame["coef"], qt, hmax, vmax, mcus_x, mcus_y
        )
    raise ValueError("JPEG stream ended without SOS")


def _decode_scan(
    b: bytes,
    pos: int,
    frame: dict,
    scan: list,
    qt: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> np.ndarray:
    """Baseline scan: MCU loop -> per-component block planes ->
    dequant + de-zigzag + IDCT -> crop/upsample -> color. A
    single-component scan is non-interleaved per T.81 A.2.3: one block
    per MCU in raster order over the component's OWN block grid,
    regardless of its declared sampling factors (a lone component
    always samples full resolution, so the factors only matter for
    interleaved geometry — which a solo scan never uses)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"invalid JPEG sampling factors {c['h']}x{c['v']}")
        if hmax % c["h"] or vmax % c["v"]:
            # the spec permits e.g. 3:2 ratios; the integer-repeat
            # upsampler below does not — fail loudly, never mis-shape
            raise NotImplementedError(
                "non-integer JPEG chroma sampling ratio not supported"
            )
    if len(scan) == 1:
        # T.81 A.2.3 non-interleaved geometry (mirrors the progressive
        # DC path's solo handling): effective h=v=1 over the
        # component's ceil(cw/8) x ceil(ch/8) grid. For a baseline
        # frame the ns==len(comps) gate above guarantees a solo scan
        # means a solo FRAME, whose component samples full res
        # (cw = ceil(w*h_c/hmax) = w), so the assemble tail below sees
        # a full-resolution plane with no upsampling.
        solo = dict(scan[0][0])
        solo["h"] = solo["v"] = 1
        scan = [(solo, scan[0][1], scan[0][2])]
        comps = [solo]
        hmax = vmax = 1
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component UNQUANTIZED coefficient grids in zigzag order (in
    # 8x8 block units) — the same accumulate-then-batch shape as the
    # progressive path, so both share _reconstruct_jpeg's vectorized
    # dequant + de-zigzag + IDCT instead of per-block python matmuls
    coef = {}
    parts = []
    for comp, td, ta in scan:
        if qt.get(comp["tq"]) is None:
            raise ValueError(f"JPEG missing quant table {comp['tq']}")
        dct = huff_dc.get(td)
        act = huff_ac.get(ta)
        if dct is None or act is None:
            raise ValueError("JPEG missing Huffman table")
        coef[comp["id"]] = np.zeros(
            (mcus_y * comp["v"], mcus_x * comp["h"], 64), dtype=np.int32
        )
        parts.append((comp, dct, act, coef[comp["id"]]))
    reader = _BitReader(b, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.restart()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for comp, dct, act, grid in parts:
            cid = comp["id"]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    acs: list = []  # (zigzag index, value) pairs
                    try:
                        s = _huff_read(reader, dct)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[cid] += diff
                        k = 1
                        while k < 64:
                            rs = _huff_read(reader, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block")
                            acs.append((k, _extend(reader.read_bits(s), s)))
                            k += 1
                    except _MarkerHit as mh:
                        if mh.marker == 0xD9 and mcu == n_mcus - 1:
                            pass  # tolerate EOI landing mid-pad
                        else:
                            raise ValueError(
                                f"unexpected marker 0xFF{mh.marker:02X} in scan"
                            ) from None
                    if not -0x100000 <= pred[cid] <= 0x100000:
                        # 8-bit baseline DC legally spans ~12 bits; a
                        # predictor past 2^20 is a corrupt diff chain
                        # (and would overflow the int32 grid)
                        raise ValueError("JPEG DC predictor out of range")
                    row = grid[my * comp["v"] + by, mx * comp["h"] + bx]
                    row[0] = pred[cid]
                    for k, v in acs:
                        row[k] = v
    shim = {"w": w, "h": h, "comps": comps}
    return _reconstruct_jpeg(shim, coef, qt, hmax, vmax, mcus_x, mcus_y)


def _assemble_jpeg_image(
    comps, planes: dict, w: int, h: int, hmax: int, vmax: int
) -> np.ndarray:
    """Shared decode tail (baseline AND progressive): crop each
    component's padded plane to its sampled dims, integer-repeat
    upsample to full size, then level-shift/clip (gray) or BT.601
    convert (color) — ONE implementation so the two paths can never
    drift in rounding or upsampling."""
    out = []
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        p = planes[c["id"]][:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        y = np.clip(np.rint(out[0] + 128.0), 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(out) != 3:
        raise NotImplementedError(f"{len(out)}-component JPEG not supported")
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _huff_emit(out: list, state: list, code: int, length: int) -> None:
    """Append `length` bits of `code` to the byte stream with FF00
    stuffing (state = [bitbuf, nbits]) — whole-code integer shifts,
    one iteration per OUTPUT BYTE, not per bit."""
    bitbuf = (state[0] << length) | (code & ((1 << length) - 1))
    nbits = state[1] + length
    while nbits >= 8:
        nbits -= 8
        byte = (bitbuf >> nbits) & 0xFF
        out.append(byte)
        if byte == 0xFF:
            out.append(0x00)
    state[0] = bitbuf & ((1 << nbits) - 1) if nbits else 0
    state[1] = nbits


def _encode_block(
    out: list, state: list, coeffs: np.ndarray, pred: int,
    dc_tbl: dict, ac_tbl: dict,
) -> int:
    """Huffman-encode one zigzagged quantized block; returns the new DC
    predictor."""
    dc = int(coeffs[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    code, length = dc_tbl[s]
    _huff_emit(out, state, code, length)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        _huff_emit(out, state, v, s)
    run = 0
    last_nz = int(np.nonzero(coeffs)[0].max(initial=0))
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_tbl[0x00]  # EOB
                _huff_emit(out, state, code, length)
                return dc
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            _huff_emit(out, state, code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_tbl[(run << 4) | s]
        _huff_emit(out, state, code, length)
        vv = v if v > 0 else v + (1 << s) - 1
        _huff_emit(out, state, vv, s)
        run = 0
    return dc


def _dht_segment(tc: int, th: int, table: tuple) -> bytes:
    bits, vals = table
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _jpeg_prepare(
    arr: np.ndarray,
    quant: np.ndarray | int,
    subsampling: tuple[int, int],
):
    """Shared encoder front matter: validate input, build the natural-
    order quant table, color-convert/subsample to per-component planes
    (level-shifted float64), and pad every plane to its MCU-covered
    block grid. Returns (h, w, q, comps, hmax, vmax, mcus_x, mcus_y)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"expected (H, W, 1|3) uint8, got {a.shape}")
    h, w, nc = a.shape
    if isinstance(quant, (int, np.integer)):
        q = np.full(64, int(quant), dtype=np.int32)
    else:
        q = np.asarray(quant, dtype=np.int32).reshape(64)
    if ((q < 1) | (q > 255)).any():
        raise ValueError("quant values must be in [1, 255]")
    sh, sv = subsampling
    if nc == 1:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": a[:, :, 0].astype(np.float64) - 128.0}]
        sh = sv = 1
    else:
        f = a.astype(np.float64)
        r, g, bl = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl
        # subsample chroma by box mean over sh x sv cells
        def sub(p):
            if (sh, sv) == (1, 1):
                return p
            ph = -(-p.shape[0] // sv) * sv
            pw = -(-p.shape[1] // sh) * sh
            pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            return pad.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))

        comps = [
            {"id": 1, "h": sh, "v": sv, "tq": 0, "plane": y - 128.0},
            {"id": 2, "h": 1, "v": 1, "tq": 0, "plane": sub(cb)},
            {"id": 3, "h": 1, "v": 1, "tq": 0, "plane": sub(cr)},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each plane (edge-replicate) to its MCU-covered block grid
    for c in comps:
        p = c["plane"]
        ph = mcus_y * c["v"] * 8
        pw = mcus_x * c["h"] * 8
        c["plane"] = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
    return h, w, q, comps, hmax, vmax, mcus_x, mcus_y


def encode_jpeg_baseline(
    arr: np.ndarray,
    quant: np.ndarray | int = 8,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, 1|3) uint8 -> baseline JFIF bytes with the
    Annex K example Huffman tables. `quant` is one 8x8 table (natural
    order) or a scalar applied uniformly — a scalar 8 makes constant
    8x8 blocks round-trip EXACTLY (DC = 8*(v-128) quantizes to v-128
    with no remainder), the anchor `q_jpeg_roundtrip_stats` gates on.
    Color encodes YCbCr with `subsampling` (h, v) on the chroma planes
    ((1, 1) = 4:4:4, (2, 2) = 4:2:0) using BT.601 forward — exercising
    the decoder's upsampling path from the encoder side.
    `restart_interval` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (predictors reset, stream byte-aligned with 1-bit
    padding) — the decoder's restart path, round-trip testable."""
    h, w, q, comps, hmax, vmax, mcus_x, mcus_y = _jpeg_prepare(
        arr, quant, subsampling
    )
    # DQT stores the table in ZIGZAG order: zigzag position k holds the
    # natural-order entry _ZIGZAG[k] — the same indexing the quantize
    # step below uses, so decoder and encoder agree for non-uniform
    # tables too (a scalar table masks any mismatch).
    qzz = q[_ZIGZAG]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(v) for v in qzz
    )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUM) + _dht_segment(1, 0, _AC_LUM)
    if len(comps) > 1:
        out += _dht_segment(0, 1, _DC_CHR) + _dht_segment(1, 1, _AC_CHR)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for i, c in enumerate(comps):
        tbl = 0 if i == 0 else 1
        sos += bytes([c["id"], (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    enc_dc = {0: _huff_encode_table(*_DC_LUM), 1: _huff_encode_table(*_DC_CHR)}
    enc_ac = {0: _huff_encode_table(*_AC_LUM), 1: _huff_encode_table(*_AC_CHR)}
    body: list[int] = []
    state = [0, 0]
    pred = {c["id"]: 0 for c in comps}
    m = _DCT_M
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            if state[1]:  # byte-align with 1-bit padding before RSTn
                pad = 8 - state[1]
                _huff_emit(body, state, (1 << pad) - 1, pad)
            body.extend((0xFF, 0xD0 + ((mcu // restart_interval) - 1) % 8))
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for i, c in enumerate(comps):
            tbl = 0 if i == 0 else 1
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    block = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                    flat = block.reshape(-1)
                    v0 = flat[0]
                    if (flat == v0).all():
                        # constant block: DC = 8*v analytically, every
                        # AC exactly 0 — skip FDCT, quantize the scalar
                        dc = int(round(8.0 * float(v0) / float(q[0])))
                        dc_tbl, ac_tbl = enc_dc[tbl], enc_ac[tbl]
                        diff = dc - pred[c["id"]]
                        s = abs(diff).bit_length()
                        code, length = dc_tbl[s]
                        _huff_emit(body, state, code, length)
                        if s:
                            v = diff if diff > 0 else diff + (1 << s) - 1
                            _huff_emit(body, state, v, s)
                        code, length = ac_tbl[0x00]  # EOB
                        _huff_emit(body, state, code, length)
                        pred[c["id"]] = dc
                        continue
                    coef = m @ block @ m.T
                    qcoef = np.rint(coef.reshape(-1)[_ZIGZAG] / q[_ZIGZAG])
                    pred[c["id"]] = _encode_block(
                        body, state, qcoef.astype(np.int64),
                        pred[c["id"]], enc_dc[tbl], enc_ac[tbl],
                    )
    if state[1]:  # pad the final byte with 1-bits (T.81 F.1.2.3)
        pad = 8 - state[1]
        _huff_emit(body, state, (1 << pad) - 1, pad)
    out += bytes(body)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# IMA ADPCM (DVI4 / WAV format code 0x11): 4-bit predictive audio
# ---------------------------------------------------------------------------
#
# The IMA reference algorithm (published by the Interactive Multimedia
# Association; the step/index tables and shift-ladder delta are the
# spec): each WAV block carries a per-channel (int16 predictor, uint8
# step index) header, then channel-interleaved 4-byte nibble groups.

_IMA_STEP = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(nibbles, predictor: int, index: int):
    """Decode a nibble sequence from one (predictor, index) state;
    returns (list of int16 samples, predictor, index). The shift-ladder
    delta (step>>3 + conditional step>>2/step>>1/step) is the exact
    integer form the IMA spec mandates — NOT (2n+1)*step/8."""
    out = []
    for nib in nibbles:
        step = int(_IMA_STEP[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        predictor = predictor - diff if nib & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + int(_IMA_INDEX[nib & 7])))
        out.append(predictor)
    return out, predictor, index


def ima_adpcm_decode_block(
    block: bytes, channels: int
) -> np.ndarray:
    """One WAV IMA-ADPCM block -> (n_samples, channels) int32. Header:
    per channel int16 predictor + uint8 step index + reserved byte (the
    predictor IS the block's first output sample); body: 4-byte nibble
    groups interleaved channel 0..C-1, low nibble first within each
    byte."""
    hdr = 4 * channels
    if len(block) < hdr or (len(block) - hdr) % (4 * channels):
        raise ValueError("malformed IMA ADPCM block")
    preds, idxs, chans = [], [], []
    for c in range(channels):
        p = int.from_bytes(block[c * 4 : c * 4 + 2], "little", signed=True)
        i = block[c * 4 + 2]
        if i > 88:
            raise ValueError(f"IMA ADPCM step index {i} out of range")
        preds.append(p)
        idxs.append(i)
        chans.append([p])  # header predictor = first sample
    body = block[hdr:]
    for g in range(0, len(body), 4 * channels):
        for c in range(channels):
            word = body[g + c * 4 : g + c * 4 + 4]
            nibs = []
            for byte in word:
                nibs.append(byte & 0xF)
                nibs.append(byte >> 4)
            dec, preds[c], idxs[c] = _ima_decode_nibbles(
                nibs, preds[c], idxs[c]
            )
            chans[c].extend(dec)
    n = min(len(ch) for ch in chans)
    return np.stack([np.array(ch[:n], dtype=np.int32) for ch in chans], axis=1)


def ima_adpcm_encode_block(
    samples: np.ndarray, index: int = 0
) -> tuple[bytes, int]:
    """Encode (n, channels) int16-range samples as one IMA ADPCM block
    (greedy nibble choice per the reference encoder); returns (block
    bytes, final step index of channel 0). n-1 must be a multiple of 8
    per channel (header consumes the first sample)."""
    s = np.asarray(samples, dtype=np.int32)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if (n - 1) % 8:
        raise ValueError("need 1 + 8k samples per channel per block")
    out = bytearray()
    states = []
    for c in range(channels):
        p = int(s[0, c])
        out += int(p).to_bytes(2, "little", signed=True)
        out += bytes([index, 0])
        states.append([p, index])
    pos = 1
    while pos < n:
        for c in range(channels):
            pred, idx = states[c]
            nibs = []
            for k in range(8):
                target = int(s[pos + k, c])
                step = int(_IMA_STEP[idx])
                diff = target - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                mask = 4
                d = step
                acc = step >> 3
                for _ in range(3):
                    if diff >= d:
                        nib |= mask
                        diff -= d
                        acc += d
                    d >>= 1
                    mask >>= 1
                pred = pred - acc if nib & 8 else pred + acc
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(_IMA_INDEX[nib & 7])))
                nibs.append(nib)
            for b in range(0, 8, 2):
                out.append(nibs[b] | (nibs[b + 1] << 4))
            states[c] = [pred, idx]
        pos += 8
    return bytes(out), states[0][1]


# ---------------------------------------------------------------------------
# GIF (GIF87a/GIF89a): LZW-compressed palette images
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting min+1, dictionary
    reset on CLEAR (2^min), EOI ends (2^min + 1), width grows when the
    dict fills (cap 12 bits per the spec)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit cursor over data, LSB-first (GIF packs codes little-endian)
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("GIF LZW data truncated")
        byte0 = bitpos >> 3
        chunk = int.from_bytes(
            data[byte0 : byte0 + (((bitpos & 7) + width + 7) >> 3)], "little"
        )
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a non-root code")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("GIF LZW code out of range")
            if next_code < (1 << 12):
                table[next_code] = prev + entry[:1]
                next_code += 1
        out.extend(entry)
        prev = entry
        # the decoder assigns one entry BEHIND the encoder, so it must
        # widen as soon as its next slot hits the width's capacity
        if next_code == (1 << width) and width < 12:
            width += 1


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder: emits CLEAR first, resets when the
    12-bit table fills — the standard reference behavior."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code == (1 << 12):
            # table full at the 12-bit cap: CLEAR and start over (the
            # decoder stops assigning at the same point, so both sides
            # stay in lockstep until the reset arrives)
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        else:
            table[wk] = next_code
            next_code += 1
            # widen once the just-assigned code outgrows the width —
            # the decoder (one assignment behind) widens on the same
            # boundary via its next_code == 2^width rule
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
        # mirror the decoder exactly once more: after processing this
        # final code it assigns its pending entry (reaching THIS
        # next_code) and widens if that hits the boundary — EOI must be
        # written at the width the decoder will read it with
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF -> (H, W, 3) uint8 RGB of the FIRST image frame (animated
    GIFs decode their first frame; extensions are skipped per the
    sub-block grammar). Supports global/local color tables, interlace
    (the published 4-pass order), full variable-width LZW. A first
    frame smaller than or offset within the logical screen is
    composited onto the screen-sized canvas at its (left, top) offset
    — uncovered canvas takes the screen's background color from the
    GLOBAL color table (entry 0 when the background index is out of
    range; black when no global table exists), so the returned
    dimensions are always (screen_h, screen_w, 3) as a
    screen-compositing decoder would produce."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(b) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    _check_canvas_dims(sw, sh, "GIF screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3

    def skip_subblocks(p: int) -> int:
        while p < len(b) and b[p]:
            p += 1 + b[p]
        return p + 1

    while pos < len(b):
        tag = b[pos]
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
            continue
        if tag != 0x2C:
            raise ValueError(f"unknown GIF block 0x{tag:02X}")
        if pos + 10 > len(b):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos + 1)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image has no color table")
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError("invalid GIF image dimensions")
        if pos >= len(b):
            raise ValueError("truncated GIF image data")
        min_code = b[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(b) and b[pos]:
            size = b[pos]
            lzw += b[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(lzw), min_code), dtype=np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("GIF pixel data does not match dimensions")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder rows per the 4 passes
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, h, step):
                    deinter[y] = idx[src]
                    src += 1
            idx = deinter
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF palette index out of range")
        if left == 0 and top == 0 and w == sw and h == sh:
            return pal[idx]
        # partial/offset first frame: composite onto the logical
        # screen at (left, top). The background color index refers to
        # the GLOBAL color table (GIF89a spec §18) even when the frame
        # carries a local one — mirror decode_gif_frames' gct fill.
        canvas = np.empty((sh, sw, 3), dtype=np.uint8)
        canvas[:] = (
            gct[bg]
            if gct is not None and bg < gct.shape[0]
            else (gct[0] if gct is not None else np.zeros(3, dtype=np.uint8))
        )
        canvas[top : top + h, left : left + w] = pal[idx]
        return canvas
    raise ValueError("GIF contains no image data")


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(H, W) uint8 palette indices + (N, 3) palette -> GIF89a bytes
    with real LZW compression (and optionally the 4-pass interlace
    layout, so the decoder's deinterlacer is round-trip testable)."""
    a = np.asarray(idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if a.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("need (H, W) indices and (N, 3) palette")
    h, w = a.shape
    if int(a.max(initial=0)) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    depth = max(1, (int(pal.shape[0]) - 1).bit_length())
    n = 1 << depth
    pal_full = np.zeros((n, 3), dtype=np.uint8)
    pal_full[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    rows = a
    if interlace:
        order = [
            y for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        rows = a[order]
    min_code = max(2, depth)
    out.append(min_code)
    lzw = _lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive JPEG (T.81 Annex G): spectral selection + successive
# approximation, decode AND encode
# ---------------------------------------------------------------------------
#
# Scans accumulate QUANTIZED coefficients per component; reconstruction
# (dequant + IDCT + upsample + color) runs once at EOI. DC scans are
# MCU-interleaved (successive approximation = arithmetic point
# transform, refinements OR in one raw bit per block); AC scans are
# single-component over the component's non-interleaved block grid
# (magnitude point transform, EOB runs, the G.1.2.3 correction-bit
# refinement protocol — transcribed from the spec's flowcharts, the
# same logic libjpeg implements).


def _next_marker_pos(b: bytes, pos: int) -> int:
    """First byte offset >= pos of a real marker (FF + not 00/FF/RSTn)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF and b[pos + 1] not in (0x00, 0xFF, *range(0xD0, 0xD8)):
            return pos
        pos += 1
    return n


def _decode_dc_scan(
    b, pos, frame, scan, huff_dc, Ah, Al, restart_interval, coef, geom
):
    """Interleaved (or single-component) DC scan: first pass (Ah=0)
    diff-codes the point-transformed DC; refinements append one raw
    bit per block (no Huffman)."""
    mcus_x, mcus_y = geom
    reader = _BitReader(b, pos)
    # hoist the per-block dict probes (component plane, Huffman table)
    # out of the MCU loop — this scan visits every block in the image
    parts = []
    for comp, td, _ta in scan:
        tbl = huff_dc.get(td)
        if Ah == 0 and tbl is None:
            raise ValueError("JPEG missing DC Huffman table")
        parts.append((comp["id"], comp["v"], comp["h"], coef[comp["id"]], tbl))
    pred = dict.fromkeys((p[0] for p in parts), 0)
    n_mcus = mcus_x * mcus_y
    if (
        Ah
        and not restart_interval
        and len(parts) == 1
        and parts[0][1] == 1
        and parts[0][2] == 1
    ):
        # DC refinement consumes EXACTLY one raw bit per block (no
        # Huffman, no data dependence), so the single-component
        # non-restart case reads whole bytes and unpacks — 8x fewer
        # python iterations than the per-block loop below; blk is only
        # written after every bit read, so a _MarkerHit mid-scan
        # leaves the grid untouched (same as failing on block 0)
        _cid, _v, _h, blk, _tbl = parts[0]
        nbytes = (n_mcus + 7) // 8
        raw = bytearray(nbytes)
        for bi in range(nbytes - 1):
            raw[bi] = reader.read_bits(8)
        rem = n_mcus - 8 * (nbytes - 1)
        raw[nbytes - 1] = reader.read_bits(rem) << (8 - rem)
        bits = np.unpackbits(np.frombuffer(bytes(raw), np.uint8))[:n_mcus]
        mcy, mcx = divmod(np.flatnonzero(bits), mcus_x)
        blk[mcy, mcx, 0] |= 1 << Al
        return reader.pos
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.restart()
            pred = dict.fromkeys(pred, 0)
        my, mx = divmod(mcu, mcus_x)
        for cid, v, h, blk, tbl in parts:
            for by in range(v):
                cy = my * v + by
                for bx in range(h):
                    cx = mx * h + bx
                    if Ah == 0:
                        s = _huff_read(reader, tbl)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[cid] += diff
                        if not -0x100000 <= pred[cid] <= 0x100000:
                            raise ValueError(
                                "JPEG DC predictor out of range"
                            )
                        blk[cy, cx, 0] = pred[cid] << Al
                    else:
                        if reader.read_bits(1):
                            blk[cy, cx, 0] |= 1 << Al
    return reader.pos


def _decode_ac_scan(
    b, pos, comp, huff_ac, Ss, Se, Ah, Al, restart_interval, coef, nblocks
):
    """Single-component AC scan over the non-interleaved block grid.
    Ah=0: spectral-selection first pass with EOB runs (G.1.2.2);
    Ah>0: successive-approximation refinement (G.1.2.3)."""
    bx_n, by_n = nblocks
    reader = _BitReader(b, pos)
    blk = coef[comp["id"]]
    eobrun = 0
    p1 = 1 << Al
    m1 = -(1 << Al)
    total = bx_n * by_n
    for i in range(total):
        if restart_interval and i and i % restart_interval == 0:
            reader.restart()
            eobrun = 0
        cy, cx = divmod(i, bx_n)
        row = blk[cy, cx]
        if Ah == 0:  # first pass
            if eobrun > 0:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                rs = _huff_read(reader, huff_ac)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > Se:
                    raise ValueError("JPEG AC run past spectral band")
                row[k] = _extend(reader.read_bits(s), s) << Al
                k += 1
            continue
        # refinement pass (G.1.2.3)
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = _huff_read(reader, huff_ac)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # ZRL: advance over 16 zero-HISTORY coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "JPEG AC refinement symbol with s != 1"
                        )
                    newval = p1 if reader.read_bits(1) else m1
                while k <= Se:
                    cur = int(row[k])
                    if cur != 0:
                        if reader.read_bits(1) and (cur & p1) == 0:
                            row[k] = cur + (p1 if cur >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= Se:
                    row[k] = newval
                k += 1
        if eobrun > 0:
            # correction bits for the EOB-run remainder: only NONZERO
            # coefficients consume bits, so iterate those directly
            # (the all-zero-band common case costs one nonzero() call)
            for kk in np.nonzero(row[k : Se + 1])[0]:
                cur = int(row[k + kk])
                if reader.read_bits(1) and (cur & p1) == 0:
                    row[k + kk] = cur + (p1 if cur >= 0 else m1)
            eobrun -= 1
    return reader.pos


def _reconstruct_jpeg(frame, coef, qt, hmax, vmax, mcus_x, mcus_y):
    """Dequantize + IDCT the accumulated coefficient grids, then hand
    off to the SHARED crop/upsample/color tail (`_assemble_jpeg_image`)
    so baseline and progressive output can never drift."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    idct_m = _DCT_M
    planes = {}
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        grid = coef[c["id"]]
        by_n, bx_n = grid.shape[0], grid.shape[1]
        # batched dequantize + zigzag scatter + IDCT (was a per-block
        # python loop): DC-only blocks — most blocks of smooth/sparse
        # content — take the vectorized dc/8 constant fill (the IDCT
        # of a pure DC term), and only blocks with AC energy run the
        # 8x8 GEMMs, batched through one broadcasting matmul.
        # Coefficient x quant products stay below 2^53, exact in
        # float64.
        deq = grid.astype(np.float64) * q.astype(np.float64)[None, None, :]
        out = np.empty((by_n, bx_n, 8, 8), dtype=np.float64)
        out[:] = (deq[:, :, 0] / 8.0)[:, :, None, None]
        ac_y, ac_x = np.nonzero((grid[:, :, 1:] != 0).any(axis=2))
        if ac_y.size:
            sel = deq[ac_y, ac_x]  # (k, 64) zigzag-ordered
            blocks = np.zeros((ac_y.size, 64), dtype=np.float64)
            blocks[:, _ZIGZAG] = sel
            out[ac_y, ac_x] = np.matmul(
                np.matmul(idct_m.T, blocks.reshape(-1, 8, 8)), idct_m
            )
        planes[c["id"]] = out.transpose(0, 2, 1, 3).reshape(
            by_n * 8, bx_n * 8
        )
    return _assemble_jpeg_image(comps, planes, w, h, hmax, vmax)


# The Annex K example tables are BASELINE tables: they lack the EOBn
# (r<<4, r>0) symbols progressive AC scans emit. Progressive scans use
# this flat canonical table instead — every byte symbol present, 250 at
# 8 bits + 6 at 9 bits (the all-ones max-length code stays unused, as
# T.81 C.2 requires). Poorer compression than an optimized table, but
# spec-valid — and it exercises the decoder's multi-length canonical
# builder.
_AC_FLAT = (
    [0, 0, 0, 0, 0, 0, 0, 250, 6, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _emit_eobrun(body, state, ac_tbl, pend):
    """Flush a pending AC end-of-band run and its buffered correction
    bits (pend = [eobrun, br_bits]) — G.1.2.2/3 EOBn coding."""
    eobrun, br = pend
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, length = ac_tbl[nbits << 4]
        _huff_emit(body, state, code, length)
        if nbits:
            _huff_emit(body, state, eobrun & ((1 << nbits) - 1), nbits)
    for bit in br:
        _huff_emit(body, state, bit, 1)
    pend[0] = 0
    pend[1] = []


def encode_jpeg_progressive(
    arr: np.ndarray,
    quant: np.ndarray | int = 8,
    subsampling: tuple[int, int] = (1, 1),
    al_dc: int = 1,
    al_ac: int = 1,
) -> bytes:
    """(H, W) or (H, W, 1|3) uint8 -> PROGRESSIVE JFIF bytes (SOF2)
    with the standard four-phase scan script: interleaved DC first scan
    at Al=al_dc, per-component AC spectral scans (1..63) at Al=al_ac,
    then a DC refinement (raw bits) and per-component AC refinements
    (the G.1.2.3 correction-bit protocol) down to Al=0 — together the
    scans exercise EVERY progressive decode path. Same quant semantics
    as the baseline encoder, so constant 8x8 blocks at DC step 8 still
    round-trip bit-exactly (the successive approximation splits the DC
    into a shifted pass plus OR'd refinement bits — lossless)."""
    h, w, q, comps, hmax, vmax, mcus_x, mcus_y = _jpeg_prepare(
        arr, quant, subsampling
    )
    m = _DCT_M
    qzz = q[_ZIGZAG].astype(np.float64)
    # quantize every block up front: (by, bx, 64) int32 zigzag grids
    for c in comps:
        plane = c["plane"]
        by_n = plane.shape[0] // 8
        bx_n = plane.shape[1] // 8
        grid = np.zeros((by_n, bx_n, 64), dtype=np.int32)
        for cy in range(by_n):
            for cx in range(bx_n):
                block = plane[cy * 8 : cy * 8 + 8, cx * 8 : cx * 8 + 8]
                flat = block.reshape(-1)
                if (flat == flat[0]).all():
                    grid[cy, cx, 0] = int(round(8.0 * float(flat[0]) / float(q[0])))
                    continue
                coef = m @ block @ m.T
                grid[cy, cx] = np.rint(
                    coef.reshape(-1)[_ZIGZAG] / qzz
                ).astype(np.int32)
        c["grid"] = grid
        # the non-interleaved block counts AC scans cover
        c["nb"] = (-(-(-(-w * c["h"] // hmax)) // 8),
                   -(-(-(-h * c["v"] // vmax)) // 8))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(v) for v in q[_ZIGZAG]
    )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUM) + _dht_segment(1, 0, _AC_FLAT)
    if len(comps) > 1:
        out += _dht_segment(0, 1, _DC_CHR) + _dht_segment(1, 1, _AC_FLAT)
    enc_dc = {0: _huff_encode_table(*_DC_LUM), 1: _huff_encode_table(*_DC_CHR)}
    enc_ac = {0: _huff_encode_table(*_AC_FLAT), 1: _huff_encode_table(*_AC_FLAT)}

    def sos_header(comp_tbls, ss, se, ah, al):
        sos = bytes([len(comp_tbls)])
        for cid, td, ta in comp_tbls:
            sos += bytes([cid, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    def flush(body, state):
        if state[1]:
            pad = 8 - state[1]
            _huff_emit(body, state, (1 << pad) - 1, pad)
        return bytes(body)

    # --- scan 1: interleaved DC first pass (Ah=0, Al=al_dc) ---------
    out += sos_header(
        [(c["id"], 0 if i == 0 else 1, 0) for i, c in enumerate(comps)],
        0, 0, 0, al_dc,
    )
    body: list[int] = []
    state = [0, 0]
    pred = {c["id"]: 0 for c in comps}
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for i, c in enumerate(comps):
            tbl = enc_dc[0 if i == 0 else 1]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    dc = int(c["grid"][my * c["v"] + by, mx * c["h"] + bx, 0])
                    val = dc >> al_dc  # arithmetic point transform (G.1.2.1)
                    diff = val - pred[c["id"]]
                    pred[c["id"]] = val
                    s = abs(diff).bit_length()
                    code, length = tbl[s]
                    _huff_emit(body, state, code, length)
                    if s:
                        v = diff if diff > 0 else diff + (1 << s) - 1
                        _huff_emit(body, state, v, s)
    out += flush(body, state)

    # --- per-component AC first scans (Ss=1..63, Ah=0, Al=al_ac) ----
    for i, c in enumerate(comps):
        out += sos_header([(c["id"], 0, 0 if i == 0 else 1)], 1, 63, 0, al_ac)
        ac_tbl = enc_ac[0 if i == 0 else 1]
        body, state = [], [0, 0]
        pend = [0, []]  # [eobrun, buffered correction bits] (br unused here)
        bx_n, by_n = c["nb"]
        for bi in range(bx_n * by_n):
            cy, cx = divmod(bi, bx_n)
            row = c["grid"][cy, cx]
            if not row[1:].any():  # all-zero band: pure EOB contribution
                pend[0] += 1
                if pend[0] == 0x7FFF:
                    _emit_eobrun(body, state, ac_tbl, pend)
                continue
            # magnitude point transform (G.1.2.2): sign-preserving >> Al
            r = 0
            emitted = False
            for k in range(1, 64):
                v = int(row[k])
                t = (abs(v) >> al_ac)
                if t == 0:
                    r += 1
                    continue
                _emit_eobrun(body, state, ac_tbl, pend)
                while r > 15:
                    code, length = ac_tbl[0xF0]
                    _huff_emit(body, state, code, length)
                    r -= 16
                s = t.bit_length()
                code, length = ac_tbl[(r << 4) | s]
                _huff_emit(body, state, code, length)
                vv = t if v > 0 else -t
                if vv < 0:
                    vv += (1 << s) - 1
                _huff_emit(body, state, vv, s)
                r = 0
                emitted = True
            if r > 0 or not emitted:
                pend[0] += 1
                if pend[0] == 0x7FFF:
                    _emit_eobrun(body, state, ac_tbl, pend)
        _emit_eobrun(body, state, ac_tbl, pend)
        out += flush(body, state)

    # --- DC refinement scans: one raw bit per block per level -------
    for al in range(al_dc - 1, -1, -1):
        out += sos_header(
            [(c["id"], 0, 0) for c in comps], 0, 0, al + 1, al
        )
        body, state = [], [0, 0]
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(
                            c["grid"][my * c["v"] + by, mx * c["h"] + bx, 0]
                        )
                        _huff_emit(body, state, (dc >> al) & 1, 1)
        out += flush(body, state)

    # --- per-component AC refinement scans (G.1.2.3) ----------------
    for al in range(al_ac - 1, -1, -1):
        for i, c in enumerate(comps):
            out += sos_header(
                [(c["id"], 0, 0 if i == 0 else 1)], 1, 63, al + 1, al
            )
            ac_tbl = enc_ac[0 if i == 0 else 1]
            body, state = [], [0, 0]
            pend = [0, []]
            bx_n, by_n = c["nb"]
            for bi in range(bx_n * by_n):
                cy, cx = divmod(bi, bx_n)
                row = c["grid"][cy, cx]
                if not row[1:].any():  # all-zero band: pure EOB, no bits
                    pend[0] += 1
                    if pend[0] == 0x7FFF:
                        _emit_eobrun(body, state, ac_tbl, pend)
                    continue
                absv = [abs(int(row[k])) >> al for k in range(64)]
                # EOB = 1 + last newly-significant index (t == 1)
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k
                r = 0
                br: list[int] = []
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        _emit_eobrun(body, state, ac_tbl, pend)
                        code, length = ac_tbl[0xF0]
                        _huff_emit(body, state, code, length)
                        r -= 16
                        for bit in br:
                            _huff_emit(body, state, bit, 1)
                        br = []
                    if t > 1:  # history coefficient: correction bit
                        br.append(t & 1)
                        continue
                    # newly significant at this level
                    _emit_eobrun(body, state, ac_tbl, pend)
                    code, length = ac_tbl[(r << 4) | 1]
                    _huff_emit(body, state, code, length)
                    _huff_emit(body, state, 1 if int(row[k]) > 0 else 0, 1)
                    for bit in br:
                        _huff_emit(body, state, bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    pend[0] += 1
                    pend[1].extend(br)
                    if pend[0] == 0x7FFF:
                        _emit_eobrun(body, state, ac_tbl, pend)
            _emit_eobrun(body, state, ac_tbl, pend)
            out += flush(body, state)

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# WARC (ISO 28500 / WARC/1.1): the web-archive container training-data
# pipelines ingest (Common Crawl ships .warc.gz = one gzip member per
# record)
# ---------------------------------------------------------------------------


def parse_warc(payload: bytes) -> list[dict]:
    """WARC stream -> list of {headers: {name: value}, body: bytes}.

    Handles the plain concatenated-record form and the standard
    .warc.gz layout (each record its own gzip member; stdlib zlib
    members decompressed in a loop). Per the spec each record is a
    version line + CRLF header block + empty line + Content-Length
    body + CRLF CRLF. A torn trailing record is dropped (the salvage
    rule shared with the other container walks); structural garbage
    raises ValueError."""
    b = bytes(payload)
    if b[:2] == b"\x1f\x8b":  # gzip member chain
        out = bytearray()
        while b:
            d = zlib.decompressobj(wbits=31)
            try:
                out += d.decompress(b)
            except zlib.error as exc:
                if out:
                    break  # torn trailing member: salvage what decoded
                raise ValueError(f"corrupt WARC gzip member: {exc}") from None
            out += d.flush()
            b = d.unused_data
            if not d.eof:
                break  # torn trailing member
        b = bytes(out)
    records = []
    pos = 0
    n = len(b)
    while pos < n:
        if b[pos : pos + 5] != b"WARC/":
            if not b[pos:].strip():
                break  # trailing padding/newlines
            raise ValueError(f"expected WARC version line at offset {pos}")
        head_end = b.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break  # torn trailing record header
        head = b[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        headers: dict = {}
        last_key: str | None = None
        for line in lines[1:]:
            if line[:1] in (" ", "\t"):
                # ISO 28500 header grammar is RFC-5322-style: a line
                # starting with SP/HT folds into the previous header's
                # value (Common Crawl emits these)
                if last_key is None:
                    raise ValueError(
                        f"WARC continuation line before any header: {line!r}"
                    )
                headers[last_key] = f"{headers[last_key]} {line.strip()}"
                continue
            if ":" not in line:
                raise ValueError(f"malformed WARC header line: {line!r}")
            k, v = line.split(":", 1)
            last_key = k.strip()
            headers[last_key] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing valid Content-Length") from None
        body_start = head_end + 4
        if body_start + length > n:
            break  # torn trailing record body
        records.append(
            {"headers": headers, "body": b[body_start : body_start + length]}
        )
        pos = body_start + length
        while b[pos : pos + 2] == b"\r\n":  # the two record separators
            pos += 2
    return records


def build_warc_records(records: list[dict], gzip_members: bool = False) -> bytes:
    """records = [{headers: {...}, body: bytes}] -> WARC stream. With
    `gzip_members`, each record compresses as its own gzip member —
    the Common Crawl .warc.gz layout (random access per record)."""
    out = bytearray()
    for rec in records:
        headers = dict(rec["headers"])
        body = bytes(rec["body"])
        headers["Content-Length"] = str(len(body))
        block = b"WARC/1.1\r\n"
        for k, v in headers.items():
            block += f"{k}: {v}\r\n".encode()
        block += b"\r\n" + body + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            block = co.compress(block) + co.flush()
        out += block
    return bytes(out)


# ---------------------------------------------------------------------------
# FLAC (RFC 9639 / the published xiph.org format spec): lossless
# predictive audio — the first ENTROPY-CODED audio codec in the family
# (G.711/ADPCM are fixed-rate companding; FLAC is prediction + rice
# coding, the audio analog of what PNG's filters+DEFLATE are to images)
# ---------------------------------------------------------------------------

def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    tbl = []
    for byte in range(256):
        r = byte << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl.append(r & mask)
    return tbl


#: frame-header CRC-8 (poly x^8+x^2+x+1) and whole-frame CRC-16
#: (poly x^16+x^15+x^2+1), both init 0 — RFC 9639 §9.2/§9.3
_FLAC_CRC8 = _crc_table(0x07, 8)
_FLAC_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _FLAC_CRC8[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _FLAC_CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


class _MSBReader:
    """MSB-first bit reader over plain bytes (no unstuffing — unlike
    the JPEG reader). Tracks byte position so frame CRC-16 can cover
    exactly the bytes consumed. `bits`/`ones` lazily cache the whole
    payload unpacked to a bit array plus its 1-bit positions — the
    context the vectorized rice residual path walks; decode_flac
    shares one cache across its per-frame readers."""

    __slots__ = ("b", "pos", "bit", "bits", "ones")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos
        self.bit = 0
        self.bits = None
        self.ones = None

    def read(self, n: int) -> int:
        v = 0
        b, pos, bit = self.b, self.pos, self.bit
        while n > 0:
            if pos >= len(b):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - bit
            take = min(n, avail)
            chunk = (b[pos] >> (avail - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            bit += take
            n -= take
            if bit == 8:
                pos += 1
                bit = 0
        self.pos, self.bit = pos, bit
        return v

    def read_unary(self) -> int:
        """Count zero bits up to the terminating 1."""
        q = 0
        b, pos, bit = self.b, self.pos, self.bit
        while True:
            if pos >= len(b):
                raise ValueError("truncated FLAC bitstream")
            cur = b[pos] & ((1 << (8 - bit)) - 1)
            if cur == 0:
                q += 8 - bit
                pos += 1
                bit = 0
                continue
            lead = (8 - bit) - cur.bit_length()
            q += lead
            bit += lead + 1
            if bit >= 8:
                pos += 1
                bit -= 8
            self.pos, self.bit = pos, bit
            return q

    def align(self) -> None:
        if self.bit:
            self.pos += 1
            self.bit = 0


class _MSBWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _flac_utf8_encode(n: int) -> bytes:
    """The frame header's coded number: UTF-8-style encoding extended
    to 36 bits (RFC 9639 frame header). total bytes 1-7; a k-byte code
    carries 7, 11, 16, 21, 26, 31 or 36 payload bits."""
    if n < 0:
        raise ValueError("coded number must be non-negative")
    if n < 0x80:
        return bytes([n])
    for total in range(2, 8):
        first_bits = 7 - total if total < 7 else 0
        payload_bits = first_bits + 6 * (total - 1)
        if n < (1 << payload_bits):
            lead = (0xFF << (8 - total)) & 0xFF
            out = [lead | ((n >> (6 * (total - 1))) & ((1 << first_bits) - 1))]
            for i in range(total - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError(f"coded number {n} exceeds 36 bits")


def _flac_utf8_decode(r: _MSBReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    ones = 8 - (first ^ 0xFF).bit_length()  # leading 1-bits
    if ones < 2 or ones > 7:
        raise ValueError("invalid FLAC coded-number lead byte")
    first_bits = 7 - ones if ones < 7 else 0
    v = first & ((1 << first_bits) - 1)
    for _ in range(ones - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


#: frame-header block-size codes for common sizes (RFC 9639): value ->
#: 4-bit code; anything else uses code 7 + 16-bit (size-1) field
_FLAC_BS_CODES = {
    192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
    8192: 13, 16384: 14, 32768: 15,
}
_FLAC_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FLAC_SS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_FLAC_SS_BITS = {v: k for k, v in _FLAC_SS_CODES.items()}

#: Payload-size cap for the whole-payload rice bit cache (bit array is
#: 8x payload, 1-positions up to 8 B/bit): above this, residuals decode
#: through the sequential O(1)-memory reader instead — a hostile
#: payload must not be able to OOM an Arrow worker via the cache.
_RICE_CACHE_CAP = 8 << 20


def _sext(v: int, bits: int) -> int:
    """Two's-complement sign extension of a `bits`-wide field."""
    if bits == 0:
        return 0
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _flac_read_residual(
    r: _MSBReader, bsz: int, order: int
) -> np.ndarray:
    """Partitioned rice residual (RFC 9639 §9.2.7): 2-bit method (rice
    4-bit / rice2 5-bit parameters), 4-bit partition order, per
    partition either rice codes (unary quotient + param LSBs, zigzag
    sign fold) or the escape (param all-ones -> 5-bit raw width,
    width 0 = all zeros)."""
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = r.read(4)
    parts = 1 << po
    if bsz % parts or bsz // parts <= order:
        raise ValueError("invalid FLAC rice partition order")
    out = np.empty(bsz - order, dtype=np.int64)
    if len(r.b) > _RICE_CACHE_CAP:
        # Memory guard: the vectorized path below caches the WHOLE
        # payload as a bit array (8x payload) plus its 1-positions
        # (8 bytes each) — fine for the kilobyte-scale frames this
        # corpus carries, an Arrow-worker OOM vector for a hostile
        # multi-hundred-MB payload (the same failure class
        # _check_canvas_dims closed for images). Past the cap, decode
        # sequentially: slower, O(1) extra memory.
        w = 0
        for p in range(parts):
            count = bsz // parts - (order if p == 0 else 0)
            param = r.read(pbits)
            if param == escape:
                raw = r.read(5)
                if raw:
                    sign = 1 << (raw - 1)
                    for i in range(count):
                        out[w + i] = (r.read(raw) ^ sign) - sign
                else:
                    out[w : w + count] = 0
            else:
                k = param
                for i in range(count):
                    u = (r.read_unary() << k) | (r.read(k) if k else 0)
                    out[w + i] = (u >> 1) ^ -(u & 1)
            w += count
        return out
    # Vectorized walk over a whole-payload bit cache: a rice code is
    # (unary quotient, 1-terminator, param LSBs), so the terminator of
    # code i is the FIRST 1-bit at or after start_i (every bit between
    # is a zero by construction) and start_{i+1} = t_i + 1 + param.
    # Finding terminators is one searchsorted into the payload's
    # 1-positions per code (the only sequential dependence); the
    # fixed-width LSB suffixes and zigzag unfold then batch per
    # partition — this replaced a per-sample read_unary/read pair,
    # the FLAC decode floor's hot loop. `ones` stays an int64 array
    # (8 B/bit) rather than a Python int list (~28 B/bit + object
    # churn): ~4x less cache memory for the same walk.
    if r.bits is None:
        r.bits = np.unpackbits(np.frombuffer(r.b, np.uint8))
        r.ones = np.flatnonzero(r.bits)
    bits = r.bits
    ones = r.ones
    ones_search = ones.searchsorted
    n_ones = len(ones)
    total = len(bits)
    cur = r.pos * 8 + r.bit

    def take(n: int) -> int:
        nonlocal cur
        if cur + n > total:
            raise ValueError("truncated FLAC bitstream")
        v = 0
        for bitv in bits[cur : cur + n]:
            v = (v << 1) | int(bitv)
        cur += n
        return v

    w = 0
    for p in range(parts):
        count = bsz // parts - (order if p == 0 else 0)
        param = take(pbits)
        if param == escape:
            raw = take(5)
            if raw:
                end = cur + count * raw
                if end > total:
                    raise ValueError("truncated FLAC bitstream")
                idx = (
                    cur
                    + np.arange(count)[:, None] * raw
                    + np.arange(raw)[None, :]
                )
                vals = bits[idx] @ (1 << np.arange(raw - 1, -1, -1))
                sign = 1 << (raw - 1)
                out[w : w + count] = (vals ^ sign) - sign
                cur = end
            else:
                out[w : w + count] = 0
            w += count
        else:
            k = param
            ts = np.empty(count, dtype=np.int64)
            c = cur
            for i in range(count):
                m = ones_search(c)
                if m >= n_ones:
                    raise ValueError("truncated FLAC bitstream")
                t = int(ones[m])
                ts[i] = t
                c = t + 1 + k
            if count and ts[-1] + 1 + k > total:
                raise ValueError("truncated FLAC bitstream")
            starts = np.empty(count, dtype=np.int64)
            if count:
                starts[0] = cur
                starts[1:] = ts[:-1] + 1 + k
            q = ts - starts
            if k:
                sidx = ts[:, None] + 1 + np.arange(k)[None, :]
                suf = bits[sidx] @ (1 << np.arange(k - 1, -1, -1))
            else:
                suf = np.zeros(count, dtype=np.int64)
            u = (q << k) | suf
            out[w : w + count] = (u >> 1) ^ -(u & 1)
            w += count
            cur = c
    r.pos, r.bit = cur >> 3, cur & 7
    return out


#: j-th order fixed predictor == j-th finite difference; reconstruction
#: is j nested prefix sums seeded from the warm-up samples' differences
def _flac_restore_fixed(
    warm: np.ndarray, res: np.ndarray, order: int
) -> np.ndarray:
    full = res.astype(np.int64)
    for j in range(order - 1, -1, -1):
        seed = np.diff(warm, n=j)[-1] if order else 0
        full = np.cumsum(full) + int(seed)
    return np.concatenate([warm, full]) if order else full


def _flac_read_subframe(r: _MSBReader, bsz: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC subframe pad bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        out = np.full(bsz, _sext(r.read(eff), eff), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.fromiter(
            (_sext(r.read(eff), eff) for _ in range(bsz)), np.int64, bsz
        )
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        if order > bsz:
            raise ValueError("FLAC fixed order exceeds block size")
        warm = np.fromiter(
            (_sext(r.read(eff), eff) for _ in range(order)), np.int64, order
        )
        res = _flac_read_residual(r, bsz, order)
        out = _flac_restore_fixed(warm, res, order)
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        if order > bsz:
            raise ValueError("FLAC LPC order exceeds block size")
        warm = [
            _sext(r.read(eff), eff) for _ in range(order)
        ]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = _sext(r.read(5), 5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [_sext(r.read(prec), prec) for _ in range(order)]
        res = _flac_read_residual(r, bsz, order)
        s = list(warm)
        for e in res.tolist():  # genuinely sequential IIR
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * s[-1 - j]
            s.append(e + (pred >> shift))
        out = np.asarray(s, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    return out << wasted


def decode_flac(payload: bytes):
    """FLAC (RFC 9639) -> (meta dict, (n_samples, channels) int32).
    Full decode of the lossless predictive codec: STREAMINFO +
    skipped metadata blocks, frame headers (all block-size/sample-
    rate/sample-size codes, UTF-8-style coded numbers, CRC-8),
    CONSTANT/VERBATIM/FIXED/LPC subframes with wasted bits, partitioned
    rice/rice2 residuals with the raw-escape, all four channel
    assignments (independent, left-side, right-side, mid-side), frame
    CRC-16, and the STREAMINFO MD5 (verified over the decoded samples
    when present — a torn or tampered stream fails loudly, the
    quarantine contract). Sample widths 8-32 bits decode; the decoded
    array is int32 like `decode_wav` (16-bit scale for this family)."""
    import hashlib

    b = bytes(payload)
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(b):
            raise ValueError("truncated FLAC metadata header")
        last = bool(b[pos] & 0x80)
        btype = b[pos] & 0x7F
        size = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC metadata block")
        if btype == 127:
            raise ValueError("forbidden FLAC metadata block type 127")
        if btype == 0:
            if size < 34:
                raise ValueError("truncated FLAC STREAMINFO")
            mr = _MSBReader(body)
            mr.read(16)  # min block size
            mr.read(16)  # max block size
            mr.read(24)  # min frame size
            mr.read(24)  # max frame size
            rate = mr.read(20)
            channels = mr.read(3) + 1
            bits = mr.read(5) + 1
            total = mr.read(36)
            info = {
                "sample_rate": rate,
                "channels": channels,
                "bits": bits,
                "total": total,
                "md5": body[18:34],
            }
        pos += 4 + size
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    if info["sample_rate"] == 0 or info["bits"] < 4:
        raise ValueError("invalid FLAC STREAMINFO")

    channels = info["channels"]
    bits = info["bits"]
    blocks: list[np.ndarray] = []
    n_out = 0
    bit_cache = None  # (bits array, ones list) shared across frames
    while pos < len(b):
        if len(b) - pos < 2:
            break  # trailing torn bytes: salvage decoded frames
        frame_start = pos
        r = _MSBReader(b, pos)
        if bit_cache is not None:
            r.bits, r.ones = bit_cache
        try:
            if r.read(14) != 0x3FFE:
                raise ValueError("bad FLAC frame sync")
            if r.read(1):
                raise ValueError("FLAC frame reserved bit set")
            r.read(1)  # blocking strategy
            bs_code = r.read(4)
            sr_code = r.read(4)
            ch_code = r.read(4)
            ss_code = r.read(3)
            if r.read(1):
                raise ValueError("FLAC frame reserved bit set")
            _flac_utf8_decode(r)  # frame/sample number
            if bs_code == 0:
                raise ValueError("reserved FLAC block size code")
            elif bs_code == 1:
                bsz = 192
            elif bs_code <= 5:
                bsz = 576 << (bs_code - 2)
            elif bs_code == 6:
                bsz = r.read(8) + 1
            elif bs_code == 7:
                bsz = r.read(16) + 1
            else:
                bsz = 256 << (bs_code - 8)
            if sr_code == 15:
                raise ValueError("invalid FLAC sample rate code")
            elif sr_code == 12:
                r.read(8)
            elif sr_code in (13, 14):
                r.read(16)
            if ch_code >= 11:
                raise ValueError("reserved FLAC channel assignment")
            n_ch = (ch_code + 1) if ch_code <= 7 else 2
            if n_ch != channels:
                raise ValueError("FLAC frame channel count mismatch")
            if ss_code == 0:
                bps = bits
            elif ss_code in _FLAC_SS_BITS:
                bps = _FLAC_SS_BITS[ss_code]
            else:
                raise ValueError("reserved FLAC sample size code")
            crc_pos = r.pos
            if _crc8(b[frame_start:crc_pos]) != r.read(8):
                raise ValueError("FLAC frame header CRC-8 mismatch")
            subs = []
            for c in range(n_ch):
                side = (
                    (ch_code == 8 and c == 1)
                    or (ch_code == 9 and c == 0)
                    or (ch_code == 10 and c == 1)
                )
                subs.append(_flac_read_subframe(r, bsz, bps + side))
            r.align()
            crc_pos = r.pos
            if _crc16(b[frame_start:crc_pos]) != r.read(16):
                raise ValueError("FLAC frame CRC-16 mismatch")
        except ValueError:
            if blocks and n_out >= info["total"] > 0:
                break  # torn trailing junk after a complete stream
            raise
        finally:
            if r.bits is not None:
                bit_cache = (r.bits, r.ones)
        if ch_code == 8:  # left-side
            left, side = subs
            subs = [left, left - side]
        elif ch_code == 9:  # side-right
            side, right = subs
            subs = [right + side, right]
        elif ch_code == 10:  # mid-side
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        blocks.append(np.stack(subs, axis=1))
        n_out += bsz
        pos = crc_pos + 2
    if not blocks and info["total"]:
        raise ValueError("FLAC stream ended before any audio frame")
    samples = (
        np.concatenate(blocks, axis=0)
        if blocks
        else np.zeros((0, channels), dtype=np.int64)
    )
    if info["total"]:
        if len(samples) < info["total"]:
            raise ValueError("FLAC stream shorter than STREAMINFO total")
        samples = samples[: info["total"]]
    if info["md5"] != b"\x00" * 16 and bits % 8 == 0:
        width = bits // 8
        lo = -(1 << (bits - 1))
        hi = (1 << (bits - 1)) - 1
        if samples.size and (samples.min() < lo or samples.max() > hi):
            raise ValueError("FLAC sample out of declared range")
        raw = b"".join(
            int(v).to_bytes(width, "little", signed=True)
            for v in samples.reshape(-1)
        )
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("FLAC MD5 signature mismatch")
    meta = {
        "sample_rate": info["sample_rate"],
        "channels": channels,
        "bits": bits,
        "n_samples": int(len(samples)),
    }
    return meta, samples.astype(np.int32)


def _flac_zigzag(res: np.ndarray) -> np.ndarray:
    return (res << 1) ^ (res >> 63)


def _flac_best_rice(zig: np.ndarray) -> tuple[int, int]:
    """(best k, bits) for one partition — exact cost, vectorized.
    Scans every k (the unary part sum(zig>>k) can plateau on skewed
    residual distributions, so a heuristic early break on rising cost
    could skip a better k); the only early exit is exact: once the
    shifted sum reaches 0, each further k adds n bits and can never
    win."""
    n = len(zig)
    best_k, best_cost = 0, None
    total = int(zig.sum())
    for k in range(0, 31):
        shifted = total if k == 0 else int((zig >> k).sum())
        cost = shifted + n * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        if shifted == 0:
            break
    return best_k, best_cost


def _flac_write_residual(
    w: _MSBWriter, res: np.ndarray, bsz: int, order: int, po: int
) -> None:
    while po > 0 and (bsz % (1 << po) or bsz // (1 << po) <= order):
        po -= 1  # largest legal partition order at this geometry
    parts = 1 << po
    zig = _flac_zigzag(res.astype(np.int64))
    plans = []
    need_rice2 = False
    off = 0
    for p in range(parts):
        count = bsz // parts - (order if p == 0 else 0)
        pz = zig[off : off + count]
        off += count
        k, rice_cost = _flac_best_rice(pz)
        raw = int(pz.max()).bit_length() + 1 if count and pz.max() else 0
        if raw > 32:
            raise ValueError("FLAC residual exceeds 32-bit raw escape")
        esc_cost = 5 + count * raw
        use_esc = esc_cost < rice_cost
        plans.append((use_esc, k, raw, pz, res[off - count : off]))
        if not use_esc and k > 14:
            need_rice2 = True
    method = 1 if need_rice2 else 0
    pbits = 4 + method
    escape = (1 << pbits) - 1
    w.write(method, 2)
    w.write(po, 4)
    for use_esc, k, raw, pz, pr in plans:
        if use_esc:
            w.write(escape, pbits)
            w.write(raw, 5)
            for v in pr.tolist():
                w.write(int(v), raw)
        else:
            w.write(k, pbits)
            for u in pz.tolist():
                w.write_unary(int(u) >> k)
                w.write(int(u), k)


def _flac_lpc_analyze(
    sig: np.ndarray, order: int, precision: int = 12
) -> tuple[list[int], int] | None:
    """Levinson-Durbin on the block's autocorrelation -> quantized
    integer predictor (coefficients, shift), or None when degenerate
    (constant/near-silent blocks fall back to the fixed predictors)."""
    x = sig.astype(np.float64)
    n = len(x)
    if n <= order:
        return None
    ac = np.array(
        [float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)]
    )
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        k = acc / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1.0 - k * k
        if err <= 0:
            return None
    cmax = float(np.abs(a).max())
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    shift = min(15, max(1, (precision - 1) - int(np.floor(np.log2(cmax))) - 1))
    q = np.clip(
        np.round(a * (1 << shift)),
        -(1 << (precision - 1)),
        (1 << (precision - 1)) - 1,
    ).astype(np.int64)
    if not q.any():
        return None
    return q.tolist(), shift


def _flac_write_subframe(
    w: _MSBWriter, sig: np.ndarray, bps: int, po: int, lpc_order: int
) -> None:
    sig = sig.astype(np.int64)
    bsz = len(sig)
    wasted = 0
    if sig.any():
        # common trailing zero bits -> the wasted-bits field (spec's
        # intended use: upscaled sources)
        ored = int(np.bitwise_or.reduce(sig))
        wasted = (ored & -ored).bit_length() - 1
        if wasted:
            sig = sig >> wasted
    eff = bps - wasted
    if np.all(sig == sig[0]) if bsz else True:
        w.write(0, 1)
        w.write(0, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)
        w.write(int(sig[0]) if bsz else 0, eff)
        return
    candidates: list[tuple[int, str, object]] = []
    best_fixed, best_cost = 0, None
    for order in range(0, min(4, bsz - 1) + 1):
        res = np.diff(sig, n=order)
        zig = _flac_zigzag(res)
        cost = int(np.log2(zig + 1).sum()) + order * eff
        if best_cost is None or cost < best_cost:
            best_fixed, best_cost = order, cost
    candidates.append((best_cost, "fixed", best_fixed))
    if lpc_order > 0:
        lpc = _flac_lpc_analyze(sig, min(lpc_order, bsz - 1))
        if lpc is not None:
            coefs, shift = lpc
            order = len(coefs)
            hist = sig
            pred = np.zeros(bsz - order, dtype=np.int64)
            for j, c in enumerate(coefs):
                pred += int(c) * hist[order - 1 - j : bsz - 1 - j]
            res = sig[order:] - (pred >> shift)
            zig = _flac_zigzag(res)
            cost = int(np.log2(zig + 1).sum()) + order * (eff + 12)
            candidates.append((cost, "lpc", (coefs, shift, res)))
    _, kind, chosen = min(candidates, key=lambda t: t[0])
    verb_cost = bsz * eff
    if min(c[0] for c in candidates) > verb_cost:
        kind = "verbatim"
    w.write(0, 1)
    if kind == "verbatim":
        w.write(1, 6)
    elif kind == "fixed":
        w.write(8 + chosen, 6)
    else:
        w.write(32 + len(chosen[0]) - 1, 6)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)
    if kind == "verbatim":
        for v in sig.tolist():
            w.write(int(v), eff)
        return
    if kind == "fixed":
        order = chosen
        for v in sig[:order].tolist():
            w.write(int(v), eff)
        _flac_write_residual(w, np.diff(sig, n=order), bsz, order, po)
        return
    coefs, shift, res = chosen
    order = len(coefs)
    for v in sig[:order].tolist():
        w.write(int(v), eff)
    w.write(12 - 1, 4)  # precision code: 12 bits
    w.write(shift, 5)
    for c in coefs:
        w.write(int(c), 12)
    _flac_write_residual(w, res, bsz, order, po)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bits: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    partition_order: int = 0,
    lpc_order: int = 0,
) -> bytes:
    """(n,) or (n, channels) int -> FLAC bytes (RFC 9639), losslessly.
    Per block, every channel picks the cheapest of CONSTANT / VERBATIM
    / FIXED orders 0-4 / (with `lpc_order` > 0) a Levinson-Durbin LPC
    predictor, residuals rice-coded with up to 2^`partition_order`
    partitions (per-partition parameter search, raw escape when
    cheaper, rice2 when a parameter outgrows 4 bits). `stereo_mode`
    exercises the decorrelation paths: independent | left-side |
    right-side | mid-side. STREAMINFO carries the real MD5 so decode
    is integrity-checked end to end."""
    import hashlib

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] < 1 or s.shape[1] > 8:
        raise ValueError(f"expected (n, 1..8) samples, got {s.shape}")
    if bits not in (8, 16):
        raise ValueError("encoder supports 8- or 16-bit samples")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if s.size and (s.min() < lo or s.max() > hi):
        raise ValueError(f"sample out of {bits}-bit range")
    if not 1 <= block_size <= 65536:
        raise ValueError("block size must be 1..65536")
    n, channels = s.shape
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    ch_code = {
        "independent": channels - 1,
        "left-side": 8,
        "right-side": 9,
        "mid-side": 10,
    }.get(stereo_mode)
    if ch_code is None:
        raise ValueError(f"unknown stereo mode {stereo_mode!r}")

    frames = []
    for fi, off in enumerate(range(0, max(n, 1), block_size)):
        block = s[off : off + block_size]
        if not len(block):
            break
        bsz = len(block)
        w = _MSBWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed block-size stream; coded number = frame #
        bs_code = _FLAC_BS_CODES.get(bsz, 7)
        w.write(bs_code, 4)
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(ch_code, 4)
        w.write(_FLAC_SS_CODES[bits], 3)
        w.write(0, 1)
        for byte in _flac_utf8_encode(fi):
            w.write(byte, 8)
        if bs_code == 7:
            w.write(bsz - 1, 16)
        w.align()
        head = w.bytes()
        w = _MSBWriter()
        if ch_code <= 7:
            chans = [(block[:, c], bits) for c in range(channels)]
        else:
            left = block[:, 0]
            right = block[:, 1]
            side = left - right
            if ch_code == 8:
                chans = [(left, bits), (side, bits + 1)]
            elif ch_code == 9:
                chans = [(side, bits + 1), (right, bits)]
            else:
                chans = [((left + right) >> 1, bits), (side, bits + 1)]
        for sig, bps in chans:
            _flac_write_subframe(w, sig, bps, partition_order, lpc_order)
        w.align()
        body = w.bytes()
        framed = head + bytes([_crc8(head)]) + body
        frames.append(framed + _crc16(framed).to_bytes(2, "big"))

    md5 = hashlib.md5(
        b"".join(
            int(v).to_bytes(bits // 8, "little", signed=True)
            for v in s.reshape(-1)
        )
    ).digest()
    mi = _MSBWriter()
    mi.write(min(block_size, max(n, 1)) if n else block_size, 16)
    mi.write(block_size, 16)
    fsizes = [len(f) for f in frames] or [0]
    mi.write(min(fsizes), 24)
    mi.write(max(fsizes), 24)
    mi.write(sample_rate, 20)
    mi.write(channels - 1, 3)
    mi.write(bits - 1, 5)
    mi.write(n, 36)
    mi.align()
    streaminfo = mi.bytes() + md5
    return (
        b"fLaC"
        + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        + b"".join(frames)
    )


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """GIF87a/89a ANIMATION -> (meta, [composited (H, W, 3) uint8
    frames]) — the full temporal walk the first-frame `decode_gif`
    skips: graphic control extensions (per-frame transparency index,
    disposal method, delay), partial/offset frames composited onto the
    logical-screen canvas, and the published disposal semantics
    BETWEEN frames (0/1 leave in place, 2 restore the frame rectangle
    to the background color, 3 restore the pre-frame canvas). Each
    returned frame is the fully composited screen as a compositing
    renderer would display it — frames genuinely DEPEND on their
    predecessors, which is what makes the animated container a
    temporal format rather than a stack of stills. Unknown extensions
    (NETSCAPE loops, comments) skip via the sub-block grammar.
    `max_frames` bounds decode work for sampling consumers."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(b) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    _check_canvas_dims(sw, sh, "GIF screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + n * 3 > len(b):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3

    def skip_subblocks(p: int) -> int:
        while p < len(b) and b[p]:
            p += 1 + b[p]
        return p + 1

    bg_rgb = (
        gct[bg]
        if gct is not None and bg < gct.shape[0]
        else (gct[0] if gct is not None else np.zeros(3, dtype=np.uint8))
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[np.ndarray] = []
    delays: list[int] = []
    gce: tuple[int, int | None, int] | None = None  # (disposal, tidx, delay)
    while pos < len(b):
        tag = b[pos]
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension
            if pos + 2 > len(b):
                raise ValueError("truncated GIF extension")
            label = b[pos + 1]
            if label == 0xF9:  # graphic control
                if pos + 7 > len(b) or b[pos + 2] != 4:
                    raise ValueError("malformed GIF graphic control block")
                gpacked = b[pos + 3]
                delay = int.from_bytes(b[pos + 4 : pos + 6], "little")
                tidx = b[pos + 6] if gpacked & 1 else None
                gce = ((gpacked >> 2) & 7, tidx, delay)
            pos = skip_subblocks(pos + 2)
            continue
        if tag != 0x2C:
            raise ValueError(f"unknown GIF block 0x{tag:02X}")
        if pos + 10 > len(b):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos + 1)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            if pos + n * 3 > len(b):
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image has no color table")
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError("invalid GIF image dimensions")
        if pos >= len(b):
            raise ValueError("truncated GIF image data")
        min_code = b[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(b) and b[pos]:
            size = b[pos]
            lzw += b[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code), dtype=np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data does not match dimensions")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, h, step):
                    deinter[y] = idx[src]
                    src += 1
            idx = deinter
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF palette index out of range")
        disposal, tidx, delay = gce if gce is not None else (0, None, 0)
        gce = None
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = pal[idx]
        if tidx is None:
            region[:] = rgb
        else:
            mask = idx != tidx
            region[mask] = rgb[mask]
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas = saved
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image data")
    meta = {
        "width": sw,
        "height": sh,
        "n_frames": len(frames),
        "delays_cs": delays,
    }
    return meta, frames


def encode_gif_anim(
    frames: list[dict],
    palette: np.ndarray,
    screen: tuple[int, int],
    bg: int = 0,
    loop: bool = True,
) -> bytes:
    """Animated GIF89a writer — the round-trip twin of
    `decode_gif_frames`. `frames` is a list of dicts with `idx`
    ((h, w) uint8 palette indices) and optional `left`/`top` offsets,
    `disposal` (0-3), `transparent` index, `delay_cs`; `screen` is the
    logical screen (w, h). Emits a graphic control extension per frame
    and (with `loop`) the NETSCAPE application extension, so the
    decoder's GCE parse, disposal/transparency compositing and
    unknown-extension skip paths are all round-trip exercisable."""
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not len(frames):
        raise ValueError("need frames and an (N, 3) palette")
    sw, sh = screen
    depth = max(1, (int(pal.shape[0]) - 1).bit_length())
    n = 1 << depth
    pal_full = np.zeros((n, 3), dtype=np.uint8)
    pal_full[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (depth - 1), bg, 0)
    out += pal_full.tobytes()
    if loop:  # NETSCAPE 2.0 infinite loop (an app extension to skip)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        a = np.asarray(f["idx"], dtype=np.uint8)
        if a.ndim != 2:
            raise ValueError("frame idx must be (H, W)")
        h, w = a.shape
        left, top = int(f.get("left", 0)), int(f.get("top", 0))
        if left + w > sw or top + h > sh:
            raise ValueError("frame exceeds logical screen")
        if int(a.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        disposal = int(f.get("disposal", 0))
        trans = f.get("transparent")
        gpacked = (disposal & 7) << 2 | (1 if trans is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gpacked])
        out += int(f.get("delay_cs", 4)).to_bytes(2, "little")
        out += bytes([trans if trans is not None else 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        min_code = max(2, depth)
        out += bytes([min_code])
        data = _lzw_encode(a.reshape(-1).tobytes(), min_code)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# APNG (the animated-PNG extension, standardized into the W3C PNG
# spec 3rd edition): acTL/fcTL/fdAT chunks over the same DEFLATE +
# filter machinery as still PNG — the second temporal container in
# the family, and the first with TRUE ALPHA COMPOSITING (blend op
# OVER), not just palette rectangles
# ---------------------------------------------------------------------------

def decode_apng_frames(payload: bytes, max_frames: int | None = None):
    """APNG -> (meta, [composited (H, W, C) frames]) — the animated
    walk: acTL declares the frame count, each fcTL carries the frame
    rectangle, delay, dispose op (0 none, 1 background, 2 previous)
    and blend op (0 source, 1 over); frame pixel data rides in IDAT
    (first frame, when its fcTL precedes IDAT) or fdAT chunks, each
    frame its own zlib stream filtered exactly like a still PNG.
    Compositing follows the spec: OVER alpha-composites onto the
    canvas (for alpha-less color types it equals SOURCE), dispose 1
    clears the rectangle to fully-transparent/black, dispose 2 reverts
    the canvas. Sequence numbers must be consecutive from 0 (shared
    fcTL/fdAT counter) — a reordered or torn stream fails loudly.
    Still PNGs (no acTL) return their single image. Palette APNG
    raises NotImplementedError (tRNS-over-palette is the documented
    unsupported variant); gray/RGB/GA/RGBA at depths 8 and 16 decode.
    """
    b = bytes(payload)
    if b[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr = None
    actl = None
    fctls: list[dict] = []  # in stream order
    cur_data: bytearray | None = None
    idat_frame: dict | None = None
    seq_expect = 0
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"acTL":
            if len(data) != 8:
                raise ValueError("malformed APNG acTL chunk")
            actl = struct.unpack(">II", data)
        elif ctype == b"fcTL":
            if len(data) != 26:
                raise ValueError("malformed APNG fcTL chunk")
            (seq, w, h, x, y, dnum, dden, dop, bop) = struct.unpack(
                ">IIIIIHHBB", data
            )
            if seq != seq_expect:
                raise ValueError("APNG sequence number out of order")
            seq_expect += 1
            fctls.append(
                {
                    "w": w, "h": h, "x": x, "y": y,
                    "delay": (dnum, dden or 100),
                    "dispose": dop, "blend": bop, "data": bytearray(),
                }
            )
            cur_data = fctls[-1]["data"]
        elif ctype == b"IDAT":
            if fctls and fctls[-1]["data"] is cur_data and not fctls[-1]["data"]:
                idat_frame = fctls[-1]
            if idat_frame is not None:
                idat_frame["data"].extend(data)
            else:
                # IDAT outside the animation (acTL present but first
                # fcTL after IDAT): decode as the static fallback only
                pass
        elif ctype == b"fdAT":
            if len(data) < 4:
                raise ValueError("malformed APNG fdAT chunk")
            seq = struct.unpack(">I", data[:4])[0]
            if seq != seq_expect:
                raise ValueError("APNG sequence number out of order")
            seq_expect += 1
            if cur_data is None:
                raise ValueError("APNG fdAT before any fcTL")
            cur_data.extend(data[4:])
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if actl is None:
        meta_s = {"width": ihdr[1], "height": ihdr[0]}
        img = decode_png(b)
        return (
            {"width": img.shape[1], "height": img.shape[0], "n_frames": 1,
             "delays": [(0, 100)]},
            [img],
        )
    width, height, depth, color_type, comp, filt, interlace = ihdr
    _check_canvas_dims(width, height, "APNG canvas")
    if color_type == 3:
        raise NotImplementedError("palette APNG not supported")
    if color_type not in _PNG_SAMPLES:
        raise ValueError(f"unknown PNG color type {color_type}")
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    if interlace != 0:
        raise NotImplementedError("interlaced APNG frames not supported")
    n_declared = actl[0]
    if n_declared != len(fctls) or not fctls:
        raise ValueError("APNG frame count does not match fcTL chunks")
    samples = _PNG_SAMPLES[color_type]
    sw = depth // 8
    has_alpha = color_type in (4, 6)
    dtype = np.uint16 if sw == 2 else np.uint8
    maxv = (1 << depth) - 1

    def _decode_region(data: bytes, w: int, h: int) -> np.ndarray:
        try:
            raw = zlib.decompress(bytes(data))
        except zlib.error as exc:
            raise ValueError(f"APNG frame stream corrupt: {exc}") from None
        bpp = samples * sw
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("APNG frame data does not match dimensions")
        img = _unfilter(raw, h, stride, bpp)
        if sw == 1:
            return img.reshape(h, w, samples)
        pairs = img.reshape(h, w * samples, 2).astype(np.uint16)
        return (pairs[:, :, 0] * 256 + pairs[:, :, 1]).reshape(h, w, samples)

    canvas = np.zeros((height, width, samples), dtype=dtype)
    frames: list[np.ndarray] = []
    delays: list[tuple[int, int]] = []
    for f in fctls:
        w, h, x, y = f["w"], f["h"], f["x"], f["y"]
        if w <= 0 or h <= 0 or x + w > width or y + h > height:
            raise ValueError("APNG frame rectangle outside the canvas")
        if f is idat_frame and (x, y, w, h) != (0, 0, width, height):
            raise ValueError("APNG IDAT frame must cover the full canvas")
        img = _decode_region(f["data"], w, h)
        saved = canvas.copy() if f["dispose"] == 2 else None
        region = canvas[y : y + h, x : x + w]
        if f["blend"] == 1 and has_alpha:
            fa = img[:, :, -1].astype(np.float64) / maxv
            ba = region[:, :, -1].astype(np.float64) / maxv
            oa = fa + ba * (1.0 - fa)
            fc = img[:, :, :-1].astype(np.float64)
            bc = region[:, :, :-1].astype(np.float64)
            num = fc * fa[:, :, None] + bc * (ba * (1.0 - fa))[:, :, None]
            with np.errstate(invalid="ignore"):
                oc = np.where(oa[:, :, None] > 0, num / np.where(
                    oa[:, :, None] > 0, oa[:, :, None], 1.0), 0.0)
            region[:, :, :-1] = np.clip(np.rint(oc), 0, maxv).astype(dtype)
            region[:, :, -1] = np.clip(np.rint(oa * maxv), 0, maxv).astype(dtype)
        elif f["blend"] in (0, 1):
            region[:] = img
        else:
            raise ValueError(f"unknown APNG blend op {f['blend']}")
        frames.append(canvas.copy())
        delays.append(f["delay"])
        if f["dispose"] == 1:
            canvas[y : y + h, x : x + w] = 0
        elif f["dispose"] == 2:
            canvas = saved
        elif f["dispose"] != 0:
            raise ValueError(f"unknown APNG dispose op {f['dispose']}")
        if max_frames is not None and len(frames) >= max_frames:
            break
    meta = {
        "width": width, "height": height,
        "n_frames": len(frames), "delays": delays,
    }
    return meta, frames


def encode_apng(
    frames: list[dict],
    canvas_size: tuple[int, int],
    filter_type: int = 1,
    num_plays: int = 0,
) -> bytes:
    """Animated-PNG writer, round-trip twin of `decode_apng_frames`.
    `frames` = [{img: (h, w, c) uint8/uint16, x, y, dispose (0-2),
    blend (0-1), delay: (num, den)}]; the first frame must cover the
    full canvas (it rides in IDAT per the spec; later frames ride
    fdAT). All frames share one color type/depth from frame 0's
    array."""
    if not frames:
        raise ValueError("need at least one frame")
    cw, ch = canvas_size
    f0 = np.asarray(frames[0]["img"])
    depth = 16 if f0.dtype == np.uint16 else 8
    c = f0.shape[2] if f0.ndim == 3 else 1
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if f0.ndim == 2:
        f0 = f0[:, :, None]
    if f0.shape[:2] != (ch, cw) or frames[0].get("x", 0) or frames[0].get("y", 0):
        raise ValueError("first APNG frame must cover the full canvas")
    ihdr = struct.pack(">IIBBBBB", cw, ch, depth, color_type, 0, 0, 0)
    out = bytearray(PNG_SIGNATURE)
    out += _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), num_plays))
    seq = 0
    for i, f in enumerate(frames):
        img = np.asarray(f["img"])
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] != c or (16 if img.dtype == np.uint16 else 8) != depth:
            raise ValueError("APNG frames must share color type and depth")
        h, w = img.shape[:2]
        x, y = int(f.get("x", 0)), int(f.get("y", 0))
        dnum, dden = f.get("delay", (4, 100))
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, x, y, dnum, dden,
            int(f.get("dispose", 0)), int(f.get("blend", 0)),
        )
        out += _png_chunk(b"fcTL", fctl)
        seq += 1
        bpp = c * (depth // 8)
        if depth == 8:
            rows = img.reshape(h, -1)
        else:
            rows = img.astype(">u2").reshape(h, -1).view(np.uint8).reshape(h, -1)
        data = zlib.compress(_filter_scanlines(rows, filter_type, bpp), 6)
        if i == 0:
            out += _png_chunk(b"IDAT", data)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI (the published Microsoft RIFF-AVI container format): hdrl/movi
# chunk walk for MJPEG streams — container parse on top of the T.81
# codec, so video decodes END TO END (container -> frame bytes ->
# entropy decode) with no third-party library
# ---------------------------------------------------------------------------

def parse_avi_mjpeg(payload: bytes):
    """RIFF-AVI -> (meta, [JPEG frame payloads]) for an MJPEG video
    stream: the 12-byte RIFF/'AVI ' header, the hdrl LIST (avih main
    header: frame interval, dims, declared frame count; strh/strf
    verify the stream is MJPG), then the movi LIST whose '##dc'/'##db'
    chunks carry one complete JPEG per frame (word-aligned, possibly
    zero-padded after EOI — trailing pad is stripped to the EOI
    marker). The optional idx1 index is skipped (frames are read in
    stream order, the contract a sequential scan wants). Non-MJPEG
    streams raise NotImplementedError (the documented
    motion-compensated swap point); malformed structure raises
    ValueError."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    n = len(b)
    meta = {}
    frames: list[bytes] = []
    saw_movi = False

    def walk(start: int, end: int, in_movi: bool) -> None:
        nonlocal saw_movi
        p = start
        while p + 8 <= end:
            cid = b[p : p + 4]
            size = int.from_bytes(b[p + 4 : p + 8], "little")
            body_start = p + 8
            if body_start + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                ltype = b[body_start : body_start + 4]
                if ltype == b"movi":
                    saw_movi = True
                walk(body_start + 4, body_start + size, ltype == b"movi")
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("truncated AVI main header")
                meta["us_per_frame"] = int.from_bytes(
                    b[body_start : body_start + 4], "little"
                )
                meta["n_frames_declared"] = int.from_bytes(
                    b[body_start + 16 : body_start + 20], "little"
                )
                meta["width"] = int.from_bytes(
                    b[body_start + 32 : body_start + 36], "little"
                )
                meta["height"] = int.from_bytes(
                    b[body_start + 36 : body_start + 40], "little"
                )
            elif cid == b"strh":
                if size >= 8 and b[body_start : body_start + 4] == b"vids":
                    handler = b[body_start + 4 : body_start + 8]
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI video codec {handler!r} not supported "
                            "(motion-compensated video is the documented "
                            "swap point)"
                        )
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frame = b[body_start : body_start + size]
                if frame[:2] != b"\xff\xd8":
                    raise ValueError("AVI MJPEG frame without JPEG SOI")
                eoi = frame.rfind(b"\xff\xd9")
                if eoi < 0:
                    raise ValueError("AVI MJPEG frame without JPEG EOI")
                frames.append(frame[: eoi + 2])
            p = body_start + size + (size & 1)  # RIFF chunks word-align

    walk(12, min(n, 8 + int.from_bytes(b[4:8], "little")), False)
    if not saw_movi:
        raise ValueError("AVI missing movi LIST")
    meta["n_frames"] = len(frames)
    return meta, frames


def build_avi_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """JPEG payloads -> minimal spec-shaped RIFF-AVI (hdrl with
    avih + one MJPG vids strl, movi with one '00dc' chunk per frame,
    idx1 index) — the round-trip twin of `parse_avi_mjpeg`."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = (
        (1_000_000 // fps).to_bytes(4, "little")
        + b"\x00" * 12
        + len(jpeg_frames).to_bytes(4, "little")
        + b"\x00" * 4
        + (1).to_bytes(4, "little")
        + b"\x00" * 4
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + b"\x00" * 16
    )
    strh = (
        b"vids" + b"MJPG" + b"\x00" * 12
        + (1).to_bytes(4, "little")  # scale
        + fps.to_bytes(4, "little")  # rate
        + b"\x00" * 4
        + len(jpeg_frames).to_bytes(4, "little")
        + b"\x00" * 16
    )
    strf = (  # BITMAPINFOHEADER with biCompression = 'MJPG'
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + (width * height * 3).to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4
    for f in jpeg_frames:
        idx += b"00dc" + (0x10).to_bytes(4, "little")
        idx += off.to_bytes(4, "little") + len(f).to_bytes(4, "little")
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# ---------------------------------------------------------------------------
# MPEG-1 Audio Layer I (ISO/IEC 11172-3): the perceptual-audio class.
# Frame header + bit allocation + scalefactors + symmetric-midtread
# requantization are spec-exact; the 32-band polyphase filterbank runs
# the spec's exact analysis/synthesis flowcharts (C.1.3 / 2.4.3.2 —
# 512-FIFO window, 8x64 partial sums, cos((2i+1)(k-16)pi/64)
# matrixing) over a locally-designed prototype window: the published
# Table B.3 window is a 512-entry optimized constant table with no
# generating formula, so it is THE one documented constant-table swap
# point in this codec (drop the table in to be sample-exact with
# reference decoders). The shipped prototype is the TDAC sine window
# on the FIFO's first 64 taps — the MDCT-degenerate member of the
# same cosine-modulated family, chosen after measuring alternatives
# (power-complementary frequency sampling ~51 dB, dense-grid +
# truncation ~60 dB, alternating-projection ~65 dB, LS-optimized
# synthesis ~79 dB): it reconstructs at ~76 dB with a 33-sample
# delay vs the spec window's ~96 dB at 481. Layers II/III stay behind
# NotImplementedError — Layer I already gives the modality its
# perceptual member (subband + scalefactor + adaptive bit
# allocation); reference swap point: the decode_wav perceptual-audio
# NotImplementedError in operators/multimodal.py.
# ---------------------------------------------------------------------------

#: Table B.1-equivalent: scf[idx] = 2 * 2^(-idx/3); indices 0..62
#: (63 is forbidden). Indices that are multiples of 3 are EXACT binary
#: powers — the integer-lattice anchor the gated synth chain rides.
_MPEG1_SCALEFACTORS = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))

#: Layer I bitrate table (kbps), index 1..14; index 0 = free format
#: (frame length not derivable from the header alone — unsupported),
#: index 15 forbidden.
_MPEG1_L1_BITRATES = (
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
)

#: sampling_frequency field -> Hz (index 3 reserved)
_MPEG1_SAMPLE_RATES = (44100, 48000, 32000)

#: end-to-end analysis->synthesis delay of the shipped prototype (the
#: spec window's is 481; the 64-tap TDAC prototype's is 33)
MPEG1_FILTERBANK_DELAY = 33

_mpeg1_cache: dict = {}


def _mpeg1_proto() -> np.ndarray:
    """512-tap analysis window C[i]: the TDAC sine window
    sin(pi(i+0.5)/64)/64 on the FIFO's newest 64 taps, zero beyond —
    the Princen-Bradley w[i]^2 + w[i+32]^2 = 1 overlap condition makes
    the cosine-modulated bank near-perfect-reconstructing (~76 dB,
    33-sample delay) with a window the code can GENERATE instead of
    quote. Stands in for Table B.3 (see section comment)."""
    key = "proto"
    if key not in _mpeg1_cache:
        C = np.zeros(512)
        C[:64] = np.sin(np.pi * (np.arange(64) + 0.5) / 64) / 64.0
        _mpeg1_cache[key] = C
    return _mpeg1_cache[key]


def _mpeg1_matrices() -> tuple[np.ndarray, np.ndarray]:
    """(analysis M (32,64), synthesis N (64,32)) spec matrixing."""
    key = "mat"
    if key not in _mpeg1_cache:
        i = np.arange(32)[:, None]
        k = np.arange(64)[None, :]
        ana = np.cos((2 * i + 1) * (k - 16) * np.pi / 64)
        ii = np.arange(64)[:, None]
        kk = np.arange(32)[None, :]
        syn = np.cos((16 + ii) * (2 * kk + 1) * np.pi / 64)
        _mpeg1_cache[key] = (ana, syn)
    return _mpeg1_cache[key]


def _small_gemm(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """A @ B in 64-row blocks. The filterbank GEMMs are tiny
    ((n,32)x(32,64) and (n,64)x(64,32)); above ~100 rows this host's
    BLAS fans them out across 32 threads and the dispatch overhead
    DOMINATES — measured 13.7 ms for a 1-MFLOP (468,32)@(32,64)
    product vs 0.27 ms blocked (50x). Small blocks stay on the
    single-thread path everywhere and cost nothing where BLAS behaves."""
    n = A.shape[0]
    if n <= 64:
        return A @ B
    out = np.empty((n, B.shape[1]))
    for i in range(0, n, 64):
        out[i : i + 64] = A[i : i + 64] @ B
    return out


def mpeg1_analysis(x: np.ndarray) -> np.ndarray:
    """(n,) float in [-1, 1) -> (n//32, 32) subband samples via the
    spec C.1.3 flowchart (vectorized: the 512-FIFO becomes a strided
    window view, Z/Y partial sums a reshape-sum, matrixing one
    matmul). Trailing samples beyond a 32-multiple are dropped."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x) // 32
    if n == 0:
        return np.zeros((0, 32))
    xpad = np.concatenate([np.zeros(480), x[: n * 32]])
    win = np.lib.stride_tricks.sliding_window_view(xpad, 512)[::32][:n]
    Z = win[:, ::-1] * _mpeg1_proto()[None, :]
    Y = Z.reshape(n, 8, 64).sum(axis=1)
    ana, _ = _mpeg1_matrices()
    return _small_gemm(Y, ana.T)


def mpeg1_synthesis(S: np.ndarray) -> np.ndarray:
    """(n, 32) subband samples -> (n*32,) PCM float via the spec
    2.4.3.2 flowchart (V-FIFO of 16 granule vectors, U selection,
    windowing, 16-segment sum), vectorized across granules. The
    analysis+synthesis gain and sign are folded into the synthesis
    window — the same place the spec folds its equivalent constant
    (Table B.3's D = 32*C scaling) — with the prototype's flat
    passband gain self-calibrated once from the chain's own response
    to a deterministic probe (measured frequency-flat to 5 decimals,
    so a single scalar corrects it)."""
    S = np.asarray(S, dtype=np.float64)
    n = S.shape[0]
    if n == 0:
        return np.zeros(0)
    return _mpeg1_synthesis_raw(S, _mpeg1_syn_window())


def _mpeg1_synthesis_raw(S: np.ndarray, D: np.ndarray) -> np.ndarray:
    _, syn = _mpeg1_matrices()
    n = S.shape[0]
    v = _small_gemm(S, syn.T)  # (n, 64); granule g's V-front
    vpad = np.concatenate([np.zeros((15, 64)), v])  # g-15..g available
    out = np.zeros((n, 32))
    for j in range(8):
        a = vpad[15 - 2 * j : 15 - 2 * j + n, :32]
        b = vpad[14 - 2 * j : 14 - 2 * j + n, 32:]
        out += a * D[None, 64 * j : 64 * j + 32]
        out += b * D[None, 64 * j + 32 : 64 * j + 64]
    return out.reshape(-1)


def _mpeg1_syn_window() -> np.ndarray:
    """Synthesis window D = -256 * C, unity-gain calibrated against a
    deterministic quasi-random probe through the full chain."""
    key = "syn"
    if key not in _mpeg1_cache:
        D = _mpeg1_proto() * -256.0
        x = np.sin(np.arange(32 * 256) * 1.6180339887498949)
        y = _mpeg1_synthesis_raw(mpeg1_analysis(x), D)
        d = MPEG1_FILTERBANK_DELAY
        ln = len(x) - d
        gain = float(np.dot(y[d : d + ln], x[:ln]) / np.dot(x[:ln], x[:ln]))
        _mpeg1_cache[key] = D / gain
    return _mpeg1_cache[key]


def _mpeg1_frame_slots(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer I frame length in 32-bit slots: 12*bitrate/fs (+padding).
    Must divide evenly when padding is 0 — the encoder restricts
    itself to (bitrate, fs) pairs where it does; the decoder accepts
    the padding bit as the spec's escape for 44.1 kHz."""
    return 12 * bitrate_kbps * 1000 // sample_rate + padding


def _mpeg_crc16(fields) -> int:
    """ISO/IEC 11172-3 §2.4.3.1 crc_check: CRC-16 with generator
    X^16 + X^15 + X^2 + 1 (0x8005), initial state all-ones, fed
    MSB-first with the protected bits — the last 16 header bits plus
    (for Layer I) the bit-allocation fields. `fields` is a sequence
    of (value, width) pairs in stream order."""
    crc = 0xFFFF
    for v, width in fields:
        for i in range(width - 1, -1, -1):
            fb = ((v >> i) & 1) ^ (crc >> 15)
            crc = (crc << 1) & 0xFFFF
            if fb:
                crc ^= 0x8005
    return crc


def build_mpeg1_layer1(
    levels: np.ndarray,
    scf_idx: np.ndarray,
    alloc: np.ndarray,
    sample_rate: int = 32000,
    protection: int = 1,
) -> bytes:
    """Pack Layer I frames from already-quantized integer subband
    LEVELS — the lattice-exact low-level packer the gated synthesis
    chain rides (the PCM encoder below quantizes through the analysis
    filterbank; this one takes the integers directly, so text-derived
    levels survive encode -> decode bit-exactly and the DuckDB oracle
    can mirror them with integer arithmetic).

    levels: (F, 12, 32, ch) int — symmetric midtread level v per
      sample, |v| <= 2^(nb-1) - 1 where nb = alloc for that subband.
    scf_idx: (F, 32, ch) int — Table B.1 scalefactor indices 0..62.
    alloc: (32,) int — bits per sample per subband, 0 (silent) or
      2..15, shared by every frame/channel (the spec allows per-frame
      per-channel allocation; a fixed profile keeps the oracle linear).
    protection: the header protection_bit — 1 (default) means no CRC;
      0 inserts the spec's 16-bit crc_check word (genuine §2.4.3.1
      CRC over the last 16 header bits + allocation) between header
      and allocation, which the decoder must consume to stay aligned.
    Picks the smallest standard bitrate whose frame fits and zero-pads
    the remainder (spec-sanctioned ancillary data)."""
    levels = np.asarray(levels)
    scf_idx = np.asarray(scf_idx)
    alloc = np.asarray(alloc, dtype=np.int64)
    if levels.ndim != 4 or levels.shape[1:3] != (12, 32):
        raise ValueError(f"levels must be (F, 12, 32, ch), got {levels.shape}")
    F, _, _, ch = levels.shape
    if F == 0:
        raise ValueError("need at least one frame of levels")
    if ch not in (1, 2):
        raise ValueError(f"Layer I supports 1 or 2 channels, got {ch}")
    if scf_idx.shape != (F, 32, ch):
        raise ValueError("scf_idx must be (F, 32, ch)")
    if alloc.shape != (32,):
        raise ValueError("alloc must be (32,)")
    if np.any((alloc != 0) & ((alloc < 2) | (alloc > 15))):
        raise ValueError("per-subband bits must be 0 or 2..15")
    if np.any((scf_idx < 0) | (scf_idx > 62)):
        raise ValueError("scalefactor index out of range 0..62")
    lim = (1 << (alloc - 1)) - 1  # max |level| per subband (alloc>=2)
    active = alloc > 0
    if np.any(np.abs(levels[:, :, active, :]) > lim[None, None, active, None]):
        raise ValueError("quantized level exceeds its allocation")
    try:
        sf_index = _MPEG1_SAMPLE_RATES.index(sample_rate)
    except ValueError:
        raise ValueError(f"unsupported MPEG-1 sample rate {sample_rate}")
    if protection not in (0, 1):
        raise ValueError("protection must be 0 (CRC present) or 1")
    nch = ch
    bits_needed = (
        32  # header
        + (16 if protection == 0 else 0)  # crc_check word
        + 32 * 4 * nch  # allocation
        + int(active.sum()) * 6 * nch  # scalefactors
        + 12 * int(alloc[active].sum()) * nch  # sample codes
    )
    slots_needed = -(-bits_needed // 32)
    for bi in range(1, 15):
        if (12 * _MPEG1_L1_BITRATES[bi] * 1000) % sample_rate:
            continue
        if _mpeg1_frame_slots(_MPEG1_L1_BITRATES[bi], sample_rate, 0) >= slots_needed:
            break
    else:
        raise ValueError(
            f"allocation needs {slots_needed} slots/frame — more than the "
            f"highest Layer I bitrate provides at {sample_rate} Hz"
        )
    slots = _mpeg1_frame_slots(_MPEG1_L1_BITRATES[bi], sample_rate, 0)
    mode = 0b11 if ch == 1 else 0b00
    # header + allocation are identical across frames: pack them once
    w = _MSBWriter()
    w.write(0xFFF, 12)  # syncword
    w.write(1, 1)  # ID: MPEG-1
    w.write(0b11, 2)  # layer I
    w.write(protection, 1)  # protection_bit: 0 = crc_check follows
    hdr_tail = [
        (bi, 4), (sf_index, 2), (0, 1), (0, 1), (mode, 2),
        (0, 2), (0, 1), (1, 1), (0, 2),
    ]  # bitrate..emphasis — the 16 header bits the CRC covers
    for v, width in hdr_tail:
        w.write(v, width)
    alloc_fields = [
        (int(alloc[sb]) - 1 if alloc[sb] else 0, 4)
        for sb in range(32)
        for _ in range(ch)
    ]
    if protection == 0:
        w.write(_mpeg_crc16(hdr_tail + alloc_fields), 16)
    for v, width in alloc_fields:
        w.write(v, width)
    w.align()
    # bits before the scalefactors (byte-aligned by construction)
    prefix_bits = 32 + (16 if protection == 0 else 0) + 32 * 4 * ch
    prefix = np.unpackbits(np.frombuffer(w.bytes(), np.uint8))[:prefix_bits]

    # sample-section bit layout, shared by every frame and granule
    # (the decode-side vectorization run in reverse: scatter each
    # field's bits through one fancy index per distinct width)
    act = [sb for sb in range(32) if alloc[sb]]
    goff_map = {}
    goff = 0
    for sb in act:
        for c in range(ch):
            goff_map[(sb, c)] = goff
            goff += int(alloc[sb])
    scf_bits_n = len(act) * 6 * ch
    total_bits = prefix_bits + scf_bits_n + 12 * goff
    frame_bits = np.zeros((F, slots * 32), dtype=np.uint8)
    frame_bits[:, :prefix_bits] = prefix[None, :]
    # scalefactors: 6-bit fields, frame-varying
    scf_act = scf_idx[:, act, :].reshape(F, -1).astype(np.int64)  # (F, k*ch)
    shifts6 = np.arange(5, -1, -1)
    scf_field_bits = ((scf_act[:, :, None] >> shifts6) & 1).astype(np.uint8)
    frame_bits[
        :, prefix_bits : prefix_bits + scf_bits_n
    ] = scf_field_bits.reshape(F, -1)
    base = prefix_bits + scf_bits_n
    rows = base + goff * np.arange(12)  # (12,)
    by_nb: dict[int, list[tuple[int, int]]] = {}
    for sb in act:
        for c in range(ch):
            by_nb.setdefault(int(alloc[sb]), []).append((sb, c))
    for nb, flds in by_nb.items():
        offs = np.array([goff_map[f] for f in flds])
        sbs = np.array([f[0] for f in flds])
        cs = np.array([f[1] for f in flds])
        codes = (
            levels[:, :, sbs, cs].astype(np.int64) + (1 << (nb - 1)) - 1
        )  # (F, 12, k)
        shifts = np.arange(nb - 1, -1, -1)
        fb = ((codes[:, :, :, None] >> shifts) & 1).astype(np.uint8)
        idx = (
            rows[:, None, None] + offs[None, :, None] + shifts[::-1][None, None, :]
        )  # (12, k, nb) — shifts[::-1] is just arange(nb)
        frame_bits[:, idx.reshape(-1)] = fb.reshape(F, -1)
    if total_bits > slots * 32 * 8:
        raise ValueError("frame overflow")  # pragma: no cover - guarded above
    return np.packbits(frame_bits, axis=1).tobytes()


def decode_mpeg1_levels(payload: bytes):
    """MPEG-1 Layer I -> (meta, levels (F, 12, 32, ch) int32,
    scf_idx (F, 32, ch) uint8, alloc (F, 32, ch) uint8) — the exact
    integer layer BELOW requantization: level v recovers from code c
    as v = c - (2^(nb-1) - 1) with the all-ones code forbidden
    (the quantizer has 2^nb - 1 symmetric levels; that exclusion is
    why the spec's requantization carries the 2^nb/(2^nb - 1)
    correction). Integer-exact end to end, so the oracle side needs
    no floats. Malformed frames raise ValueError; Layer II streams
    belong to decode_mpeg2_levels (decode_mpeg_audio dispatches) and
    Layer III raises NotImplementedError (documented swap point)."""
    b = bytes(payload)
    if len(b) < 4:
        raise ValueError("truncated MPEG audio payload")
    pos = 0
    frames = []
    meta: dict = {}
    while pos < len(b):
        if pos + 4 > len(b):
            raise ValueError("truncated MPEG frame header")
        r = _MSBReader(b, pos)
        if r.read(12) != 0xFFF:
            raise ValueError("bad MPEG sync word")
        if r.read(1) != 1:
            raise ValueError("not an MPEG-1 stream (ID bit 0)")
        layer = r.read(2)
        if layer != 0b11:
            if layer == 0:
                raise ValueError("reserved MPEG layer")
            raise NotImplementedError(
                "only MPEG-1 Layer I decodes here — Layer II has its own "
                "decoder (decode_mpeg2_levels; decode_mpeg_audio "
                "dispatches); Layer III + AAC remain the documented "
                "perceptual-codec swap point"
            )
        protection = r.read(1)  # 0 = a 16-bit CRC follows the header
        bi = r.read(4)
        if bi == 0:
            raise NotImplementedError("free-format bitrate not supported")
        if bi == 15:
            raise ValueError("forbidden MPEG bitrate index")
        sf_i = r.read(2)
        if sf_i == 3:
            raise ValueError("reserved MPEG sample-rate index")
        padding = r.read(1)
        r.read(1)  # private
        mode = r.read(2)
        r.read(2 + 1 + 1 + 2)  # mode_ext, copyright, original, emphasis
        ch = 1 if mode == 0b11 else 2
        rate = _MPEG1_SAMPLE_RATES[sf_i]
        slots = _mpeg1_frame_slots(_MPEG1_L1_BITRATES[bi], rate, padding)
        frame_end = pos + slots * 4
        if frame_end > len(b):
            raise ValueError("truncated MPEG frame body")
        if meta:
            if (meta["sample_rate"], meta["channels"]) != (rate, ch):
                raise ValueError("MPEG stream parameters change mid-stream")
        else:
            meta = {
                "sample_rate": rate,
                "channels": ch,
                "bitrate_kbps": _MPEG1_L1_BITRATES[bi],
                "layer": 1,
            }
        if protection == 0:
            # ISO/IEC 11172-3 §2.4.1.4: protection_bit=0 means a
            # crc_check word occupies the 16 bits between the header
            # and the allocation fields. The CRC value itself is not
            # verified (same stance as FLAC frame CRCs here), but it
            # MUST be consumed or every following field shifts 16 bits
            # and decodes garbage levels without erroring.
            r.read(16)
        alloc = np.zeros((32, ch), dtype=np.uint8)
        for sb in range(32):
            for c in range(ch):
                a = r.read(4)
                if a == 15:
                    raise ValueError("forbidden Layer I allocation 15")
                alloc[sb, c] = a + 1 if a else 0
        scf = np.zeros((32, ch), dtype=np.uint8)
        for sb in range(32):
            for c in range(ch):
                if alloc[sb, c]:
                    idx = r.read(6)
                    if idx == 63:
                        raise ValueError("forbidden scalefactor index 63")
                    scf[sb, c] = idx
        # Sample codes, vectorized: every one of the 12 granule-samples
        # has the IDENTICAL (subband, channel) bit layout, so instead
        # of 384*ch sequential bit reads the frame's bits unpack once
        # and each field becomes a (12, nb) gather + one dot with bit
        # weights — 32*ch numpy ops per frame (measured ~5x on the
        # level-decode path, the interpreter-bound floor of this
        # codec, same class as FLAC's rice loop).
        by_nb: dict[int, list[tuple[int, int, int]]] = {}
        goff = 0  # bits per sample group
        for sb in range(32):
            for c in range(ch):
                nb = int(alloc[sb, c])
                if nb:
                    by_nb.setdefault(nb, []).append((sb, c, goff))
                    goff += nb
        lev = np.zeros((12, 32, ch), dtype=np.int32)
        base = (r.pos - pos) * 8 + r.bit  # bit offset inside the frame
        end_bit = base + 12 * goff
        # audio_data must fit inside the header-declared slot count —
        # a reader that silently continued into the NEXT frame's bytes
        # would decode garbage without tripping the quarantine
        if end_bit > (frame_end - pos) * 8:
            raise ValueError("MPEG frame data overruns its slot length")
        if goff:
            bits = np.unpackbits(
                np.frombuffer(b, np.uint8, frame_end - pos, pos)
            )
            rows = base + goff * np.arange(12)  # (12,)
            for nb, flds in by_nb.items():  # one gather per distinct nb
                offs = np.array([f[2] for f in flds])  # (k,)
                idx = (
                    rows[:, None, None]
                    + offs[None, :, None]
                    + np.arange(nb)[None, None, :]
                )
                w = 1 << np.arange(nb - 1, -1, -1)
                codes = bits[idx] @ w  # (12, k)
                if np.any(codes == (1 << nb) - 1):
                    raise ValueError("forbidden all-ones sample code")
                vals = (codes - ((1 << (nb - 1)) - 1)).astype(np.int32)
                sbs = np.array([f[0] for f in flds])
                cs = np.array([f[1] for f in flds])
                lev[:, sbs, cs] = vals
        frames.append((lev, scf, alloc))
        pos = frame_end
    if not frames:
        raise ValueError("MPEG payload contains no frames")
    meta["n_frames"] = len(frames)
    levels = np.stack([f[0] for f in frames])
    scf_idx = np.stack([f[1] for f in frames])
    allocs = np.stack([f[2] for f in frames])
    return meta, levels, scf_idx, allocs


def decode_mpeg1_audio(payload: bytes):
    """MPEG-1 Layer I -> (meta, (n_samples, ch) int16 PCM): integer
    level decode, spec requantization s = scf * 2v/(2^nb - 1)
    (algebraically identical to 2.4.3.3's
    (2^nb/(2^nb-1)) * (s''' + 2^(1-nb)) form — see
    decode_mpeg1_levels), then the polyphase synthesis."""
    meta, levels, scf_idx, allocs = decode_mpeg1_levels(payload)
    F, _, _, ch = levels.shape
    scfv = np.asarray(_MPEG1_SCALEFACTORS)[scf_idx]  # (F, 32, ch)
    nb = allocs.astype(np.int64)
    denom = np.where(nb > 0, (1 << nb) - 1, 1).astype(np.float64)
    s = (
        levels.astype(np.float64)
        * 2.0
        / denom[:, None, :, :]
        * scfv[:, None, :, :]
    )  # (F, 12, 32, ch)
    sb = s.reshape(F * 12, 32, ch)
    pcm = np.empty((F * 384, ch), dtype=np.int16)
    for c in range(ch):
        y = mpeg1_synthesis(sb[:, :, c])
        pcm[:, c] = np.clip(np.rint(y * 32768.0), -32768, 32767).astype(np.int16)
    meta["n_samples"] = F * 384
    # Return-convention key (sample_rate/channels/bits) shared with the
    # WAV/FLAC decoders: audio_meta and every downstream feature reads
    # meta["bits"], and a missing key is a bare KeyError inside an
    # Arrow UDF — exactly what the quarantine contract forbids.
    meta["bits"] = 16
    return meta, pcm


def encode_mpeg1_layer1(
    pcm: np.ndarray, sample_rate: int = 32000, nb: int = 11
) -> bytes:
    """(n, ch) int16 PCM -> MPEG-1 Layer I bytes: polyphase analysis,
    per-frame-per-subband scalefactor selection (smallest Table B.1
    value covering the 12 granules' max, the spec's C.1.5.4 rule),
    symmetric-midtread quantization to 2^nb - 1 levels, frame pack.
    Fixed `nb` bits across subbands — encoder bit allocation is a
    quality choice the spec leaves free, and a flat profile is the
    honest baseline (no psychoacoustic model here)."""
    a = np.asarray(pcm)
    if not np.issubdtype(a.dtype, np.integer):
        raise ValueError(
            f"encode_mpeg1_layer1 expects integer int16-scale PCM, got "
            f"{a.dtype} (a [-1, 1) float would silently encode as silence)"
        )
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[1] not in (1, 2):
        raise ValueError(f"pcm must be (n,), (n, 1) or (n, 2), got {a.shape}")
    if not 2 <= nb <= 15:
        raise ValueError("nb must be 2..15")
    n, ch = a.shape
    F = max(1, -(-n // 384))
    x = np.zeros((F * 384, ch))
    x[:n] = a.astype(np.float64) / 32768.0
    scfs = np.asarray(_MPEG1_SCALEFACTORS)
    levels = np.zeros((F, 12, 32, ch), dtype=np.int32)
    scf_idx = np.zeros((F, 32, ch), dtype=np.int64)
    lim = (1 << (nb - 1)) - 1
    for c in range(ch):
        S = mpeg1_analysis(x[:, c]).reshape(F, 12, 32)
        mx = np.abs(S).max(axis=1)  # (F, 32)
        # largest index whose scalefactor still covers the max: the
        # table is decreasing, so searchsorted on the reversed table
        idx = 62 - np.searchsorted(scfs[::-1], mx, side="left")
        if np.any(idx < 0):
            raise ValueError("subband sample exceeds the scalefactor range")
        scf_idx[:, :, c] = idx
        v = np.rint(S / scfs[idx][:, None, :] * ((1 << nb) - 1) / 2.0)
        levels[:, :, :, c] = np.clip(v, -lim, lim).astype(np.int32)
    alloc = np.full(32, nb, dtype=np.int64)
    return build_mpeg1_layer1(levels, scf_idx, alloc, sample_rate)


# ---------------------------------------------------------------------------
# MPEG-1 Audio Layer II (ISO/IEC 11172-3 §2.4.1.6 / §2.4.2.2 / B.2)
#
# Same header/frame machinery as Layer I above, plus the two things
# Layer II adds: per-subband allocation CLASSES from Table B.2 (the
# allocation field width and its step-count meaning vary by subband
# and by which of the four B.2 tables the (sample_rate, bitrate/ch)
# pair selects) and GROUPED quantization (3/5/9-step classes pack
# three consecutive samples into one 5/7/10-bit base-L codeword).
# A frame carries 1152 samples/ch (12 granules x 3 samples), slots
# are BYTES (144*bitrate/fs), and scalefactors come 1-3 per frame
# part under the 2-bit scfsi transmission patterns.
#
# The level layer stays integer-exact: code c in 0..L-1 recovers
# v = c - L//2, and the spec's s'' = C*(s''' + D) requantization is
# algebraically 2v/L for EVERY Table B.4 class — grouped (D=1/2,
# C=2^ceil(log2 L)/L) and ungrouped (L=2^nb-1, D=2^(1-nb),
# C=2^nb/(2^nb-1), identical to Layer I) alike — so the DuckDB
# oracle mirrors the lattice with integer arithmetic.
#
# Documented constant-table swap point: the _L2_ROW_* step tuples and
# the nbal layout of _L2_TABLES transcribe Table B.2a-d; a
# transcription slip is confined to these tuples (reference:
# reference repo has no decoder — ASA reads decoded streams; public
# spec tables are the only source).
# ---------------------------------------------------------------------------

_MPEG1_L2_BITRATES = (
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
)
#: Layer II mode legality (§2.4.2.3): these bitrates are mono-only
_L2_MONO_ONLY = {32, 48, 56, 80}
#: and these forbid mono
_L2_NO_MONO = {224, 256, 320, 384}

# Table B.2 step rows (step count per allocation code; 0 = silent)
_L2_ROW_A = (  # nbal 4
    0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
    16383, 32767, 65535,
)
_L2_ROW_B = (  # nbal 4
    0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
    8191, 65535,
)
_L2_ROW_C = (0, 3, 5, 7, 9, 15, 31, 65535)  # nbal 3
_L2_ROW_D = (0, 3, 5, 65535)  # nbal 2
_L2_ROW_E = (  # nbal 4 (B.2c/d low-rate tables)
    0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
    16383, 32767,
)
_L2_ROW_F = (0, 3, 5, 9, 15, 31, 63, 127)  # nbal 3 (B.2c/d)

#: table id -> per-subband step row, length = sblimit
_L2_TABLES: dict[str, tuple] = {
    "a": (_L2_ROW_A,) * 3 + (_L2_ROW_B,) * 8 + (_L2_ROW_C,) * 12
    + (_L2_ROW_D,) * 4,
    "b": (_L2_ROW_A,) * 3 + (_L2_ROW_B,) * 8 + (_L2_ROW_C,) * 12
    + (_L2_ROW_D,) * 7,
    "c": (_L2_ROW_E,) * 2 + (_L2_ROW_F,) * 6,
    "d": (_L2_ROW_E,) * 2 + (_L2_ROW_F,) * 10,
}
#: grouped classes: steps -> bits for the 3-sample codeword
_L2_GROUP_BITS = {3: 5, 5: 7, 9: 10}


def _l2_sample_bits(steps: int) -> tuple[int, bool]:
    """(bits, grouped) for one 3-sample granule slot of a `steps`
    class: grouped classes use one base-`steps` codeword, others
    3 codes of log2(steps+1) bits."""
    if steps in _L2_GROUP_BITS:
        return _L2_GROUP_BITS[steps], True
    return 3 * (steps + 1).bit_length() - 3, False


def _mpeg2_frame_slots(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer II frame length in BYTE slots: 144*bitrate/fs (+padding)."""
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def _mpeg2_table_for(sample_rate: int, bitrate_kbps: int, ch: int) -> str:
    """Table B.2 selection by bitrate PER CHANNEL (§2.4.2.2)."""
    per_ch = bitrate_kbps // ch
    if per_ch in (32, 48):
        return "d" if sample_rate == 32000 else "c"
    if per_ch <= 80:
        return "a"
    return "a" if sample_rate == 48000 else "b"


def build_mpeg1_layer2(
    levels: np.ndarray,
    scf_idx: np.ndarray,
    alloc_codes: np.ndarray,
    sample_rate: int = 48000,
    bitrate_kbps: int | None = None,
    protection: int = 1,
) -> bytes:
    """Pack MPEG-1 Layer II frames from already-quantized integer
    subband LEVELS — the Layer II sibling of `build_mpeg1_layer1`,
    integer-exact so text-derived levels survive encode -> decode
    bit-exactly under the value-hash gate.

    levels: (F, 36, 32, ch) int — level v per sample on the midtread
      lattice, |v| <= steps//2 for that subband's class, 0 where
      silent. 36 = 12 granules x 3 samples in stream order.
    scf_idx: (F, 3, 32, ch) int — Table B.1 scalefactor index per
      frame PART (12 samples each); the packer derives the scfsi
      transmission pattern from equalities between the three parts
      (all equal -> pattern 2, first pair -> 1, last pair -> 3,
      else 0), so the decoder's expanded (F, 3, ...) form roundtrips
      exactly.
    alloc_codes: (32,) int — allocation CODE per subband into the
      selected B.2 table row (0 = silent), shared across frames and
      channels (the spec allows per-frame/channel codes; fixed keeps
      the oracle linear). Codes at subbands >= the table's sblimit
      must be 0.
    bitrate_kbps: explicit Layer II bitrate, or None to pick the
      smallest mode-legal rate whose frame fits AND whose B.2 table
      supports every requested allocation code.
    protection=0 inserts the §2.4.3.1 crc_check word (computed over
      the last 16 header bits + allocation + scfsi, per the spec's
      Layer II coverage)."""
    levels = np.asarray(levels)
    scf_idx = np.asarray(scf_idx)
    alloc_codes = np.asarray(alloc_codes, dtype=np.int64)
    if levels.ndim != 4 or levels.shape[1:3] != (36, 32):
        raise ValueError(f"levels must be (F, 36, 32, ch), got {levels.shape}")
    F, _, _, ch = levels.shape
    if F == 0:
        raise ValueError("need at least one frame of levels")
    if ch not in (1, 2):
        raise ValueError(f"Layer II supports 1 or 2 channels, got {ch}")
    if scf_idx.shape != (F, 3, 32, ch):
        raise ValueError("scf_idx must be (F, 3, 32, ch)")
    if alloc_codes.shape != (32,):
        raise ValueError("alloc_codes must be (32,)")
    if np.any((scf_idx < 0) | (scf_idx > 62)):
        raise ValueError("scalefactor index out of range 0..62")
    if protection not in (0, 1):
        raise ValueError("protection must be 0 (CRC present) or 1")
    try:
        sf_index = _MPEG1_SAMPLE_RATES.index(sample_rate)
    except ValueError:
        raise ValueError(f"unsupported MPEG-1 sample rate {sample_rate}")

    def _layout(table: str):
        rows = _L2_TABLES[table]
        sblimit = len(rows)
        if np.any(alloc_codes[sblimit:] != 0):
            return None  # allocation outside this table's sblimit
        per_sb = []
        for sb in range(sblimit):
            code = int(alloc_codes[sb])
            row = rows[sb]
            if not 0 <= code < len(row):
                return None
            per_sb.append(row[code])
        return sblimit, per_sb

    # No slot-integrality filter (unlike Layer I): Layer II slots are
    # bytes and BOTH sides floor-divide 144*b*1000/fs, so a padding-0
    # stream at 44.1 kHz is consistent even though no bitrate divides
    # evenly there (real encoders alternate the padding bit to hold
    # the nominal average rate; a constant-0 stream is spec-decodable).
    mode_legal = [
        b
        for b in _MPEG1_L2_BITRATES[1:]
        if not (ch == 1 and b in _L2_NO_MONO)
        and not (ch == 2 and b in _L2_MONO_ONLY)
    ]
    if bitrate_kbps is not None:
        if bitrate_kbps not in mode_legal:
            raise ValueError(
                f"bitrate {bitrate_kbps} kbps illegal for {ch}ch at "
                f"{sample_rate} Hz (or not slot-integral)"
            )
        candidates = [bitrate_kbps]
    else:
        candidates = mode_legal

    chosen = None
    for b in candidates:
        lay = _layout(_mpeg2_table_for(sample_rate, b, ch))
        if lay is None:
            continue
        sblimit, per_sb = lay
        active = [sb for sb in range(sblimit) if per_sb[sb]]
        # fit check with the ACTUAL per-frame scalefactor cost (scfsi
        # patterns derived from part equalities, same rule as the pack)
        tab_rows = _L2_TABLES[_mpeg2_table_for(sample_rate, b, ch)]
        nbal_sum = sum((len(row) - 1).bit_length() for row in tab_rows)
        bits_fixed = 32 + (16 if protection == 0 else 0) + ch * nbal_sum
        bits_frames = []
        for f in range(F):
            bits = bits_fixed
            for sb in active:
                for c in range(ch):
                    bits += 2  # scfsi
                    s0, s1, s2 = (int(scf_idx[f, p, sb, c]) for p in range(3))
                    bits += 6 * (1 if s0 == s1 == s2 else (2 if s0 == s1 or s1 == s2 else 3))
            for sb in active:
                sbits, _g = _l2_sample_bits(per_sb[sb])
                bits += 12 * sbits * ch
            bits_frames.append(bits)
        slots = _mpeg2_frame_slots(b, sample_rate, 0)
        if max(bits_frames) <= slots * 8:
            chosen = (b, sblimit, per_sb, active, slots)
            break
    if chosen is None:
        raise ValueError(
            "no legal Layer II bitrate fits the requested allocation "
            f"(candidates {candidates})"
        )
    b, sblimit, per_sb, active, slots = chosen
    bi = _MPEG1_L2_BITRATES.index(b)
    table = _mpeg2_table_for(sample_rate, b, ch)
    rows = _L2_TABLES[table]

    # level range check against each subband's class
    for sb in range(sblimit):
        L = per_sb[sb]
        if L:
            if np.any(np.abs(levels[:, :, sb, :]) > L // 2):
                raise ValueError(
                    f"level exceeds the {L}-step class at subband {sb}"
                )
        elif np.any(levels[:, :, sb, :]):
            raise ValueError(f"nonzero level in silent subband {sb}")
    if np.any(levels[:, :, sblimit:, :]):
        raise ValueError("nonzero level above the table's sblimit")

    mode = 0b11 if ch == 1 else 0b00
    out = bytearray()
    for f in range(F):
        w = _MSBWriter()
        w.write(0xFFF, 12)
        w.write(1, 1)  # ID: MPEG-1
        w.write(0b10, 2)  # layer II
        w.write(protection, 1)
        hdr_tail = [
            (bi, 4), (sf_index, 2), (0, 1), (0, 1), (mode, 2),
            (0, 2), (0, 1), (1, 1), (0, 2),
        ]
        alloc_fields = []
        for sb in range(sblimit):
            nbal = (len(rows[sb]) - 1).bit_length()
            for c in range(ch):
                alloc_fields.append((int(alloc_codes[sb]), nbal))
        scfsi_fields = []
        scf_tx: list[tuple[int, int]] = []
        for sb in active:
            for c in range(ch):
                s0, s1, s2 = (int(scf_idx[f, p, sb, c]) for p in range(3))
                if s0 == s1 == s2:
                    scfsi, tx = 2, [s0]
                elif s0 == s1:
                    scfsi, tx = 1, [s0, s2]
                elif s1 == s2:
                    scfsi, tx = 3, [s0, s1]
                else:
                    scfsi, tx = 0, [s0, s1, s2]
                scfsi_fields.append((scfsi, 2))
                scf_tx.extend((t, 6) for t in tx)
        for v, width in hdr_tail:
            w.write(v, width)
        if protection == 0:
            w.write(_mpeg_crc16(hdr_tail + alloc_fields + scfsi_fields), 16)
        for v, width in alloc_fields + scfsi_fields + scf_tx:
            w.write(v, width)
        for gr in range(12):
            for sb in active:
                L = per_sb[sb]
                gbits, grouped = _l2_sample_bits(L)
                for c in range(ch):
                    v3 = levels[f, 3 * gr : 3 * gr + 3, sb, c] + L // 2
                    if grouped:
                        w.write(
                            int(v3[0]) + L * int(v3[1]) + L * L * int(v3[2]),
                            gbits,
                        )
                    else:
                        nb = gbits // 3
                        for s in v3:
                            w.write(int(s), nb)
        w.align()
        frame = w.bytes()
        if len(frame) > slots:
            raise ValueError("frame overflow")  # pragma: no cover - guarded
        out += frame + b"\x00" * (slots - len(frame))
    return bytes(out)


def decode_mpeg2_levels(payload: bytes):
    """MPEG-1 Layer II -> (meta, levels (F, 36, 32, ch) int32,
    scf_idx (F, 3, 32, ch) uint8 — one Table B.1 index per frame
    PART, scfsi-expanded — and steps (F, 32, ch) int32, the B.2 step
    count per subband, 0 = silent). Level v recovers from code c as
    v = c - steps//2 (see the section comment: the spec's C/D
    requantization is 2v/steps for every Table B.4 class). Ungrouped
    all-ones codes are forbidden; grouped codewords must stay below
    steps^3. Malformed frames raise ValueError; Layer III raises
    NotImplementedError (with AAC, the remaining perceptual swap
    point). Intensity/joint stereo (mode 01) is NotImplementedError —
    the subband-sharing mode needs bound handling this corpus never
    produces."""
    b = bytes(payload)
    if len(b) < 4:
        raise ValueError("truncated MPEG audio payload")
    pos = 0
    frames = []
    meta: dict = {}
    while pos < len(b):
        if pos + 4 > len(b):
            raise ValueError("truncated MPEG frame header")
        r = _MSBReader(b, pos)
        if r.read(12) != 0xFFF:
            raise ValueError("bad MPEG sync word")
        if r.read(1) != 1:
            raise ValueError("not an MPEG-1 stream (ID bit 0)")
        layer = r.read(2)
        if layer != 0b10:
            if layer == 0:
                raise ValueError("reserved MPEG layer")
            raise ValueError(
                "decode_mpeg2_levels handles Layer II only "
                f"(stream is Layer {'I' if layer == 3 else 'III'})"
            )
        protection = r.read(1)
        bi = r.read(4)
        if bi == 0:
            raise NotImplementedError("free-format bitrate not supported")
        if bi == 15:
            raise ValueError("forbidden MPEG bitrate index")
        sf_i = r.read(2)
        if sf_i == 3:
            raise ValueError("reserved MPEG sample-rate index")
        padding = r.read(1)
        r.read(1)  # private
        mode = r.read(2)
        r.read(2 + 1 + 1 + 2)  # mode_ext, copyright, original, emphasis
        if mode == 0b01:
            raise NotImplementedError(
                "Layer II joint (intensity) stereo not supported"
            )
        ch = 1 if mode == 0b11 else 2
        rate = _MPEG1_SAMPLE_RATES[sf_i]
        kbps = _MPEG1_L2_BITRATES[bi]
        if ch == 1 and kbps in _L2_NO_MONO:
            raise ValueError(f"Layer II {kbps} kbps forbids mono (§2.4.2.3)")
        if ch == 2 and kbps in _L2_MONO_ONLY:
            raise ValueError(f"Layer II {kbps} kbps is mono-only (§2.4.2.3)")
        slots = _mpeg2_frame_slots(kbps, rate, padding)
        frame_end = pos + slots
        if frame_end > len(b):
            raise ValueError("truncated MPEG frame body")
        # The B.2 table follows THIS frame's header: each frame carries
        # its own bitrate index (mid-stream switches are spec-legal),
        # and a switch can change the table — e.g. 48 kbps/ch table c
        # -> 64 kbps/ch table a — which changes every allocation field
        # width. Parsing with frame 0's table would silently shift the
        # whole frame. meta describes frame 0 (like bitrate_kbps).
        table = _mpeg2_table_for(rate, kbps, ch)
        rows = _L2_TABLES[table]
        sblimit = len(rows)
        if meta:
            if (meta["sample_rate"], meta["channels"]) != (rate, ch):
                raise ValueError("MPEG stream parameters change mid-stream")
        else:
            meta = {
                "sample_rate": rate,
                "channels": ch,
                "bitrate_kbps": kbps,
                "layer": 2,
                "table": table,
                "sblimit": sblimit,
            }
        if protection == 0:
            r.read(16)  # crc_check word (consumed, not verified)
        steps = np.zeros((32, ch), dtype=np.int32)
        for sb in range(sblimit):
            row = rows[sb]
            nbal = (len(row) - 1).bit_length()
            for c in range(ch):
                steps[sb, c] = row[r.read(nbal)]
        scfsi = np.zeros((32, ch), dtype=np.uint8)
        for sb in range(sblimit):
            for c in range(ch):
                if steps[sb, c]:
                    scfsi[sb, c] = r.read(2)
        scf = np.zeros((3, 32, ch), dtype=np.uint8)
        for sb in range(sblimit):
            for c in range(ch):
                if not steps[sb, c]:
                    continue
                si = scfsi[sb, c]
                n_tx = 1 if si == 2 else (3 if si == 0 else 2)
                tx = []
                for _ in range(n_tx):
                    idx = r.read(6)
                    if idx == 63:
                        raise ValueError("forbidden scalefactor index 63")
                    tx.append(idx)
                if si == 0:
                    parts = tx
                elif si == 1:
                    parts = [tx[0], tx[0], tx[1]]
                elif si == 2:
                    parts = [tx[0], tx[0], tx[0]]
                else:
                    parts = [tx[0], tx[1], tx[1]]
                scf[:, sb, c] = parts
        # Sample section, vectorized like Layer I: every granule has
        # the identical (subband, channel) bit layout — grouped slots
        # are one gbits codeword, ungrouped slots 3 consecutive
        # nb-bit codes — so the frame's bits unpack once and each
        # distinct class becomes one gather.
        fields: list[tuple[int, int, int, int, bool]] = []
        goff = 0
        for sb in range(sblimit):
            for c in range(ch):
                L = int(steps[sb, c])
                if L:
                    sbits, grouped = _l2_sample_bits(L)
                    fields.append((sb, c, goff, L, grouped))
                    goff += sbits
        lev = np.zeros((36, 32, ch), dtype=np.int32)
        base = (r.pos - pos) * 8 + r.bit
        end_bit = base + 12 * goff
        if end_bit > slots * 8:
            raise ValueError("MPEG frame data overruns its slot length")
        if goff:
            bits = np.unpackbits(np.frombuffer(b, np.uint8, slots, pos))
            rows12 = base + goff * np.arange(12)  # (12,)
            by_class: dict[tuple[int, bool], list[tuple[int, int, int]]] = {}
            for sb, c, off, L, grouped in fields:
                by_class.setdefault((L, grouped), []).append((sb, c, off))
            for (L, grouped), flds in by_class.items():
                sbits, _ = _l2_sample_bits(L)
                offs = np.array([f[2] for f in flds])  # (k,)
                idx = (
                    rows12[:, None, None]
                    + offs[None, :, None]
                    + np.arange(sbits)[None, None, :]
                )
                w = 1 << np.arange(sbits - 1, -1, -1)
                codes = bits[idx] @ w  # (12, k)
                if grouped:
                    if np.any(codes >= L * L * L):
                        raise ValueError(
                            "Layer II grouped codeword out of range"
                        )
                    samples = np.stack(
                        [codes % L, (codes // L) % L, codes // (L * L)]
                    )  # (3, 12, k)
                else:
                    nb = sbits // 3
                    c3 = codes[None, :, :] >> np.array(
                        [2 * nb, nb, 0]
                    ).reshape(3, 1, 1)
                    samples = c3 & ((1 << nb) - 1)  # (3, 12, k)
                    if np.any(samples == (1 << nb) - 1):
                        raise ValueError("forbidden all-ones sample code")
                vals = (samples - L // 2).astype(np.int32)
                sbs = np.array([f[0] for f in flds])
                cs = np.array([f[1] for f in flds])
                # granule g, sample j -> row 3g + j
                gidx = (3 * np.arange(12)[None, :] + np.arange(3)[:, None])
                lev[gidx.reshape(-1)[:, None], sbs[None, :], cs[None, :]] = (
                    vals.reshape(36, -1)
                )
        frames.append((lev, scf, steps))
        pos = frame_end
    if not frames:
        raise ValueError("MPEG payload contains no frames")
    meta["n_frames"] = len(frames)
    levels = np.stack([f[0] for f in frames])
    scf_idx = np.stack([f[1] for f in frames])
    steps_all = np.stack([f[2] for f in frames])
    return meta, levels, scf_idx, steps_all


def decode_mpeg2_audio(payload: bytes):
    """MPEG-1 Layer II -> (meta, (n_samples, ch) int16 PCM): integer
    level decode, requantization s = scf * 2v/steps (the 2v/L form of
    every Table B.4 C/D class — see decode_mpeg2_levels), then the
    same polyphase synthesis Layer I uses (the filterbank is shared
    across layers by construction in the spec)."""
    meta, levels, scf_idx, steps = decode_mpeg2_levels(payload)
    F, _, _, ch = levels.shape
    scfv = np.asarray(_MPEG1_SCALEFACTORS)[scf_idx]  # (F, 3, 32, ch)
    # expand per-part scalefactors to per-sample rows: part p covers
    # samples 12p..12p+11
    scf_full = np.repeat(scfv, 12, axis=1)  # (F, 36, 32, ch)
    denom = np.where(steps > 0, steps, 1).astype(np.float64)
    s = (
        levels.astype(np.float64)
        * 2.0
        / denom[:, None, :, :]
        * scf_full
    )
    sb = s.reshape(F * 36, 32, ch)
    pcm = np.empty((F * 1152, ch), dtype=np.int16)
    for c in range(ch):
        y = mpeg1_synthesis(sb[:, :, c])
        pcm[:, c] = np.clip(
            np.rint(y * 32768.0), -32768, 32767
        ).astype(np.int16)
    meta["n_samples"] = F * 1152
    meta["bits"] = 16
    return meta, pcm


def decode_mpeg_audio(payload: bytes):
    """Layer-dispatching MPEG-1 audio decode: peeks the first frame
    header's layer bits and routes to the Layer I or Layer II
    decoder. Layer III (with AAC) remains THE perceptual-audio swap
    point — the header machinery is shared, the hybrid MDCT +
    Huffman stage is not implemented here."""
    b = bytes(payload)
    if len(b) < 4:
        raise ValueError("truncated MPEG audio payload")
    if b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        raise ValueError("bad MPEG sync word")
    layer = (b[1] >> 1) & 0b11
    if layer == 0b11:
        return decode_mpeg1_audio(b)
    if layer == 0b10:
        return decode_mpeg2_audio(b)
    if layer == 0b01:
        raise NotImplementedError(
            "MPEG-1 Layer III is the documented perceptual-codec swap "
            "point (hybrid MDCT + Huffman); Layers I/II decode here"
        )
    raise ValueError("reserved MPEG layer")
