"""Property tests for the pure-python codecs (operators/codecs.py):
round-trip identities over Hypothesis-generated inputs — the codec
twin of the engine's Hypothesis gates (union-find vs large-star,
BPE python-reference). No Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from azure_iot_realtime_data_pipeline_spark.operators import codecs


@st.composite
def _images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    c = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(img=_images(), filter_type=st.integers(0, 4))
def test_png_roundtrip_property(img, filter_type):
    out = codecs.decode_png(codecs.encode_png(img, filter_type=filter_type))
    assert np.array_equal(out, img)


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=4096),
    min_code_size=st.integers(2, 8),
)
def test_gif_lzw_roundtrip_property(data, min_code_size):
    # LZW roots cover 2^min_code_size symbols: clamp bytes into range
    cap = (1 << min_code_size) - 1
    data = bytes(b & cap for b in data)
    assert codecs._lzw_decode(
        codecs._lzw_encode(data, min_code_size), min_code_size
    ) == data


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), blocks=st.integers(1, 12))
def test_jpeg_constant_blocks_exact_property(seed, blocks):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(1, blocks), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    out = codecs.decode_jpeg(codecs.encode_jpeg_baseline(img, quant=8))
    assert np.array_equal(out[:, :, 0], img)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 64))
def test_y4m_roundtrip_property(seed, n):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(4, 6), dtype=np.uint8) for _ in range(n)
    ]
    meta, back = codecs.decode_y4m(codecs.encode_y4m(frames))
    assert meta["n_frames"] == n
    assert all(back[i] == frames[i].tobytes() for i in range(n))


@settings(max_examples=200, deadline=None)
@given(code=st.integers(0, 255))
def test_g711_monotone_magnitude_property(code):
    """Within one sign half, clearing magnitude bits never increases
    the decoded magnitude (companding is monotone per segment)."""
    u = codecs.ulaw_to_linear(np.array([code], dtype=np.uint8))[0]
    a = codecs.alaw_to_linear(np.array([code], dtype=np.uint8))[0]
    assert -32768 <= int(u) <= 32767
    assert -32768 <= int(a) <= 32767


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), k=st.integers(1, 16))
def test_ima_adpcm_bounded_error_property(seed, k):
    """Encode->decode error of a smooth signal stays bounded by the
    largest step the encoder visits (the ADPCM contract)."""
    rng = np.random.default_rng(seed)
    n = 1 + 8 * k
    wave = np.cumsum(rng.integers(-300, 301, size=n)).astype(np.int32)
    wave = np.clip(wave, -30000, 30000)
    block, _ = codecs.ima_adpcm_encode_block(wave, index=32)
    dec = codecs.ima_adpcm_decode_block(block, 1)[:, 0]
    assert int(np.abs(dec - wave).max()) <= 2000


def test_png_zero_dims_rejected():
    import struct

    ihdr = struct.pack(">IIBBBBB", 0, 4, 8, 0, 0, 0, 0)
    payload = (
        codecs.PNG_SIGNATURE
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="dimensions"):
        codecs.decode_png(payload)


def _assert_quarantine_only(decode, payload, mutations=400, seed=0):
    """Mutate/truncate a valid payload; every failure must be the
    quarantine contract's ValueError (or NotImplementedError for
    valid-but-unsupported variants) — never struct.error, IndexError,
    zlib.error, KeyError or an internal exception type."""
    rng = np.random.default_rng(seed)
    ok = (ValueError, NotImplementedError)
    for _ in range(mutations):
        buf = bytearray(payload)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        try:
            decode(bytes(buf))
        except ok:
            pass
    for cut in range(1, len(payload), max(1, len(payload) // 120)):
        try:
            decode(payload[:cut])
        except ok:
            pass


def test_decoder_fuzz_quarantine_contract():
    """The malformed-input contract, fuzz-enforced for every decoder:
    single-byte mutations and truncation sweeps over valid payloads
    must raise only ValueError/NotImplementedError (the classes the
    Arrow-UDF quarantine path catches)."""
    rng = np.random.default_rng(42)
    gray = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(10, 11, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)

    _assert_quarantine_only(codecs.decode_png, codecs.encode_png(gray), seed=1)
    _assert_quarantine_only(
        codecs.decode_png, codecs.encode_png(gray, interlace=True), seed=11
    )
    _assert_quarantine_only(
        codecs.decode_jpeg, codecs.encode_jpeg_baseline(rgb, quant=1), seed=2
    )
    _assert_quarantine_only(
        codecs.decode_jpeg,
        codecs.encode_jpeg_progressive(gray, quant=1),
        seed=3,
    )
    _assert_quarantine_only(
        codecs.decode_gif, codecs.encode_gif(gray, pal), seed=4
    )
    _assert_quarantine_only(
        codecs.decode_y4m,
        codecs.encode_y4m([gray[:8, :8], gray[8:16, :8]]),
        seed=5,
    )
    warc = codecs.build_warc_records(
        [
            {"headers": {"WARC-Type": "response"}, "body": b"abc" * 40},
            {"headers": {"WARC-Type": "warcinfo"}, "body": b"x: y"},
        ],
        gzip_members=True,
    )
    _assert_quarantine_only(codecs.parse_warc, warc, seed=6)


def test_gif_lzw_table_reset_roundtrip_large():
    """The 12-bit table cap (ADVICE r10): high-entropy input long
    enough that next_code reaches 4096, forcing the encoder's CLEAR/
    reset and the decoder's deferred-assignment stop — unreachable by
    the bounded property cases above."""
    import numpy as np

    rng = np.random.default_rng(4096)
    data = rng.integers(0, 256, size=24_000, dtype=np.uint8).tobytes()
    enc = codecs._lzw_encode(data, 8)
    assert codecs._lzw_decode(enc, 8) == data
    # and with a smaller root alphabet (more phrases per byte, so the
    # cap is hit earlier and more than once)
    data4 = (np.frombuffer(data, np.uint8) & 15).tobytes()
    assert codecs._lzw_decode(codecs._lzw_encode(data4, 4), 4) == data4


@given(
    img=st.integers(0, 2**32 - 1).map(
        lambda seed: __import__("numpy").random.default_rng(seed).integers(
            0, 256,
            size=(
                1 + seed % 19,
                1 + (seed >> 5) % 23,
                (1, 2, 3, 4)[(seed >> 10) % 4],
            ),
            dtype="uint8",
        )
    ),
    filter_type=st.integers(0, 4),
)
@settings(max_examples=40, deadline=None)
def test_png_adam7_roundtrip_property(img, filter_type):
    """Adam7 interlace (r11): encode -> decode is the identity across
    arbitrary dims (incl. dims < 8, where some of the seven passes are
    EMPTY and must contribute zero bytes), every channel count and
    every filter type — and the interlaced stream decodes to exactly
    what the non-interlaced stream decodes to."""
    import numpy as np

    inter = codecs.decode_png(
        codecs.encode_png(img, filter_type=filter_type, interlace=True)
    )
    plain = codecs.decode_png(
        codecs.encode_png(img, filter_type=filter_type)
    )
    assert np.array_equal(inter, plain)
    assert np.array_equal(inter, img)


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_flac_roundtrip_property(seed):
    """FLAC (RFC 9639, r11): encode -> decode is the identity across
    random 16-bit content, every stereo decorrelation mode, rice
    partition orders, LPC on/off, and block sizes that exercise both
    the natural header codes and the 16-bit explicit field — with the
    CRC-8/CRC-16/MD5 integrity chain verified on every decode."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 700))
    channels = int(rng.integers(1, 3))
    shape = (n,) if channels == 1 else (n, 2)
    x = rng.integers(-(2**15), 2**15, size=shape, dtype=np.int64)
    mode = (
        "independent"
        if channels == 1
        else ("independent", "left-side", "right-side", "mid-side")[
            int(rng.integers(0, 4))
        ]
    )
    payload = codecs.encode_flac(
        x,
        block_size=int(rng.integers(1, 400)),
        stereo_mode=mode,
        partition_order=int(rng.integers(0, 4)),
        lpc_order=int(rng.integers(0, 9)),
    )
    meta, out = codecs.decode_flac(payload)
    assert meta["bits"] == 16 and meta["channels"] == channels
    assert np.array_equal(out, x.reshape(n, channels))


def test_flac_fuzz_quarantine():
    """The quarantine contract for the FLAC decoder: mutations and
    truncations of a valid stream raise only ValueError — the CRC-8 /
    CRC-16 / MD5 chain turns silent corruption into loud rejection."""
    import numpy as np

    rng = np.random.default_rng(9)
    x = rng.integers(-3000, 3000, size=(400, 2), dtype=np.int64)
    payload = codecs.encode_flac(
        x, stereo_mode="mid-side", block_size=192, partition_order=2
    )
    _assert_quarantine_only(codecs.decode_flac, payload, seed=12)


@given(seed=st.integers(0, 2**32 - 1), filter_type=st.integers(0, 4))
@settings(max_examples=30, deadline=None)
def test_png_16bit_roundtrip_property(seed, filter_type):
    """16-bit PNG (r11): the byte-lane filters at doubled bpp + the
    big-endian pair combine round-trip exactly, plain and Adam7, for
    every channel count — and the dtype contract holds (uint16 in,
    uint16 out; uint8 stays uint8)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(1, 16)), int(rng.integers(1, 16))
    c = int(rng.integers(1, 5))
    img = rng.integers(0, 65536, size=(h, w, c), dtype=np.uint16)
    for interlace in (False, True):
        out = codecs.decode_png(
            codecs.encode_png(img, filter_type=filter_type, interlace=interlace)
        )
        assert out.dtype == np.uint16
        assert np.array_equal(out, img)


def test_gif_anim_fuzz_quarantine():
    """Quarantine contract for the animated-GIF walker: mutations and
    truncations raise only ValueError/NotImplementedError."""
    import numpy as np

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    frames = [
        {"idx": rng.integers(0, 64, size=(6, 9), dtype=np.uint8),
         "top": 2, "left": 1, "disposal": d, "transparent": 3}
        for d in (0, 1, 2, 3)
    ]
    payload = codecs.encode_gif_anim(frames, pal, screen=(12, 10))
    _assert_quarantine_only(codecs.decode_gif_frames, payload, seed=22)


def test_apng_fuzz_quarantine():
    """Quarantine contract for the APNG walker: mutations and
    truncations raise only ValueError/NotImplementedError (chunk CRCs,
    sequence numbers, length checks and the zlib guard do the work)."""
    import numpy as np

    rng = np.random.default_rng(31)
    base = rng.integers(0, 256, size=(8, 9, 2), dtype=np.uint8)
    patch = rng.integers(0, 256, size=(3, 4, 2), dtype=np.uint8)
    payload = codecs.encode_apng(
        [
            {"img": base, "dispose": 1},
            {"img": patch, "x": 2, "y": 2, "blend": 1, "dispose": 2},
        ],
        canvas_size=(9, 8),
    )
    _assert_quarantine_only(codecs.decode_apng_frames, payload, seed=32)


def test_avi_fuzz_quarantine():
    """Quarantine contract for the AVI walker + per-frame JPEG decode
    chain: mutations/truncations raise only ValueError or the
    NotImplementedError swap-point signal."""
    import numpy as np

    rng = np.random.default_rng(41)
    img = np.repeat(
        np.repeat(rng.integers(0, 256, size=(2, 2), dtype=np.uint8), 8, 0),
        8, 1,
    )
    payload = codecs.build_avi_mjpeg(
        [codecs.encode_jpeg_baseline(img, quant=8)] * 2, 16, 16
    )

    def walk_and_decode(b: bytes):
        _m, frames = codecs.parse_avi_mjpeg(b)
        for f in frames:
            codecs.decode_jpeg(f)

    _assert_quarantine_only(walk_and_decode, payload, seed=42)


def test_hostile_header_dims_raise_not_oom():
    """ADVICE r11 (medium): a tiny payload declaring a huge canvas
    (e.g. 65535x65535 GIF logical screen ~ 12 GB RGB) must raise the
    quarantine ValueError BEFORE any allocation sized from the header
    — never MemoryError/OOM inside an Arrow UDF. Covers every decoder
    that allocates from header-declared dims: GIF (first-frame and
    animated walks), PNG/APNG IHDR, and the JPEG SOF planes."""
    import struct

    huge_gif = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
    with pytest.raises(ValueError, match="quarantine cap"):
        codecs.decode_gif(huge_gif)
    with pytest.raises(ValueError, match="quarantine cap"):
        codecs.decode_gif_frames(huge_gif)

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 6, 0, 0, 1)
    huge_png = (
        codecs.PNG_SIGNATURE
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", b"\x78\x9c\x03\x00\x00\x00\x00\x01")
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="quarantine cap"):
        codecs.decode_png(huge_png)
    with pytest.raises(ValueError, match="quarantine cap"):
        codecs.decode_apng_frames(huge_png)

    huge_apng = (
        codecs.PNG_SIGNATURE
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"acTL", struct.pack(">II", 1, 0))
        + codecs._png_chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", 0, 60000, 60000, 0, 0, 1, 100, 0, 0),
        )
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="quarantine cap"):
        codecs.decode_apng_frames(huge_apng)

    # SOF segment: length(2) + precision(1) + h(2) + w(2) + nc(1) + comp(3)
    sof_body = struct.pack(">BHHB", 8, 65500, 65500, 1) + bytes([1, 0x11, 0])
    huge_jpeg = (
        b"\xff\xd8\xff\xc0"
        + struct.pack(">H", len(sof_body) + 2)
        + sof_body
    )
    with pytest.raises(ValueError, match="quarantine cap"):
        codecs.decode_jpeg(huge_jpeg)


def test_gif_background_fill_uses_global_table():
    """ADVICE r11: the GIF background color index refers to the GLOBAL
    color table; an offset first frame carrying a LOCAL palette must
    composite onto gct[bg], not local[bg]."""
    import struct

    gct = np.array([[10, 20, 30], [200, 0, 0]], dtype=np.uint8)
    local = np.array([[0, 0, 0], [0, 255, 0]], dtype=np.uint8)
    # 4x4 screen, bg index 0, 2-entry GCT (depth 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0, 0, 0)
    out += gct.tobytes()
    # 2x2 frame at (1,1) with a LOCAL 2-entry table
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80 | 0)
    out += local.tobytes()
    lzw = codecs._lzw_encode(bytes([1, 1, 1, 1]), 2)
    out += bytes([2, len(lzw)]) + lzw + b"\x00\x3b"
    img = codecs.decode_gif(bytes(out))
    assert img.shape == (4, 4, 3)
    assert np.array_equal(img[0, 0], gct[0])  # global bg, NOT local[0]
    assert np.array_equal(img[1, 1], local[1])  # frame pixels stay local
    meta, frames = codecs.decode_gif_frames(bytes(out))
    assert np.array_equal(frames[0][0, 0], gct[0])
    assert np.array_equal(frames[0], img)  # first frames agree


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_flac_best_rice_is_exact_argmin(seed):
    """ADVICE r11: the rice-parameter search must return the true
    argmin even on skewed/plateauing residual distributions (the old
    cost > 2*best break could exit early). Brute-force every k."""
    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:
        zig = rng.integers(0, 1 << 20, size=64, dtype=np.int64)
    elif kind == 1:  # heavy skew: mostly tiny, a few enormous
        zig = rng.integers(0, 4, size=64, dtype=np.int64)
        zig[rng.integers(0, 64, size=3)] = np.int64(1) << 40
    else:
        zig = np.zeros(64, dtype=np.int64)
    k, cost = codecs._flac_best_rice(zig)
    n = len(zig)
    brute = min(
        (int((zig >> kk).sum()) + n * (kk + 1), kk) for kk in range(31)
    )
    assert (cost, k) == brute


def test_encode_png_rejects_non_uint_dtypes():
    """ADVICE r11: int32/int16 grids with values >255 must fail loudly
    instead of wrapping through a silent uint8 cast."""
    bad = np.full((4, 4, 1), 300, dtype=np.int32)
    with pytest.raises(ValueError, match="uint8 or uint16"):
        codecs.encode_png(bad)
    with pytest.raises(ValueError, match="uint8 or uint16"):
        codecs.encode_png(np.zeros((4, 4, 1), dtype=np.int16))
    # the two legitimate dtypes still round-trip
    ok8 = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(ok8)), ok8)
    ok16 = (np.arange(16, dtype=np.uint16) * 4000).reshape(4, 4, 1)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(ok16)), ok16)


def test_flac_rice_sequential_fallback_matches_cache(monkeypatch):
    """Payloads above _RICE_CACHE_CAP decode through the O(1)-memory
    sequential rice reader instead of the whole-payload bit cache
    (ADVICE r12: the cache is ~8x payload for the bit array plus 8 B
    per set bit — an Arrow-worker OOM vector on a hostile payload).
    Forcing the cap to zero must not change a single sample."""
    import numpy as np

    rng = np.random.default_rng(77)
    x = rng.integers(-(2**14), 2**14, size=(500, 2), dtype=np.int64)
    payload = codecs.encode_flac(
        x, stereo_mode="left-side", block_size=192,
        partition_order=2, lpc_order=4,
    )
    meta_c, out_c = codecs.decode_flac(payload)
    monkeypatch.setattr(codecs, "_RICE_CACHE_CAP", 0)
    meta_s, out_s = codecs.decode_flac(payload)
    assert np.array_equal(out_c, out_s)
    assert meta_c["sample_rate"] == meta_s["sample_rate"]


def test_flac_rice_ones_cache_is_compact_array():
    """The 1-position cache must stay an int64 ndarray (8 B/entry),
    never a Python int list (~28 B/entry + per-object churn): the
    residual reader must not call .tolist() on the flatnonzero result,
    and a decode through a shared reader leaves ndarray caches."""
    import inspect

    import numpy as np

    src = inspect.getsource(codecs._flac_read_residual)
    assert ".tolist()" not in src
    rng = np.random.default_rng(5)
    x = rng.integers(-3000, 3000, size=300, dtype=np.int64)
    payload = codecs.encode_flac(x, block_size=256, partition_order=1)
    r = codecs._MSBReader(bytes(payload))
    # position the shared cache the way decode_flac does, then decode
    meta, out = codecs.decode_flac(payload)
    assert np.array_equal(out[:, 0], x)
    # and the cache the residual walk builds is the compact form
    r2 = codecs._MSBReader(bytes(payload))
    r2.bits = None
    # simulate one cache fill exactly as the walk performs it
    r2.bits = np.unpackbits(np.frombuffer(r2.b, np.uint8))
    r2.ones = np.flatnonzero(r2.bits)
    assert isinstance(r2.ones, np.ndarray) and r2.ones.dtype == np.int64
