"""MPEG-1 Audio Layer I (ISO/IEC 11172-3) codec tests: filterbank
reconstruction, lattice-exact level round-trips, spec requantization
identities, header/bitstream strictness, and the fuzz quarantine
contract. No Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from azure_iot_realtime_data_pipeline_spark.operators import codecs


def _snr(x: np.ndarray, y: np.ndarray, delay: int) -> float:
    ln = len(x) - delay
    ref = x[:ln].astype(np.float64)
    err = y[delay : delay + ln].astype(np.float64) - ref
    return 10 * np.log10(np.dot(ref, ref) / max(np.dot(err, err), 1e-300))


def test_filterbank_near_perfect_reconstruction():
    """The polyphase analysis+synthesis pair must reconstruct white
    noise at better than 70 dB (the shipped TDAC prototype measures
    ~76 dB; the spec's Table B.3 window would measure ~96 — the
    documented constant-table swap point) at the prototype's
    33-sample delay, with unit gain (self-calibrated) and positive
    polarity."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(32 * 200)
    y = codecs.mpeg1_synthesis(codecs.mpeg1_analysis(x))
    assert _snr(x, y, codecs.MPEG1_FILTERBANK_DELAY) > 70.0
    d = codecs.MPEG1_FILTERBANK_DELAY
    ln = len(x) - d
    gain = np.dot(y[d : d + ln], x[:ln]) / np.dot(x[:ln], x[:ln])
    assert abs(gain - 1.0) < 1e-3


def test_filterbank_subband_headroom():
    """Full-scale int16 input stays comfortably inside (-1, 1) in the
    subband domain — the encoder's quantizer range assumption."""
    rng = np.random.default_rng(12)
    x = rng.integers(-32768, 32768, size=32 * 100) / 32768.0
    assert np.abs(codecs.mpeg1_analysis(x)).max() < 0.9


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), nb=st.integers(2, 12))
def test_levels_roundtrip_exact(seed, nb):
    """build_mpeg1_layer1 -> decode_mpeg1_levels is INTEGER-EXACT for
    any legal (levels, scalefactors, allocation) — the lattice the
    hash-gated synthesis chain rides."""
    rng = np.random.default_rng(seed)
    F = int(rng.integers(1, 4))
    ch = int(rng.integers(1, 3))
    lim = (1 << (nb - 1)) - 1
    alloc = np.full(32, nb, dtype=np.int64)
    alloc[rng.integers(0, 32, size=8)] = 0  # some silent subbands
    if 12 * int(alloc.sum()) * ch + 32 * 4 * ch + 6 * ch * int(
        (alloc > 0).sum()
    ) + 32 > 4 * _max_slots(ch):
        alloc[:] = 0
        alloc[:8] = nb  # shrink to guaranteed-fit profile
    levels = rng.integers(-lim, lim + 1, size=(F, 12, 32, ch)).astype(np.int32)
    levels[:, :, alloc == 0, :] = 0
    scf = rng.integers(0, 63, size=(F, 32, ch)).astype(np.int64)
    payload = codecs.build_mpeg1_layer1(levels, scf, alloc, 32000)
    meta, lev2, scf2, al2 = codecs.decode_mpeg1_levels(payload)
    assert meta["n_frames"] == F and meta["channels"] == ch
    assert np.array_equal(lev2, levels)
    active = alloc > 0
    assert np.array_equal(scf2[:, active, :], scf[:, active, :].astype(np.uint8))
    assert np.all(al2[:, active, :] == alloc[active][None, :, None])


def _max_slots(ch: int) -> int:
    return 12 * 448000 // 32000


def test_requantization_matches_spec_form():
    """The lattice form s = scf * 2v/(2^nb - 1) must equal the spec
    2.4.3.3 form s = scf * (2^nb/(2^nb-1)) * (s''' + 2^(1-nb)) where
    s''' is the code with MSB inverted read as a two's-complement
    fraction — checked exhaustively for nb up to 10."""
    for nb in range(2, 11):
        for code in range(0, (1 << nb) - 1):  # all-ones forbidden
            signed = code - (1 << (nb - 1))  # MSB-invert + two's compl.
            s3 = signed / (1 << (nb - 1))
            spec = (2**nb / (2**nb - 1)) * (s3 + 2.0 ** (1 - nb))
            v = code - ((1 << (nb - 1)) - 1)
            lattice = 2.0 * v / ((1 << nb) - 1)
            assert abs(spec - lattice) < 1e-12


def test_scalefactor_table_matches_b1():
    """Table B.1: scf[idx] = 2 * 2^(-idx/3); indices divisible by 3
    are exact binary powers (the oracle anchor), index 63 forbidden."""
    scfs = codecs._MPEG1_SCALEFACTORS
    assert len(scfs) == 63
    assert scfs[0] == 2.0
    assert abs(scfs[1] - 1.5874010519682) < 1e-12
    for m in range(21):
        assert scfs[3 * m] == 2.0 ** (1 - m)


def test_pcm_roundtrip_snr_tracks_allocation():
    """encode -> decode PCM SNR must track the bit allocation: ~6 dB
    per extra bit, well above 55 dB at nb=11 and above 25 dB at
    nb=6 — and stereo channels stay independent."""
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((384 * 4, 1)) * 9000).astype(np.int16)
    d = codecs.MPEG1_FILTERBANK_DELAY
    _, y11 = codecs.decode_mpeg1_audio(codecs.encode_mpeg1_layer1(x, 32000, nb=11))
    _, y6 = codecs.decode_mpeg1_audio(codecs.encode_mpeg1_layer1(x, 32000, nb=6))
    snr11 = _snr(x[:, 0], y11[:, 0], d)
    snr6 = _snr(x[:, 0], y6[:, 0], d)
    assert snr11 > 55.0
    assert 25.0 < snr6 < snr11 - 20.0

    st_pcm = np.zeros((384 * 2, 2), dtype=np.int16)
    st_pcm[:, 0] = (rng.standard_normal(384 * 2) * 8000).astype(np.int16)
    meta, out = codecs.decode_mpeg1_audio(
        codecs.encode_mpeg1_layer1(st_pcm, 32000, nb=6)
    )
    assert meta["channels"] == 2
    assert _snr(st_pcm[:, 0], out[:, 0], d) > 25.0
    assert np.abs(out[:, 1]).max() <= 1  # silent channel stays silent


def test_header_fields_and_strictness():
    """Header round-trip (rate/bitrate/mode) plus the spec's
    forbidden patterns: bad sync, ID=0, reserved layer, bitrate 15,
    rate index 3, allocation 15, scalefactor 63, all-ones codes, and
    mid-stream parameter changes all raise; Layer II/III raise the
    NotImplementedError swap signal."""
    x = (np.arange(384, dtype=np.int16) * 13 % 8000)[:, None].astype(np.int16)
    good = bytearray(codecs.encode_mpeg1_layer1(x, 48000, nb=8))
    meta, _, _, _ = codecs.decode_mpeg1_levels(bytes(good))
    assert meta["sample_rate"] == 48000 and meta["layer"] == 1

    def mutated(byte0=None, byte1=None, byte2=None):
        b = bytearray(good)
        for i, v in ((0, byte0), (1, byte1), (2, byte2)):
            if v is not None:
                b[i] = v
        return bytes(b)

    with pytest.raises(ValueError, match="sync"):
        codecs.decode_mpeg1_levels(mutated(byte0=0x00))
    with pytest.raises(ValueError, match="ID bit"):
        codecs.decode_mpeg1_levels(mutated(byte1=(good[1] & ~0x08)))
    with pytest.raises(NotImplementedError, match="Layer"):
        codecs.decode_mpeg1_levels(mutated(byte1=(good[1] & ~0x06) | 0x04))
    with pytest.raises(ValueError, match="reserved MPEG layer"):
        codecs.decode_mpeg1_levels(mutated(byte1=good[1] & ~0x06))
    with pytest.raises(ValueError, match="bitrate"):
        codecs.decode_mpeg1_levels(mutated(byte2=(good[2] | 0xF0)))
    with pytest.raises(NotImplementedError, match="free-format"):
        codecs.decode_mpeg1_levels(mutated(byte2=(good[2] & 0x0F)))
    with pytest.raises(ValueError, match="sample-rate"):
        codecs.decode_mpeg1_levels(mutated(byte2=(good[2] | 0x0C)))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_mpeg1_levels(bytes(good[: len(good) // 2]))


def test_mpeg1_fuzz_quarantine():
    """Mutations/truncations of a valid Layer I stream raise only
    ValueError or the NotImplementedError swap signal — never
    IndexError/struct.error/KeyError (the same contract every codec
    in this module carries)."""
    rng = np.random.default_rng(21)
    x = (rng.standard_normal((384 * 2, 1)) * 6000).astype(np.int16)
    payload = codecs.encode_mpeg1_layer1(x, 32000, nb=9)
    ok = (ValueError, NotImplementedError)
    for _ in range(400):
        buf = bytearray(payload)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        try:
            codecs.decode_mpeg1_audio(bytes(buf))
        except ok:
            pass
    for cut in range(1, len(payload), max(1, len(payload) // 120)):
        try:
            codecs.decode_mpeg1_audio(payload[:cut])
        except ok:
            pass


def test_build_rejects_illegal_inputs():
    lim_levels = np.zeros((1, 12, 32, 1), dtype=np.int32)
    scf = np.zeros((1, 32, 1), dtype=np.int64)
    alloc = np.full(32, 8, dtype=np.int64)
    bad = lim_levels.copy()
    bad[0, 0, 0, 0] = 1 << 10  # exceeds 8-bit allocation
    with pytest.raises(ValueError, match="allocation"):
        codecs.build_mpeg1_layer1(bad, scf, alloc, 32000)
    with pytest.raises(ValueError, match="scalefactor"):
        codecs.build_mpeg1_layer1(lim_levels, scf + 63, alloc, 32000)
    with pytest.raises(ValueError, match="sample rate"):
        codecs.build_mpeg1_layer1(lim_levels, scf, alloc, 22050)
    with pytest.raises(ValueError, match="bits"):
        codecs.build_mpeg1_layer1(lim_levels, scf, np.full(32, 1), 32000)
    with pytest.raises(ValueError, match="slots"):
        codecs.build_mpeg1_layer1(
            np.zeros((1, 12, 32, 2), dtype=np.int32),
            np.zeros((1, 32, 2), dtype=np.int64),
            np.full(32, 15, dtype=np.int64),
            32000,
        )


def test_frame_data_must_fit_declared_slots():
    """A frame whose header declares too few slots for its own
    allocation must raise, not silently read into the next frame's
    bytes (two concatenated frames would otherwise decode garbage)."""
    x = (np.arange(384 * 2, dtype=np.int16) * 7 % 6000)[:, None].astype(
        np.int16
    )
    payload = bytearray(codecs.encode_mpeg1_layer1(x, 32000, nb=10))
    # first frame's bitrate index -> the smallest table entry (32 kbps:
    # 12 slots at 32 kHz, far below what a 10-bit allocation needs)
    payload[2] = (payload[2] & 0x0F) | 0x10
    with pytest.raises(ValueError, match="overruns|truncated"):
        codecs.decode_mpeg1_levels(bytes(payload))


def test_encoder_input_strictness():
    """Zero frames and float PCM both fail loudly (a [-1, 1) float
    array divided by 32768 would encode near-silence without error —
    the encode_png dtype-strictness convention applied here)."""
    with pytest.raises(ValueError, match="at least one frame"):
        codecs.build_mpeg1_layer1(
            np.zeros((0, 12, 32, 1), dtype=np.int32),
            np.zeros((0, 32, 1), dtype=np.int64),
            np.full(32, 8, dtype=np.int64),
            32000,
        )
    with pytest.raises(ValueError, match="integer"):
        codecs.encode_mpeg1_layer1(np.zeros(384, dtype=np.float64), 32000)


def test_crc_protected_frames_decode_identically():
    """protection_bit=0 inserts the spec's 16-bit crc_check word
    between header and allocation (§2.4.1.4/§2.4.3.1). The decoder
    must consume it — before the fix it read allocation/scalefactors
    16 bits early and decoded shifted garbage without erroring."""
    rng = np.random.default_rng(99)
    for ch in (1, 2):
        alloc = np.full(32, 6, dtype=np.int64)
        alloc[20:] = 0
        lim = (1 << 5) - 1
        levels = rng.integers(-lim, lim + 1, size=(2, 12, 32, ch)).astype(
            np.int32
        )
        levels[:, :, alloc == 0, :] = 0
        scf = rng.integers(0, 63, size=(2, 32, ch)).astype(np.int64)
        plain = codecs.build_mpeg1_layer1(levels, scf, alloc, 32000)
        prot = codecs.build_mpeg1_layer1(
            levels, scf, alloc, 32000, protection=0
        )
        assert prot != plain and (prot[1] & 1) == 0 and (plain[1] & 1) == 1
        m1, l1, s1, a1 = codecs.decode_mpeg1_levels(plain)
        m2, l2, s2, a2 = codecs.decode_mpeg1_levels(prot)
        assert np.array_equal(l1, l2) and np.array_equal(l1, levels)
        assert np.array_equal(s1, s2) and np.array_equal(a1, a2)
        assert m1["sample_rate"] == m2["sample_rate"]
        # the full PCM decode agrees too (and carries the bits key the
        # audio meta convention requires)
        meta_p, pcm_p = codecs.decode_mpeg1_audio(prot)
        meta_n, pcm_n = codecs.decode_mpeg1_audio(plain)
        assert meta_p["bits"] == meta_n["bits"] == 16
        assert np.array_equal(pcm_p, pcm_n)


def test_crc_word_is_spec_crc16():
    """The emitted crc_check is the genuine §2.4.3.1 CRC-16 (0x8005,
    init 0xFFFF) over the last 16 header bits + allocation fields —
    recomputed here from the packed bytes themselves."""
    alloc = np.full(32, 0, dtype=np.int64)
    alloc[:4] = 4
    levels = np.zeros((1, 12, 32, 1), dtype=np.int32)
    scf = np.zeros((1, 32, 1), dtype=np.int64)
    b = codecs.build_mpeg1_layer1(levels, scf, alloc, 32000, protection=0)
    stored = (b[4] << 8) | b[5]
    hdr_tail = ((b[2], 8), (b[3], 8))
    alloc_bytes = tuple((x, 8) for x in b[6 : 6 + 16])  # 32 fields, mono
    assert stored == codecs._mpeg_crc16(hdr_tail + alloc_bytes)


def test_decode_audio_mpeg_meta_contract():
    """multimodal.decode_audio routes MPEG sync to the Layer I decoder
    and the returned meta honors the sample_rate/channels/bits
    convention shared with WAV/FLAC (ADVICE r12: bits was missing,
    crashing audio_meta inside the Arrow UDF)."""
    from azure_iot_realtime_data_pipeline_spark.operators import multimodal

    x = (np.arange(384, dtype=np.int16) * 13 % 3000)[:, None].astype(np.int16)
    payload = codecs.encode_mpeg1_layer1(x, 32000, nb=8)
    meta, pcm = multimodal.decode_audio(payload)
    assert meta["bits"] == 16
    assert meta["sample_rate"] == 32000 and meta["channels"] == 1
    assert pcm.dtype == np.int32 and pcm.shape[0] == 384


# ---------------------------------------------------------------- Layer II


def _l2_random_frame(rng, ch, F, fs, table="a"):
    rows = codecs._L2_TABLES[table]
    sblimit = len(rows)
    alloc = np.zeros(32, dtype=np.int64)
    for sb in range(sblimit):
        if rng.random() < 0.3:
            alloc[sb] = int(rng.integers(1, len(rows[sb])))
    levels = np.zeros((F, 36, 32, ch), dtype=np.int32)
    for sb in range(sblimit):
        if alloc[sb]:
            L = rows[sb][alloc[sb]]
            levels[:, :, sb, :] = rng.integers(
                -(L // 2), L // 2 + 1, size=(F, 36, ch)
            )
    scf = rng.integers(0, 63, size=(F, 3, 32, ch)).astype(np.int64)
    # some equal parts so every scfsi pattern appears
    scf[:, 1] = np.where(rng.random(scf[:, 1].shape) < 0.5, scf[:, 0], scf[:, 1])
    scf[:, 2] = np.where(rng.random(scf[:, 2].shape) < 0.5, scf[:, 1], scf[:, 2])
    return levels, scf, alloc


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_layer2_levels_roundtrip_exact(seed):
    """build_mpeg1_layer2 -> decode_mpeg2_levels is INTEGER-EXACT for
    any legal (levels, scalefactor-parts, allocation codes) — across
    grouped (3/5/9-step) and ungrouped classes, every scfsi pattern,
    mono/stereo, all sample rates, CRC-protected frames included."""
    rng = np.random.default_rng(seed)
    ch = int(rng.integers(1, 3))
    F = int(rng.integers(1, 4))
    fs = (44100, 48000, 32000)[int(rng.integers(0, 3))]
    levels, scf, alloc = _l2_random_frame(rng, ch, F, fs)
    prot = int(rng.integers(0, 2))
    try:
        payload = codecs.build_mpeg1_layer2(
            levels, scf, alloc, fs, protection=prot
        )
    except ValueError as e:
        if "fits" in str(e):  # allocation too rich for the top bitrate
            return
        raise
    meta, lev2, scf2, steps2 = codecs.decode_mpeg2_levels(payload)
    assert meta["n_frames"] == F and meta["channels"] == ch
    assert meta["sample_rate"] == fs and meta["layer"] == 2
    assert np.array_equal(lev2, levels)
    rows = codecs._L2_TABLES[meta["table"]]
    for sb in range(meta["sblimit"]):
        want = rows[sb][int(alloc[sb])] if sb < 27 else 0
        assert np.all(steps2[:, sb, :] == want)
        if want:
            assert np.array_equal(
                scf2[:, :, sb, :], scf[:, :, sb, :].astype(np.uint8)
            )


def test_layer2_grouped_requantization_matches_spec_form():
    """Table B.4's C/D requantization s'' = C*(s''' + D) equals the
    integer form 2v/L for the GROUPED classes too (C = 2^ceil/L,
    D = 1/2, s''' = c/2^(nb-1) - 1): the algebra the oracle's
    integer lattice rides."""
    for L, nbits in ((3, 2), (5, 3), (9, 4)):
        C = (1 << nbits) / L
        D = 0.5
        for c in range(L):
            s3 = c / (1 << (nbits - 1)) - 1.0
            spec = C * (s3 + D)
            ours = 2.0 * (c - L // 2) / L
            assert abs(spec - ours) < 1e-12, (L, c)


def test_layer2_header_strictness_and_mode_legality():
    """Bitrate/mode combos §2.4.2.3 forbids raise; joint stereo and
    Layer III raise the documented NotImplementedError; the byte-slot
    frame length is enforced."""
    rng = np.random.default_rng(3)
    levels, scf, alloc = _l2_random_frame(rng, 1, 1, 48000)
    payload = bytearray(
        codecs.build_mpeg1_layer2(levels, scf, alloc, 48000)
    )
    # force bitrate index 14 (384 kbps): mono-forbidden
    payload[2] = (payload[2] & 0x0F) | 0xE0
    with pytest.raises(ValueError, match="forbids mono"):
        codecs.decode_mpeg2_levels(bytes(payload))
    # joint stereo: mode bits 01 in byte 3
    payload = bytearray(codecs.build_mpeg1_layer2(levels, scf, alloc, 48000))
    payload[3] = (payload[3] & 0x3F) | 0x40
    with pytest.raises(NotImplementedError, match="joint"):
        codecs.decode_mpeg2_levels(bytes(payload))
    # Layer III sync routes to the swap-point signal in the dispatcher
    l3 = bytearray(codecs.build_mpeg1_layer2(levels, scf, alloc, 48000))
    l3[1] = (l3[1] & 0xF9) | 0b010  # layer bits 01
    with pytest.raises(NotImplementedError, match="Layer III"):
        codecs.decode_mpeg_audio(bytes(l3))
    # truncated frame body
    full = codecs.build_mpeg1_layer2(levels, scf, alloc, 48000)
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_mpeg2_levels(full[: len(full) - 1])


def test_layer2_table_selection_follows_bitrate_per_channel():
    """§2.4.2.2: B.2c/d at 32-48 kbps/ch (d only at 32 kHz), B.2a at
    56-80, B.2a at 48 kHz above that, else B.2b."""
    f = codecs._mpeg2_table_for
    assert f(44100, 32, 1) == "c" and f(48000, 48, 1) == "c"
    assert f(32000, 32, 1) == "d" and f(32000, 96, 2) == "d"
    assert f(44100, 96, 2) == "c"
    assert f(44100, 64, 1) == "a" and f(48000, 160, 2) == "a"
    assert f(44100, 96, 1) == "b" and f(32000, 192, 1) == "b"
    assert f(48000, 192, 1) == "a"
    assert len(codecs._L2_TABLES["a"]) == 27
    assert len(codecs._L2_TABLES["b"]) == 30
    assert len(codecs._L2_TABLES["c"]) == 8
    assert len(codecs._L2_TABLES["d"]) == 12


def test_layer2_bitrate_switch_changes_table_mid_stream():
    """Each frame carries its own bitrate index (mid-stream switches
    are spec-legal), and a switch can change the B.2 table — 48 kbps
    mono at 48 kHz selects table c, 64 kbps selects table a — which
    changes every allocation field width and the sblimit. The decoder
    must parse each frame with ITS OWN header's table; parsing with
    frame 0's table would shift all following fields and decode
    garbage levels without erroring."""
    rng = np.random.default_rng(7)

    def frame_for(table, alloc, F):
        rows = codecs._L2_TABLES[table]
        levels = np.zeros((F, 36, 32, 1), dtype=np.int32)
        for sb in range(len(rows)):
            if alloc[sb]:
                L = rows[sb][alloc[sb]]
                levels[:, :, sb, :] = rng.integers(
                    -(L // 2), L // 2 + 1, size=(F, 36, 1)
                )
        scf = rng.integers(0, 63, size=(F, 3, 32, 1)).astype(np.int64)
        return levels, scf

    lo_alloc = np.zeros(32, dtype=np.int64)
    lo_alloc[0], lo_alloc[2] = 1, 1  # table c: ROW_E / ROW_F classes
    hi_alloc = np.zeros(32, dtype=np.int64)
    hi_alloc[0], hi_alloc[5], hi_alloc[26] = 2, 1, 1  # table a widths
    lo_levels, lo_scf = frame_for("c", lo_alloc, 2)
    hi_levels, hi_scf = frame_for("a", hi_alloc, 2)
    lo = codecs.build_mpeg1_layer2(
        lo_levels, lo_scf, lo_alloc, 48000, bitrate_kbps=48
    )
    hi = codecs.build_mpeg1_layer2(
        hi_levels, hi_scf, hi_alloc, 48000, bitrate_kbps=64
    )
    meta, lev, scf, steps = codecs.decode_mpeg2_levels(lo + hi)
    assert meta["n_frames"] == 4
    assert meta["table"] == "c" and meta["bitrate_kbps"] == 48  # frame 0
    assert np.array_equal(lev, np.concatenate([lo_levels, hi_levels]))
    _, _, _, st_hi = codecs.decode_mpeg2_levels(hi)
    assert np.array_equal(steps[2:], st_hi)
    want_scf = np.concatenate([lo_scf, hi_scf]).astype(np.uint8)
    active = steps > 0  # (F, 32, ch); scf is zeroed for silent subbands
    mask = np.broadcast_to(active[:, None, :, :], scf.shape)
    assert np.array_equal(scf[mask], want_scf[mask])


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_layer2_vbr_concat_matches_per_segment_decode(seed):
    """Property form of the bitrate-switch case: a stream whose
    segments carry different (spec-legal) bitrate indices — and
    therefore possibly different B.2 tables and sblimits — decodes
    segment-exactly, matching each segment's standalone decode."""
    rng = np.random.default_rng(seed)
    fs = (44100, 48000, 32000)[int(rng.integers(0, 3))]
    legal = [
        b
        for b in codecs._MPEG1_L2_BITRATES[1:]
        if b not in codecs._L2_NO_MONO
    ]
    segs = []
    for _ in range(int(rng.integers(2, 4))):
        b = int(legal[int(rng.integers(0, len(legal)))])
        table = codecs._mpeg2_table_for(fs, b, 1)
        rows = codecs._L2_TABLES[table]
        alloc = np.zeros(32, dtype=np.int64)
        for sb in range(len(rows)):
            if rng.random() < 0.25:
                alloc[sb] = int(rng.integers(1, min(len(rows[sb]), 6)))
        F = int(rng.integers(1, 3))
        levels = np.zeros((F, 36, 32, 1), dtype=np.int32)
        for sb in range(len(rows)):
            if alloc[sb]:
                L = rows[sb][alloc[sb]]
                levels[:, :, sb, :] = rng.integers(
                    -(L // 2), L // 2 + 1, size=(F, 36, 1)
                )
        scf = rng.integers(0, 63, size=(F, 3, 32, 1)).astype(np.int64)
        try:
            payload = codecs.build_mpeg1_layer2(
                levels, scf, alloc, fs, bitrate_kbps=b
            )
        except ValueError as e:
            if "fits" in str(e):  # allocation too rich for this bitrate
                continue
            raise
        segs.append((payload, levels))
    if len(segs) < 2:
        return
    stream = b"".join(p for p, _ in segs)
    meta, lev, _scf, steps = codecs.decode_mpeg2_levels(stream)
    assert meta["n_frames"] == sum(l.shape[0] for _, l in segs)
    assert np.array_equal(lev, np.concatenate([l for _, l in segs]))
    off = 0
    for p, l in segs:
        _, _, _, st = codecs.decode_mpeg2_levels(p)
        assert np.array_equal(steps[off : off + l.shape[0]], st)
        off += l.shape[0]


def test_layer2_crc_protected_roundtrip():
    """protection_bit=0 Layer II frames carry the crc_check word over
    header tail + allocation + scfsi; the decoder consumes it and
    levels roundtrip identically to the unprotected stream."""
    rng = np.random.default_rng(11)
    levels, scf, alloc = _l2_random_frame(rng, 2, 2, 44100)
    plain = codecs.build_mpeg1_layer2(levels, scf, alloc, 44100)
    prot = codecs.build_mpeg1_layer2(
        levels, scf, alloc, 44100, protection=0
    )
    assert (prot[1] & 1) == 0 and (plain[1] & 1) == 1
    _, l1, s1, a1 = codecs.decode_mpeg2_levels(plain)
    _, l2, s2, a2 = codecs.decode_mpeg2_levels(prot)
    assert np.array_equal(l1, l2)
    assert np.array_equal(s1, s2) and np.array_equal(a1, a2)


def test_layer2_fuzz_quarantine():
    """Mutations/truncations of a valid Layer II stream raise only
    ValueError or the NotImplementedError swap signal."""
    rng = np.random.default_rng(29)
    levels, scf, alloc = _l2_random_frame(rng, 1, 2, 48000)
    payload = codecs.build_mpeg1_layer2(levels, scf, alloc, 48000)
    ok = (ValueError, NotImplementedError)
    for _ in range(400):
        buf = bytearray(payload)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        try:
            codecs.decode_mpeg_audio(bytes(buf))
        except ok:
            pass
    for cut in range(1, len(payload), max(1, len(payload) // 120)):
        try:
            codecs.decode_mpeg_audio(payload[:cut])
        except ok:
            pass


def test_layer2_dispatcher_and_audio_meta():
    """decode_mpeg_audio routes by layer bits; Layer II PCM is
    1152 samples/frame with the shared meta convention, and
    multimodal.decode_audio accepts the stream."""
    from azure_iot_realtime_data_pipeline_spark.operators import multimodal

    rng = np.random.default_rng(17)
    levels, scf, alloc = _l2_random_frame(rng, 1, 3, 32000)
    payload = codecs.build_mpeg1_layer2(levels, scf, alloc, 32000)
    meta, pcm = codecs.decode_mpeg_audio(payload)
    assert meta["layer"] == 2 and meta["bits"] == 16
    assert pcm.shape == (3 * 1152, 1) and pcm.dtype == np.int16
    m2, pcm2 = multimodal.decode_audio(payload)
    assert m2["n_samples"] == 3 * 1152 and pcm2.dtype == np.int32


def test_layer2_throughput_tripwire():
    """Per-doc cost floor for the Layer II chain (same instrument as
    the FLAC/JPEG tripwires): a ~2300-char doc (2 frames, 5 ungrouped
    + 1 grouped subbands) must pack+decode well under the JPEG
    chains' documented per-doc cost. Loose bound — the tripwire
    catches order-of-magnitude regressions, BASELINE.md records the
    measured floor per round."""
    import time

    from azure_iot_realtime_data_pipeline_spark.operators import multimodal

    rng = np.random.default_rng(8)
    text = "".join(chr(int(c)) for c in rng.integers(32, 500, size=2304))
    docs_fn = multimodal.synth_mpeg2_from_text

    # drive the same `one` closure the operator uses, doc_id=1
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1], "text": [text]})
    # synth via the module-level pieces to stay off Spark
    from azure_iot_realtime_data_pipeline_spark.operators.codecs import (
        decode_mpeg2_levels,
        decode_mpeg_audio,
    )

    # one warm-up + 5 timed reps of the full chain
    def chain():
        payload = _l2_synth_one(1, text)
        decode_mpeg2_levels(payload)
        decode_mpeg_audio(payload)

    def _l2_synth_one(doc_id, t):
        # mirror synth_mpeg2_from_text's inner `one`
        import numpy as np
        from azure_iot_realtime_data_pipeline_spark.operators.codecs import (
            _L2_TABLES, build_mpeg1_layer2,
        )

        row_b = _L2_TABLES["a"][3]
        s = np.array([(ord(c) % 256) - 128 for c in t], dtype=np.int32)
        k = 4 + doc_id % 3
        L = (511, 1023, 2047)[doc_id % 3]
        F = max(1, -(-len(s) // (36 * k)))
        levels = np.zeros((F, 36, 32, 1), dtype=np.int32)
        scratch = np.zeros(F * 36 * k, dtype=np.int32)
        scratch[: len(s)] = s
        levels[:, :, 3 : 3 + k, 0] = scratch.reshape(F, 36, k)
        m = min(len(s), F * 36)
        g = np.zeros(F * 36, dtype=np.int32)
        g[:m] = np.array([(ord(c) % 3) - 1 for c in t[:m]], dtype=np.int32)
        levels[:, :, 23, 0] = g.reshape(F, 36)
        alloc = np.zeros(32, dtype=np.int64)
        alloc[3 : 3 + k] = row_b.index(L)
        alloc[23] = 1
        scf = np.zeros((F, 3, 32, 1), dtype=np.int64)
        scf[:, :, :, 0] = 6
        return build_mpeg1_layer2(levels, scf, alloc, 48000)

    chain()
    t0 = time.perf_counter()
    for _ in range(5):
        chain()
    per_doc_ms = (time.perf_counter() - t0) / 5 * 1000
    assert per_doc_ms < 80, f"Layer II chain {per_doc_ms:.1f} ms/doc"
