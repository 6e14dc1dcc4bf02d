"""Property-based FLAC codec contract: ANY int16 PCM stream — any
length (including shorter than one block), channel count, block size,
and signal character (constant runs, polynomial ramps forcing each
fixed predictor order, uniform noise forcing verbatim) — round-trips
byte-exactly through the real stream (STREAMINFO + MD5, CRC-8'd frame
headers, CRC-16 footers, Rice partitions, stereo decorrelation).
Hypothesis explores the corner space (1-sample streams, block sizes
off the spec's common-size table so the 8/16-bit end-of-header
encodings engage, frames where mid/side vs independent flips) that
example-based tests sample."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.multimodal import flac_decode, flac_encode


@st.composite
def pcm_streams(draw):
    n = draw(st.integers(1, 1500))
    ch = draw(st.integers(1, 4))
    kind = draw(st.sampled_from(["noise", "ramp", "poly", "steps", "mixed"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    js = np.arange(n, dtype=np.int64)
    cols = []
    for c in range(ch):
        if kind == "noise":
            v = rng.randint(-32768, 32768, n)
        elif kind == "ramp":
            v = ((c + 1) * 17 * js + rng.randint(-1000, 1000)) % 65536 - 32768
        elif kind == "poly":
            v = (js**3 // 50 + c * js**2) % 65536 - 32768
        elif kind == "steps":
            v = np.repeat(
                rng.randint(-32768, 32768, max(1, n // 50)), 50
            )[:n]
            v = np.pad(v, (0, n - v.size), mode="edge")
        else:  # correlated channels exercise the side-channel paths
            base = rng.randint(-2000, 2000, n)
            v = base + rng.randint(-3, 4, n) * (c + 1)
        cols.append(v.astype(np.int64))
    pcm = np.stack(cols, axis=1).astype(np.int16)
    block_size = draw(st.sampled_from([192, 250, 256, 300, 576, 1024]))
    return pcm, block_size


@settings(max_examples=40, deadline=None)
@given(s=pcm_streams(), rate=st.sampled_from([8000, 11025, 44100]))
def test_flac_roundtrip_property(s, rate):
    pcm, block_size = s
    dec, drate = flac_decode(flac_encode(pcm, rate, block_size))
    assert drate == rate
    assert dec.dtype == np.int16 and dec.shape == pcm.shape
    assert np.array_equal(dec, pcm)


@settings(max_examples=25, deadline=None)
@given(
    bps=st.sampled_from([8, 24]),
    ch=st.integers(1, 2),
    n=st.integers(1, 900),
    kind=st.sampled_from(["sine", "noise", "ramp", "const"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_depth_roundtrip_property(bps, ch, n, kind, seed):
    # round 7: the 8- and 24-bit widths through the full pipeline —
    # STREAMINFO MD5 at the coded byte width, side channel at bps+1
    rng = np.random.RandomState(seed)
    scale = (1 << (bps - 1)) - 1
    t = np.arange(n)
    if kind == "sine":
        base = (np.sin(t / 5.0) * 0.8 * scale).astype(np.int64)
    elif kind == "noise":
        base = rng.randint(-scale, scale + 1, n)
    elif kind == "ramp":
        base = ((t * 13) % (2 * scale) - scale).astype(np.int64)
    else:
        base = np.full(n, scale // 3, dtype=np.int64)
    dtype = np.int8 if bps == 8 else np.int32
    cols = [base] + ([np.roll(base, 7)] if ch == 2 else [])
    sig = np.stack(cols, axis=1).astype(dtype)
    dec, rate = flac_decode(flac_encode(sig, bits_per_sample=bps))
    assert rate == 8000
    assert (dec.astype(np.int64) == sig.astype(np.int64)).all()
    assert dec.dtype == (np.int16 if bps <= 16 else np.int32)


def test_flac_depth_guards():
    import pytest as _pytest

    too_big = np.full((10, 1), 200, dtype=np.int32)
    with _pytest.raises(AssertionError, match="exceeds bit depth"):
        flac_encode(too_big, bits_per_sample=8)
    with _pytest.raises(AssertionError, match="coded widths"):
        flac_encode(np.zeros((10, 1), dtype=np.int16), bits_per_sample=14)


@settings(max_examples=12, deadline=None)
@given(
    bps=st.sampled_from([12, 20]),
    n=st.integers(1, 700),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_nonbyte_widths_roundtrip(bps, n, seed):
    # 12/20-bit: RFC 9639 / libFLAC define the MD5 PCM packing as
    # ceil(bps/8) LE sign-extended bytes per sample (12 -> 2 bytes,
    # 20 -> 3), so these widths carry and VERIFY a real digest like
    # the whole-byte ones (ADVICE r7 closed the unset-MD5 gate)
    import hashlib

    import pytest as _pytest

    rng = np.random.RandomState(seed)
    scale = (1 << (bps - 1)) - 1
    sig = np.stack(
        [rng.randint(-scale, scale + 1, n),
         rng.randint(-scale, scale + 1, n)], axis=1
    ).astype(np.int32)
    blob = flac_encode(sig, bits_per_sample=bps)
    # STREAMINFO MD5 (last 16 bytes of the 34-byte block at offset 8)
    # is set and matches the libFLAC packing
    md5_field = blob[8 + 18:8 + 34]
    assert md5_field != b"\x00" * 16
    nb = (bps + 7) // 8
    packed = bytearray()
    for frame in sig:
        for v in frame:
            packed += int(v).to_bytes(nb, "little", signed=True)
    assert md5_field == hashlib.md5(bytes(packed)).digest()
    dec, _ = flac_decode(blob)  # decoder verifies the digest too
    assert (dec.astype(np.int64) == sig.astype(np.int64)).all()
    # a corrupted digest must be CAUGHT at these widths now
    bad = blob[:8 + 18] + bytes(16) + blob[8 + 34:]
    dec2, _ = flac_decode(bad)  # all-zero = unset, skips verify
    assert (dec2.astype(np.int64) == sig.astype(np.int64)).all()
    flipped = bytearray(blob)
    flipped[8 + 18] ^= 0xFF
    if bytes(flipped[8 + 18:8 + 34]) != b"\x00" * 16:
        with _pytest.raises(ValueError, match="MD5"):
            flac_decode(bytes(flipped))
