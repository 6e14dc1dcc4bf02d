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
