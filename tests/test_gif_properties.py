"""Property-based GIF codec contract: ANY index raster under any
palette size, frame count, and interlace flag round-trips exactly
through the full GIF89a container (LZW sub-blocks, GCE, NETSCAPE
loop) — Hypothesis explores the corner space (1-pixel dims, dims
below the interlace pass grid, 2-entry palettes at the spec's
minimum-code-size floor, single vs multi frame) that example-based
tests sample. The raw LZW stream gets its own property: arbitrary
byte content at arbitrary alphabet widths, long enough to cross
code-size growth boundaries."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    gif_decode,
    gif_encode,
)


@st.composite
def animations(draw):
    h = draw(st.integers(1, 21))
    w = draw(st.integers(1, 21))
    n_frames = draw(st.integers(1, 4))
    n_colors = draw(st.sampled_from([2, 3, 16, 64, 256]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, n_colors, (h, w)).astype(np.uint8)
        for _ in range(n_frames)
    ]
    palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    return frames, palette


@settings(max_examples=40, deadline=None)
@given(anim=animations(), interlace=st.booleans())
def test_gif_roundtrip_property(anim, interlace):
    frames, palette = anim
    dec, pal, meta = gif_decode(gif_encode(frames, palette, interlace=interlace))
    assert dec.shape == (len(frames),) + frames[0].shape
    for f, src in enumerate(frames):
        assert (dec[f] == src).all()
        assert meta[f]["interlaced"] is interlace
    assert (pal[: palette.shape[0]] == palette).all()


@settings(max_examples=30, deadline=None)
@given(
    mcs=st.integers(2, 8),
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(0, 20000),
)
def test_gif_lzw_roundtrip_property(mcs, seed, n):
    rng = np.random.RandomState(seed)
    data = rng.randint(0, 1 << mcs, n).astype(np.uint8).tobytes()
    assert bytes(_gif_lzw_decode(_gif_lzw_encode(data, mcs), mcs)) == data
