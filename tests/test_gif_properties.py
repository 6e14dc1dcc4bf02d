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


def test_local_palette_frame_never_composites_onto_global_canvas():
    # a frame with BOTH a local color table and a GCE transparent
    # index must stay out of the globally-indexed canvas (its indices
    # mean different colors) — it rides in meta only (ADVICE r6)
    import struct

    from bigdataflink_spark.operators.multimodal import _gif_subblocks

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 2, 1)             # 2x1 canvas
    out += bytes([0xF0, 0, 0])                  # GCT present, 2 entries
    out += bytes([0, 0, 0, 255, 255, 255])      # global palette
    out += b"\x21\xf9\x04" + bytes([1])         # GCE: transparency on
    out += struct.pack("<H", 0) + bytes([0, 0])  # delay, transp idx 0
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1)
    out += bytes([0x80])                        # LOCAL table, 2 entries
    out += bytes([255, 0, 0, 0, 255, 0])        # local palette
    out += bytes([2]) + _gif_subblocks(_gif_lzw_encode(bytes([0, 1]), 2))
    out += b"\x3b"
    frames, pal, meta = gif_decode(bytes(out))
    assert (frames[0] == 0).all()               # canvas untouched
    assert meta[0]["local_palette"] is True
    assert (meta[0]["local_indices"] == np.array([[0, 1]])).all()
    assert (meta[0]["local_table"] == np.array(
        [[255, 0, 0], [0, 255, 0]], dtype=np.uint8)).all()
