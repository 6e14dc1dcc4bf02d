"""Property-based PNG codec contract: ANY uint8/uint16 array of any
supported shape, under any filter and layout, round-trips exactly —
Hypothesis explores the corner space (1-pixel dims, dims below the
Adam7 pass grid, channel counts, filter types) that example-based
tests sample."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.multimodal import png_decode, png_encode


@st.composite
def images(draw):
    h = draw(st.integers(1, 21))
    w = draw(st.integers(1, 21))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    depth16 = draw(st.booleans())
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    if depth16:
        return rng.randint(0, 65536, (h, w, ch)).astype(np.uint16)
    return rng.randint(0, 256, (h, w, ch)).astype(np.uint8)


@settings(max_examples=40, deadline=None)
@given(
    img=images(),
    filter_type=st.integers(0, 4),
    interlace=st.booleans(),
)
def test_png_roundtrip_property(img, filter_type, interlace):
    dec = png_decode(png_encode(img, filter_type=filter_type, interlace=interlace))
    assert dec.dtype == img.dtype and dec.shape == img.shape
    assert (dec == img).all()


@settings(max_examples=15, deadline=None)
@given(
    hw=st.tuples(st.integers(1, 17), st.integers(1, 17)),
    n_colors=st.integers(1, 64),
    filter_type=st.integers(0, 4),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_palette_roundtrip_property(hw, n_colors, filter_type, interlace, seed):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, n_colors, (hw[0], hw[1], 1)).astype(np.uint8)
    pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    dec = png_decode(
        png_encode(idx, filter_type=filter_type, palette=pal, interlace=interlace)
    )
    assert (dec == pal[idx[:, :, 0]]).all()


@settings(max_examples=40, deadline=None)
@given(
    depth=st.sampled_from([1, 2, 4]),
    hw=st.tuples(st.integers(1, 33), st.integers(1, 33)),
    filter_type=st.integers(0, 4),
    interlace=st.booleans(),
    use_palette=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_subbyte_roundtrip_property(
    depth, hw, filter_type, interlace, use_palette, seed
):
    # the round-7 sub-byte tier: 1/2/4-bit gray and palette, every
    # filter, plain and Adam7, widths that exercise padding bits
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 1 << depth, hw).astype(np.uint8)
    if use_palette:
        pal = rng.randint(0, 256, (1 << depth, 3)).astype(np.uint8)
        dec = png_decode(png_encode(
            img, filter_type=filter_type, interlace=interlace,
            bit_depth=depth, palette=pal,
        ))
        assert (dec == pal[img]).all()
    else:
        dec = png_decode(png_encode(
            img, filter_type=filter_type, interlace=interlace,
            bit_depth=depth,
        ))
        assert dec.shape == (*hw, 1)
        assert (dec.reshape(hw) == img).all()


def test_png_subbyte_padding_bits_are_ignored():
    # the spec leaves scanline padding bits unspecified; wild
    # encoders write junk there — decode must discard, not validate
    import struct
    import zlib

    from bigdataflink_spark.operators import multimodal as mm

    h, w, depth = 3, 5, 1  # 5 one-bit samples/row: 3 padding bits
    img = np.array([[1, 0, 1, 1, 0], [0, 1, 1, 0, 1], [1, 1, 0, 0, 1]],
                   dtype=np.uint8)
    rows = []
    for y in range(h):
        byte = 0
        for x in range(w):
            byte |= int(img[y, x]) << (7 - x)
        byte |= {0: 0b101, 1: 0b010, 2: 0b111}[y]  # junk padding
        rows.append(bytes([0, byte]))  # filter 0
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    payload = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + mm._png_chunk(b"IEND", b"")
    )
    dec = png_decode(payload)
    assert (dec.reshape(h, w) == img).all()


def test_png_subbyte_rejects_illegal_combinations():
    import pytest as _pytest

    img = np.zeros((4, 4), dtype=np.uint8)
    with _pytest.raises(AssertionError, match="single-channel"):
        png_encode(np.zeros((4, 4, 3), dtype=np.uint8), bit_depth=2)
    with _pytest.raises(AssertionError, match="out of range"):
        png_encode(img + 2, bit_depth=1)
    # palette larger than the depth allows
    with _pytest.raises(AssertionError):
        png_encode(img, bit_depth=2,
                   palette=np.zeros((5, 3), dtype=np.uint8))


def test_adaptive_filter_smaller_and_exact():
    """Round 9: filter_type="adaptive" — per-row libpng MSAD pick.
    Must decode bit-exactly (decoder always handled mixed per-row
    filters), be deterministic, and beat every fixed filter on a
    gradient image (where different rows genuinely prefer different
    predictors)."""
    import numpy as np

    from bigdataflink_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    x = np.arange(64)[:, None] + np.arange(96)[None, :] * 2
    img = np.stack(
        [(x % 256), (x // 2 % 256), (x * 3 % 256)], axis=-1
    ).astype(np.uint8)
    sizes = {}
    for ft in (0, 1, 2, 3, 4, "adaptive"):
        blob = png_encode(img, filter_type=ft)
        assert (png_decode(blob) == img).all(), ft
        sizes[ft] = len(blob)
    assert sizes["adaptive"] <= min(
        v for k, v in sizes.items() if k != "adaptive"
    )
    assert png_encode(img, filter_type="adaptive") == png_encode(
        img, filter_type="adaptive"
    )
    # every shape family round-trips under adaptive
    rng = np.random.RandomState(5)
    g16 = rng.randint(0, 65536, (20, 17)).astype(np.uint16)
    d = png_decode(png_encode(g16, filter_type="adaptive"))
    assert d.dtype == np.uint16 and (d[:, :, 0] == g16).all()
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (13, 11)).astype(np.uint8)
    b = png_encode(idx, palette=pal, bit_depth=4, filter_type="adaptive")
    assert (png_decode(b) == pal[idx]).all()
    assert (
        png_decode(png_encode(img, filter_type="adaptive", interlace=True))
        == img
    ).all()
    one = rng.randint(0, 256, (5, 1, 3)).astype(np.uint8)
    assert (png_decode(png_encode(one, filter_type="adaptive")) == one).all()
