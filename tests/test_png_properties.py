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
