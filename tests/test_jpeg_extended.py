"""Extended-sequential JPEG (SOF1, T.81) contracts — round 8,
VERDICT r7 "What's missing #1": the scanned-document profile. 12-bit
samples with 16-bit quantization tables (Pq=1) and per-image optimal
Huffman tables (DC categories past the Annex K range), plus the
8-bit SOF1 variant; decode shares the baseline scan machinery."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.multimodal import (
    _optimal_dht,
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_extended,
)


def _img12(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 4096, (h // 4 + 2, w // 4 + 2, 3))
    img = np.repeat(np.repeat(base, 4, 0), 4, 1)[:h, :w]  # smooth-ish
    return img.astype(np.uint16)


def test_sof1_12bit_roundtrip_smooth_gradient_near_exact():
    g = np.linspace(0, 4095, 64 * 64).reshape(64, 64)
    img = np.stack([g, g, g], axis=-1).astype(np.uint16)
    blob = jpeg_encode_extended(img, quality=95, precision=12)
    dec = jpeg_decode(blob)
    assert dec.dtype == np.uint16 and dec.shape == img.shape
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    # 12-bit keeps ~16x the 8-bit tonal resolution: a smooth ramp at
    # q95 lands within a handful of 12-bit steps (≪ one 8-bit step)
    assert err <= 8, err


def test_sof1_stream_structure_and_16bit_dqt():
    img = _img12(24, 40, seed=2)
    blob = jpeg_encode_extended(img, quality=90, precision=12)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert b"\xff\xc1" in blob and b"\xff\xc0" not in blob
    # DQT Pq nibble = 1 (16-bit entries), precision byte = 12
    i = blob.find(b"\xff\xdb")
    assert blob[i + 4] >> 4 == 1
    j = blob.find(b"\xff\xc1")
    assert blob[j + 4] == 12
    # no APP0: JFIF is defined for 8-bit samples only
    assert b"JFIF" not in blob
    dec = jpeg_decode(blob)
    assert dec.dtype == np.uint16 and dec.shape == img.shape


def test_sof1_8bit_variant_matches_baseline_quality():
    rng = np.random.RandomState(5)
    base = rng.randint(0, 256, (8, 11, 3))
    img = np.repeat(np.repeat(base, 4, 0), 4, 1).astype(np.uint8)
    ext = jpeg_decode(jpeg_encode_extended(img, quality=90, precision=8))
    bas = jpeg_decode(jpeg_encode(img, quality=90))
    assert ext.dtype == np.uint8
    # same coefficients, different entropy tables: decoded pixels of
    # the SOF1 stream match the SOF0 stream exactly
    assert (ext == bas).all()


@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(9, 40),
    w=st.integers(9, 40),
    sub=st.sampled_from(["444", "420", "422"]),
    q=st.sampled_from([75, 90, 95]),
    seed=st.integers(0, 10_000),
)
def test_sof1_12bit_decodes_all_shapes(h, w, sub, q, seed):
    img = _img12(h, w, seed=seed)
    dec = jpeg_decode(jpeg_encode_extended(img, quality=q, subsample=sub,
                                           precision=12))
    assert dec.shape == img.shape and dec.dtype == np.uint16
    assert int(dec.max()) <= 4095


def test_optimal_dht_never_assigns_all_ones_code():
    # the T.81 C.2 requirement the virtual-symbol trick exists for
    for freqs in (
        {0: 100, 1: 50, 2: 25, 3: 12, 15: 1},
        {i: 1 for i in range(180)},  # forces deep codes
        {0x00: 1000, 0xF0: 1},
        {5: 7},
    ):
        bits, vals = _optimal_dht(freqs)
        assert sum(bits) == len(vals)
        assert set(vals) >= {s for s, f in freqs.items() if f > 0}
        # rebuild canonical codes; no code may be all 1s at its length
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                assert code != (1 << ln) - 1, (ln, code)
                code += 1
                k += 1
            code <<= 1


def test_wild_profile_gates_updated():
    # SOF1 no longer gates; lossless (SOF3) still does, with a clear
    # message
    img = _img12(16, 16, seed=9)
    blob = bytearray(jpeg_encode_extended(img, precision=12))
    j = blob.find(b"\xff\xc1")
    blob[j + 1] = 0xC3  # masquerade as lossless
    with pytest.raises(NotImplementedError, match="lossless"):
        jpeg_decode(bytes(blob))


def test_sof1_12bit_sample_range_enforced():
    bad = np.full((8, 8, 3), 4096, dtype=np.uint16)
    with pytest.raises(AssertionError, match="12 bits"):
        jpeg_encode_extended(bad, precision=12)
