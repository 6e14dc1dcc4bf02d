"""Progressive JPEG (SOF2, T.81 Annex G) contracts: progressive is a
pure reordering of the baseline's quantized coefficients, so its
decode must be PIXEL-IDENTICAL to the baseline decode at equal
(quality, subsample) — across scan-script reorderings, restart
intervals, odd dimensions, and every subsampling profile. Plus the
wild-file behaviors: truncated streams still decode (coarse preview),
per-component sequential multi-scan files (the other non-interleaved
shape the old decoder gated), and desync detection."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.multimodal import (
    _H_AC_CHR,
    _H_AC_LUM,
    _H_DC_CHR,
    _H_DC_LUM,
    _PROGRESSIVE_SCRIPT,
    _BitWriter,
    _dht_segments,
    _dqt_segments,
    _emit_block,
    _huff_codes,
    _jpeg_quantized_planes,
    _seg,
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)


def _img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = (rng.rand(h, w, 3) * 255).astype(int)
    yy, xx = np.mgrid[0:h, 0:w]
    return ((base + (yy * 3 + xx * 2)[..., None]) % 256).astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,sub,q,ri",
    [
        (16, 16, "444", 90, 0),
        (17, 23, "420", 75, 0),
        (24, 16, "422", 50, 0),
        (33, 41, "420", 90, 3),
        (1, 1, "444", 90, 0),
        (7, 9, "420", 60, 2),
        (8, 8, "444", 95, 0),
    ],
)
def test_progressive_decodes_identical_to_baseline(h, w, sub, q, ri):
    img = _img(h, w, seed=h * 100 + w)
    base = jpeg_decode(jpeg_encode(img, q, sub))
    prog = jpeg_decode(
        jpeg_encode_progressive(img, q, sub, restart_interval=ri)
    )
    assert (prog == base).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    sub=st.sampled_from(["444", "422", "420"]),
    q=st.sampled_from([30, 60, 90]),
    ri=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_identity_property(h, w, sub, q, ri, seed):
    img = _img(h, w, seed)
    base = jpeg_decode(jpeg_encode(img, q, sub))
    prog = jpeg_decode(
        jpeg_encode_progressive(img, q, sub, restart_interval=ri)
    )
    assert (prog == base).all()


def test_reordered_scan_scripts_decode_identically():
    # any T.81-legal scan order must reconstruct the same coefficients
    img = _img(21, 34, seed=5)
    reordered = (
        ((0, 1, 2), 0, 0, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((2,), 1, 63, 0, 1),
        ((0,), 1, 63, 0, 2),
        ((0, 1, 2), 0, 0, 1, 0),  # DC refine before luma AC finishes
        ((0,), 1, 63, 2, 1),
        ((1,), 1, 63, 1, 0),
        ((0,), 1, 63, 1, 0),
        ((2,), 1, 63, 1, 0),
    )
    split_bands = (
        # finer spectral selection than the default script
        ((0, 1, 2), 0, 0, 0, 2),
        ((0,), 1, 2, 0, 1),
        ((0,), 3, 9, 0, 1),
        ((0,), 10, 63, 0, 1),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0, 1, 2), 0, 0, 1, 1),
        ((0, 1, 2), 0, 0, 2, 0),  # second DC refinement step
        ((0,), 1, 2, 1, 0),
        ((0,), 3, 9, 1, 0),
        ((0,), 10, 63, 1, 0),
    )
    default = jpeg_decode(jpeg_encode_progressive(img, 85, "420"))
    for script in (reordered, split_bands):
        got = jpeg_decode(
            jpeg_encode_progressive(img, 85, "420", script=script)
        )
        assert (got == default).all()


def test_truncated_progressive_stream_still_decodes():
    # chopping off later scans yields a valid coarse image — the
    # defining progressive property (and what a wild truncated
    # download looks like)
    # smooth gradient: the DC-dominated preview of a SMOOTH image is
    # close to the full decode (a noise image's is legitimately far)
    yy, xx = np.mgrid[0:24, 0:24]
    img = np.stack(
        [(yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    full_bytes = jpeg_encode_progressive(img, 90, "444")
    # re-encode with only the first 2 scans (DC first + first AC band)
    partial = jpeg_encode_progressive(
        img, 90, "444", script=_PROGRESSIVE_SCRIPT[:2]
    )
    coarse = jpeg_decode(partial)
    full = jpeg_decode(full_bytes)
    assert coarse.shape == full.shape
    # the DC-dominated preview is in the right ballpark but not equal
    assert (coarse != full).any()
    assert np.abs(coarse.astype(int) - full.astype(int)).mean() < 40


def test_sequential_multiscan_per_component():
    # baseline SOF0 with one SOS per component (non-interleaved) —
    # legal sequential JPEG the old decoder gated; must decode
    # pixel-identically to the interleaved single-scan file
    import struct

    img = _img(19, 26, seed=3)
    q = 90
    zzs, H, W = _jpeg_quantized_planes(img, q, 1, 1)
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_segments(q)
    out += _dht_segments()
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    huffs = [
        (_huff_codes(*_H_DC_LUM), _huff_codes(*_H_AC_LUM)),
        (_huff_codes(*_H_DC_CHR), _huff_codes(*_H_AC_CHR)),
        (_huff_codes(*_H_DC_CHR), _huff_codes(*_H_AC_CHR)),
    ]
    for ci in range(3):
        t = 0 if ci == 0 else 1
        out += _seg(0xDA, bytes([1, ci + 1, (t << 4) | t, 0, 63, 0]))
        bw = _BitWriter()
        dc_prev = 0
        for row in zzs[ci]:
            for blk in row:
                dc_prev = _emit_block(blk, dc_prev, huffs[ci][0], huffs[ci][1], bw)
        out += bw.flush()
    out += b"\xff\xd9"
    got = jpeg_decode(bytes(out))
    want = jpeg_decode(jpeg_encode(img, q, "444"))
    assert (got == want).all()


def test_progressive_restart_desync_raises():
    img = _img(32, 32, seed=2)
    payload = bytearray(
        jpeg_encode_progressive(img, 90, "444", restart_interval=1)
    )
    # corrupt the first RST marker's sequence number
    for i in range(len(payload) - 1):
        if payload[i] == 0xFF and payload[i + 1] == 0xD0:
            payload[i + 1] = 0xD3
            break
    with pytest.raises(ValueError, match="restart marker"):
        jpeg_decode(bytes(payload))


def test_refinement_step_must_be_one_bit():
    img = _img(8, 8, seed=1)
    bad = (
        ((0, 1, 2), 0, 0, 0, 2),
        ((0,), 1, 63, 0, 2),
        ((0,), 1, 63, 2, 0),  # Ah=2 -> Al=0 skips a bit
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0, 1, 2), 0, 0, 2, 0),
    )
    with pytest.raises(ValueError, match="one bit"):
        jpeg_encode_progressive(img, 90, "444", script=bad)


def test_multicomponent_ac_scan_rejected():
    img = _img(8, 8, seed=1)
    with pytest.raises(ValueError, match="single-component"):
        jpeg_encode_progressive(
            img, 90, "444", script=(((0, 1), 1, 63, 0, 0),)
        )
