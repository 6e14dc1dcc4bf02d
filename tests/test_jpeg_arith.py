"""Arithmetic-coded JPEG (SOF9/SOF10, T.81 Annex D QM coder +
Annex F/G statistical models) — round 10, VERDICT r9 "Next round #5".

The pin strategy: arithmetic coding replaces ONLY the entropy layer,
and the encoder shares the DCT front half with the Huffman encoders —
so the same image at the same quality MUST decode to bit-identical
pixels through SOF0/SOF1 Huffman and SOF9 arithmetic. That validates
the coder, both statistical models, restart re-initialization, and
the byte-stuffing/carry discipline end-to-end against an
independently-tested path. True cross-implementation interop (our
bytes through libjpeg) is marker-gated on a ``djpeg`` binary with
arithmetic support, the ffprobe pattern — none ships in this
container, and that is honestly noted here."""

from __future__ import annotations

import shutil
import subprocess
import tempfile

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.jpeg_arith import (
    _QM_TABLE,
    ArithDecoder,
    ArithEncoder,
    jpeg_encode_arithmetic,
)
from bigdataflink_spark.operators.multimodal import (
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_extended,
    jpeg_markers,
)


def _smooth(h, w, seed=0):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (ys * 5 + xs * 3 + seed) % 256,
            (ys * 2 + xs * 7 + seed * 3) % 256,
            (ys * 11 + xs + seed * 7) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


# -- Table D.3 structural sanity -------------------------------------------


def test_qm_table_structure():
    assert len(_QM_TABLE) == 114
    for i, (qe, nl, nm, sw) in enumerate(_QM_TABLE):
        assert 0 < qe < 0x8000
        assert 0 <= nl < 114 and 0 <= nm < 114
        # MPS exchange only happens at the top of an estimation chain,
        # where Qe approaches 0.5
        if sw:
            assert qe > 0x5000, f"switch state {i} with small Qe"
    # the fixed (sign/refine) state is non-adaptive
    qe, nl, nm, sw = _QM_TABLE[113]
    assert (nl, nm, sw) == (113, 113, 0) and qe == 0x5A1D


def test_raw_coder_roundtrip_random_bits():
    # drive the raw coder outside any JPEG model: one adaptive bin +
    # the fixed bin, a biased random bit mix, byte-level round-trip
    rng = np.random.RandomState(5)
    bits = (rng.rand(4000) < 0.83).astype(int).tolist()
    enc = ArithEncoder()
    st = bytearray(2)
    st[1] = 113
    for i, b in enumerate(bits):
        enc.encode(st, i % 2, b)
    enc.flush()
    data = bytes(enc.out)
    # stuffing invariant: no 0xFF byte followed by anything > 0x7F
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] == 0x00
    dec = ArithDecoder(data)
    st2 = bytearray(2)
    st2[1] = 113
    got = [dec.decode(st2, i % 2) for i in range(len(bits))]
    assert got == bits


# -- pixel parity against the Huffman twins ---------------------------------


def test_seq_arith_matches_huffman_pixels_rgb():
    rng = np.random.RandomState(21)
    for h, w in ((24, 33), (8, 8), (17, 19)):
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in ("444", "422", "420"):
            hb = jpeg_encode(img, quality=70, subsample=sub)
            ab = jpeg_encode_arithmetic(img, quality=70, subsample=sub)
            assert np.array_equal(jpeg_decode(hb), jpeg_decode(ab)), (
                h, w, sub,
            )


def test_seq_arith_matches_huffman_with_restarts():
    rng = np.random.RandomState(22)
    img = rng.randint(0, 256, (32, 24, 3)).astype(np.uint8)
    for ri in (1, 3, 7):
        hb = jpeg_encode(img, quality=75, restart_interval=ri)
        ab = jpeg_encode_arithmetic(img, quality=75, restart_interval=ri)
        assert np.array_equal(jpeg_decode(hb), jpeg_decode(ab)), ri
        # RSTn markers really are in the stream (jpeg_markers treats
        # in-scan RSTn as data by design, so count bytes directly)
        assert sum(
            ab.count(bytes([0xFF, 0xD0 + k])) for k in range(8)
        ) > 0


def test_gray_and_12bit_match_extended_huffman():
    rng = np.random.RandomState(23)
    g8 = rng.randint(0, 256, (21, 30)).astype(np.uint8)
    assert np.array_equal(
        jpeg_decode(jpeg_encode_extended(g8, quality=75, precision=8)),
        jpeg_decode(jpeg_encode_arithmetic(g8, quality=75, precision=8)),
    )
    g12 = rng.randint(0, 4096, (16, 24)).astype(np.uint16)
    d = jpeg_decode(jpeg_encode_arithmetic(g12, quality=75, precision=12))
    assert d.dtype == np.uint16
    assert np.array_equal(
        jpeg_decode(jpeg_encode_extended(g12, quality=75, precision=12)), d
    )
    c12 = rng.randint(0, 4096, (16, 24, 3)).astype(np.uint16)
    assert np.array_equal(
        jpeg_decode(
            jpeg_encode_extended(c12, quality=75, precision=12, subsample="420")
        ),
        jpeg_decode(
            jpeg_encode_arithmetic(
                c12, quality=75, precision=12, subsample="420"
            )
        ),
    )


def test_progressive_matches_sequential_arith():
    rng = np.random.RandomState(24)
    for h, w in ((24, 33), (17, 19)):
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in ("444", "420"):
            for ri in (0, 2):
                sq = jpeg_encode_arithmetic(
                    img, quality=70, subsample=sub, restart_interval=ri
                )
                pg = jpeg_encode_arithmetic(
                    img, quality=70, subsample=sub, restart_interval=ri,
                    progressive=True,
                )
                assert np.array_equal(jpeg_decode(sq), jpeg_decode(pg)), (
                    h, w, sub, ri,
                )


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(6, 40),
    w=st.integers(6, 40),
    quality=st.sampled_from([35, 60, 80, 95]),
    sub=st.sampled_from(["444", "422", "420"]),
    ri=st.sampled_from([0, 0, 2, 5]),
    progressive=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_arith_vs_huffman(h, w, quality, sub, ri, progressive, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    ref = jpeg_decode(
        jpeg_encode(img, quality=quality, subsample=sub, restart_interval=ri)
    )
    got = jpeg_decode(
        jpeg_encode_arithmetic(
            img, quality=quality, subsample=sub, restart_interval=ri,
            progressive=progressive,
        )
    )
    assert np.array_equal(ref, got)


# -- stream structure & compression ------------------------------------------


def test_stream_structure_sof9_dac_no_dht():
    blob = jpeg_encode_arithmetic(_smooth(24, 32), quality=85)
    codes = [m for m, _ in jpeg_markers(blob)]
    assert 0xC9 in codes and 0xCC in codes
    assert 0xC4 not in codes  # no Huffman tables in an arithmetic stream
    assert not {0xC0, 0xC1, 0xC2, 0xC3} & set(codes)
    blob_p = jpeg_encode_arithmetic(_smooth(24, 32), progressive=True)
    codes_p = [m for m, _ in jpeg_markers(blob_p)]
    assert 0xCA in codes_p and codes_p.count(0xDA) > 1


def test_arithmetic_beats_huffman_on_smooth_signal():
    img = _smooth(48, 64, seed=3)
    hb = jpeg_encode(img, quality=85)
    ab = jpeg_encode_arithmetic(img, quality=85)
    assert len(ab) < len(hb)
    assert np.array_equal(jpeg_decode(hb), jpeg_decode(ab))


def test_restart_out_of_sequence_raises():
    blob = bytearray(
        jpeg_encode_arithmetic(_smooth(32, 32), quality=80, restart_interval=2)
    )
    i = blob.find(b"\xff\xd0")
    assert i > 0
    blob[i + 1] = 0xD5  # corrupt RST0 -> RST5
    with pytest.raises(ValueError, match="restart marker"):
        jpeg_decode(bytes(blob))


def test_differential_sofs_still_gated():
    blob = bytearray(jpeg_encode_arithmetic(_smooth(16, 16)))
    i = blob.find(b"\xff\xc9")
    for sof in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
        blob[i + 1] = sof
        with pytest.raises(NotImplementedError):
            jpeg_decode(bytes(blob))


# -- marker-gated external differential (the ffprobe pattern) ---------------


@pytest.mark.skipif(
    shutil.which("djpeg") is None,
    reason="no djpeg binary (needs libjpeg>=7 with arithmetic support)",
)
def test_djpeg_differential():
    img = _smooth(24, 32, seed=9)
    blob = jpeg_encode_arithmetic(img, quality=90)
    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        f.write(blob)
        f.flush()
        out = subprocess.run(
            ["djpeg", "-ppm", f.name], capture_output=True, check=True
        ).stdout
    assert out.startswith(b"P6")
    # parse the PPM header, compare pixels against our own decode
    parts = out.split(b"\n", 3)
    w, h = map(int, parts[1].split())
    theirs = np.frombuffer(parts[3], dtype=np.uint8).reshape(h, w, 3)
    ours = jpeg_decode(blob)
    # IDCT implementations may differ by +-1 per sample
    assert theirs.shape == ours.shape
    assert int(np.abs(theirs.astype(int) - ours.astype(int)).max()) <= 1


# -- SOF11: arithmetic lossless ----------------------------------------------


def test_sof11_roundtrip_all_predictors_rgb8():
    from bigdataflink_spark.operators.jpeg_arith import (
        jpeg_encode_lossless_arith,
    )

    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (19, 27, 3)).astype(np.uint8)
    for p in range(1, 8):
        dec = jpeg_decode(jpeg_encode_lossless_arith(img, predictor=p))
        assert dec.dtype == np.uint8 and (dec == img).all(), f"pred {p}"


def test_sof11_gray_precisions_pt_restarts():
    from bigdataflink_spark.operators.jpeg_arith import (
        jpeg_encode_lossless_arith,
    )

    rng = np.random.RandomState(32)
    for prec in (2, 4, 8, 12, 16):
        maxv = (1 << prec) - 1
        dt = np.uint8 if prec <= 8 else np.uint16
        g = rng.randint(0, maxv + 1, (13, 9)).astype(dt)
        dec = jpeg_decode(jpeg_encode_lossless_arith(g, precision=prec))
        assert dec.dtype == dt and (dec[:, :, 0] == g).all(), prec
    g = rng.randint(0, 4096, (11, 7)).astype(np.uint16)
    dec = jpeg_decode(
        jpeg_encode_lossless_arith(g, precision=12, point_transform=3)
    )
    assert (dec[:, :, 0] == ((g >> 3) << 3)).all()
    img = rng.randint(0, 256, (16, 21, 3)).astype(np.uint8)
    blob = jpeg_encode_lossless_arith(img, predictor=5, restart_interval=29)
    assert (jpeg_decode(blob) == img).all()
    assert sum(blob.count(bytes([0xFF, 0xD0 + k])) for k in range(8)) > 0


def test_sof11_stream_structure_and_compression():
    from bigdataflink_spark.operators.jpeg_arith import (
        jpeg_encode_lossless_arith,
    )
    from bigdataflink_spark.operators.multimodal import (
        jpeg_encode_lossless,
    )

    img = _smooth(24, 32, seed=5)
    blob = jpeg_encode_lossless_arith(img, predictor=4)
    codes = [m for m, _ in jpeg_markers(blob)]
    assert 0xCB in codes and 0xCC in codes
    assert 0xC4 not in codes and 0xDB not in codes  # no DHT, no DQT
    # conditioned adaptive estimation beats per-image optimal Huffman
    # on predictable signal by a wide margin
    hb = jpeg_encode_lossless(img, predictor=4)
    assert len(blob) < len(hb)
    assert np.array_equal(jpeg_decode(blob), jpeg_decode(hb))


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(4, 24),
    w=st.integers(4, 24),
    predictor=st.integers(1, 7),
    prec=st.sampled_from([8, 8, 12, 16]),
    pt=st.integers(0, 3),
    ri=st.sampled_from([0, 0, 7]),
    seed=st.integers(0, 2**31 - 1),
)
def test_sof11_fuzz_roundtrip(h, w, predictor, prec, pt, ri, seed):
    from bigdataflink_spark.operators.jpeg_arith import (
        jpeg_encode_lossless_arith,
    )

    rng = np.random.RandomState(seed)
    maxv = (1 << prec) - 1
    dt = np.uint8 if prec <= 8 else np.uint16
    g = rng.randint(0, maxv + 1, (h, w)).astype(dt)
    dec = jpeg_decode(
        jpeg_encode_lossless_arith(
            g, predictor=predictor, precision=prec, point_transform=pt,
            restart_interval=ri,
        )
    )
    assert (dec[:, :, 0] == ((g >> pt) << pt)).all()
