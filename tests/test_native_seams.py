"""Native-codec seams (VERDICT r7 #4): when a native implementation
is importable — the `zstandard` binding, PIL — route-able paths must
agree with the pure-Python codecs BYTE-FOR-BYTE (or within the
codec's decode tolerance for JPEG, whose inverse DCT is not
bit-specified). This sandbox ships neither, so these tests skip
cleanly here and light up in any deployment that has the packages —
the parity pin that makes "auto-use native when present" safe.

The ffmpeg seam for MP4 frame decode stays documented-gated
(operators/multimodal.py): our MP4 surface is the container walk,
not codec payloads, so there is nothing for ffmpeg to cross-check.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdataflink_spark.operators.zstd import (
    native_zstd_module,
    zstd_compress,
    zstd_compress_store,
    zstd_decompress,
    zstd_decompress_auto,
    zstd_decompress_native,
)


def _text(n: int = 20_000) -> bytes:
    import random

    rng = random.Random(84)
    words = ["shard", "frame", "spark", "corpus", "entropy", "zstd"]
    return (" ".join(rng.choice(words) for _ in range(n))).encode()


def test_auto_decode_always_matches_pure():
    # with or without the binding, the auto entry equals the pure
    # decoder (here: pure fallback; with the binding: parity below)
    for data in (b"", b"xy", _text(2_000), bytes(range(256)) * 40):
        frame = zstd_compress(data)
        assert zstd_decompress_auto(frame) == zstd_decompress(frame) == data


@pytest.mark.skipif(
    native_zstd_module() is None, reason="zstandard binding not installed"
)
def test_native_zstd_parity_on_our_frames():
    corpora = [b"", b"a" * 5_000, _text(20_000), bytes(range(256)) * 64]
    for data in corpora:
        for enc in (zstd_compress, zstd_compress_store):
            frame = enc(data)
            assert zstd_decompress_native(frame) == zstd_decompress(frame)
    # multi-frame + skippable interleave
    stream = (
        zstd_compress(b"one")
        + (0x184D2A50).to_bytes(4, "little")
        + (4).to_bytes(4, "little")
        + b"skip"
        + zstd_compress_store(b"two", checksum=False)
    )
    assert zstd_decompress_native(stream) == zstd_decompress(stream)


@pytest.mark.skipif(
    native_zstd_module() is None, reason="zstandard binding not installed"
)
def test_native_zstd_parity_on_native_frames():
    mod = native_zstd_module()
    for level in (1, 3, 19):
        data = _text(30_000)
        frame = mod.ZstdCompressor(level=level).compress(data)
        assert zstd_decompress(frame) == data
        assert zstd_decompress_native(frame) == data


def _pil():
    try:
        import PIL.Image  # type: ignore

        return PIL.Image
    except ImportError:
        return None


@pytest.mark.skipif(_pil() is None, reason="PIL not installed")
def test_pil_png_parity_byte_exact():
    import io

    from bigdataflink_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    Image = _pil()
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 31, 3), dtype=np.uint8)
    blob = png_encode(img)
    pil_px = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    assert (pil_px == png_decode(blob)).all()  # PNG is lossless: exact
    # and the reverse: a PIL-written PNG decodes exactly here
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert (png_decode(buf.getvalue()) == img).all()


@pytest.mark.skipif(_pil() is None, reason="PIL not installed")
def test_pil_jpeg_parity_within_idct_tolerance():
    import io

    from bigdataflink_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    Image = _pil()
    x = np.arange(32)[:, None] * 8 + np.arange(40)[None, :] * 3
    img = np.stack([x % 256, (x * 2) % 256, (x * 5) % 256], axis=-1).astype(
        np.uint8
    )
    blob = jpeg_encode(img, quality=90)
    ours = jpeg_decode(blob).astype(np.int64)
    theirs = np.asarray(
        Image.open(io.BytesIO(blob)).convert("RGB")
    ).astype(np.int64)
    # IDCT rounding is implementation-defined (T.81 Annex A allows
    # small per-sample variance); libjpeg vs our exact float IDCT
    assert ours.shape == theirs.shape
    assert np.abs(ours - theirs).max() <= 2
