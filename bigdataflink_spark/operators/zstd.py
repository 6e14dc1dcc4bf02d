"""Zstandard (RFC 8878) frame codec — pure stdlib, built from the
spec.

Common Crawl publishes ``.warc.zst`` beside ``.warc.gz``; a web-scale
ingest that can't open them skips a growing slice of the corpus. The
environment ships no ``zstandard`` module, so this implements the
format itself, the repo's codec discipline (PNG/JPEG/GIF/FLAC):

* **Decoder** — full frame walk: magic, frame-header descriptor
  (content-size flag, single-segment, checksum flag, dictionary-id
  flag, reserved-bit checks), window descriptor, all four
  frame-content-size widths, 3-byte block headers, RAW and RLE
  blocks, skippable frames (0x184D2A50-5F), multi-frame streams,
  and XXH64 content-checksum verification (xxhash64 implemented
  below). COMPRESSED blocks (FSE/Huffman entropy sections) raise
  ``NotImplementedError`` — an honest gate, not silence; see
  ``zstd_decompress``'s docstring for the tier plan.
* **Encoder** — store-mode frames: single-segment, raw blocks at the
  128 KiB block maximum, frame-content-size, XXH64 checksum. These
  are REAL zstd frames — ``unzstd`` opens them byte-for-byte
  (pinned by the CLI-interop test when a ``zstd`` binary is on
  PATH), exactly as a ``zstd --format`` store would emit. Store mode
  is the honest subset an encoder can claim without entropy coding;
  the wire format, framing, and checksums are complete.

Scale shape: like the gzip member walk in ``sources/warc.py``, the
frame walk is O(n) single-pass over a bytes buffer and yields
``(offset, compressed_length, payload)`` so shards split at frame
boundaries and any record is fetchable by slice — the property that
matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F
_BLOCK_MAX = 128 * 1024

_MASK64 = (1 << 64) - 1

# XXH64 primes (the checksum zstd frames carry — RFC 8878 §3.1.1
# references XXH64 with seed 0; low 32 bits are stored)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the checksum algorithm zstd frames use.
    Pure-int implementation of the public spec (xxHash repository,
    XXH64 description); verified against the vectors embedded in the
    test suite and, transitively, by every CLI-interop round-trip
    (a wrong digest fails ``unzstd``)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK64
        v2 = (seed + _P2) & _MASK64
        v3 = seed
        v4 = (seed - _P1) & _MASK64
        while pos + 32 <= n:
            lane = int.from_bytes(data[pos:pos + 8], "little")
            v1 = (_rotl((v1 + lane * _P2) & _MASK64, 31) * _P1) & _MASK64
            lane = int.from_bytes(data[pos + 8:pos + 16], "little")
            v2 = (_rotl((v2 + lane * _P2) & _MASK64, 31) * _P1) & _MASK64
            lane = int.from_bytes(data[pos + 16:pos + 24], "little")
            v3 = (_rotl((v3 + lane * _P2) & _MASK64, 31) * _P1) & _MASK64
            lane = int.from_bytes(data[pos + 24:pos + 32], "little")
            v4 = (_rotl((v4 + lane * _P2) & _MASK64, 31) * _P1) & _MASK64
            pos += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _MASK64, 31) * _P1) & _MASK64))
                 * _P1 + _P4) & _MASK64
    else:
        h = (seed + _P5) & _MASK64
    h = (h + n) & _MASK64
    while pos + 8 <= n:
        lane = int.from_bytes(data[pos:pos + 8], "little")
        h = (_rotl(h ^ ((_rotl((lane * _P2) & _MASK64, 31) * _P1) & _MASK64),
                   27) * _P1 + _P4) & _MASK64
        pos += 8
    if pos + 4 <= n:
        lane = int.from_bytes(data[pos:pos + 4], "little")
        h = (_rotl(h ^ ((lane * _P1) & _MASK64), 23) * _P2 + _P3) & _MASK64
        pos += 4
    while pos < n:
        h = (_rotl(h ^ ((data[pos] * _P5) & _MASK64), 11) * _P1) & _MASK64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# encoder (store mode)
# ---------------------------------------------------------------------------

def zstd_compress_store(data: bytes, checksum: bool = True) -> bytes:
    """One REAL zstd frame carrying ``data`` as raw (stored) blocks:
    single-segment, frame-content-size header, 128 KiB block maximum,
    optional XXH64 content checksum. Any zstd decoder opens it; no
    entropy coding is claimed (that is the decode-side tier)."""
    n = len(data)
    # frame header descriptor: FCS flag (bits 7-6), single-segment
    # (bit 5), checksum (bit 2); dictionary-id flag 0
    if n <= 0xFF:
        fcs_flag, fcs = 0, n.to_bytes(1, "little")
    elif n - 256 <= 0xFFFF:
        fcs_flag, fcs = 1, (n - 256).to_bytes(2, "little")
    elif n <= 0xFFFFFFFF:
        fcs_flag, fcs = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs = 3, n.to_bytes(8, "little")
    fhd = (fcs_flag << 6) | 0x20 | (0x04 if checksum else 0)
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    out.append(fhd)
    out += fcs  # single-segment: window size = frame content size
    if n == 0:
        out += (1 << 0).to_bytes(3, "little")  # last empty raw block
    else:
        pos = 0
        while pos < n:
            chunk = data[pos:pos + _BLOCK_MAX]
            pos += len(chunk)
            last = 1 if pos >= n else 0
            header = last | (0 << 1) | (len(chunk) << 3)  # type 0 = raw
            out += header.to_bytes(3, "little")
            out += chunk
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _parse_frame(data: bytes, pos: int) -> tuple[bytes, int]:
    """Decode one zstd frame starting at ``pos``; returns
    (payload, end_offset). Raises ValueError on corruption and
    NotImplementedError on compressed blocks (entropy tier)."""
    n = len(data)
    if pos + 4 > n:
        raise ValueError(f"truncated zstd magic at offset {pos}")
    magic = int.from_bytes(data[pos:pos + 4], "little")
    if magic != _MAGIC:
        raise ValueError(f"bad zstd magic 0x{magic:08X} at offset {pos}")
    pos += 4
    if pos >= n:
        raise ValueError("truncated zstd frame header")
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("reserved bit set in frame header descriptor")
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    has_checksum = bool(fhd & 0x04)
    did_flag = fhd & 0x03
    if not single_segment:
        if pos >= n:
            raise ValueError("truncated window descriptor")
        pos += 1  # window descriptor: bounds content, not needed here
    did_len = (0, 1, 2, 4)[did_flag]
    if did_len:
        if int.from_bytes(data[pos:pos + did_len], "little") != 0:
            raise NotImplementedError("dictionary-compressed zstd frame")
        pos += did_len
    fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    content_size = None
    if fcs_len:
        if pos + fcs_len > n:
            raise ValueError("truncated frame content size")
        content_size = int.from_bytes(data[pos:pos + fcs_len], "little")
        if fcs_len == 2:
            content_size += 256
        pos += fcs_len

    out = bytearray()
    while True:
        if pos + 3 > n:
            raise ValueError("truncated zstd block header")
        header = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        last = header & 1
        btype = (header >> 1) & 3
        bsize = header >> 3
        if btype == 0:  # raw
            if pos + bsize > n:
                raise ValueError("raw block overruns frame")
            out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: one byte repeated bsize times
            if pos >= n:
                raise ValueError("RLE block missing its byte")
            out += data[pos:pos + 1] * bsize
            pos += 1
        elif btype == 2:
            raise NotImplementedError(
                "compressed zstd block (FSE/Huffman entropy tier)"
            )
        else:
            raise ValueError("reserved zstd block type 3")
        if last:
            break
    if content_size is not None and len(out) != content_size:
        raise ValueError(
            f"zstd frame content size mismatch: header says "
            f"{content_size}, blocks yield {len(out)}"
        )
    if has_checksum:
        if pos + 4 > n:
            raise ValueError("truncated zstd content checksum")
        want = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        got = xxh64(bytes(out)) & 0xFFFFFFFF
        if got != want:
            raise ValueError(
                f"zstd content checksum mismatch: {got:08x} != {want:08x}"
            )
    return bytes(out), pos


def iter_zstd_frames(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Walk a multi-frame zstd stream, yielding ``(offset,
    compressed_length, payload)`` per data frame — the zstd twin of
    ``sources.warc.iter_gzip_members`` (same offset-fetchable shard
    contract). Skippable frames are skipped; corruption raises."""
    n, pos = len(data), 0
    while pos < n:
        if pos + 8 <= n:
            magic = int.from_bytes(data[pos:pos + 4], "little")
            if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
                size = int.from_bytes(data[pos + 4:pos + 8], "little")
                pos += 8 + size
                continue
        start = pos
        payload, pos = _parse_frame(data, pos)
        yield start, pos - start, payload


def zstd_decompress(data: bytes) -> bytes:
    """Concatenated payload of every data frame in ``data``.

    Tier note: RAW/RLE blocks decode here (complete framing +
    checksum verification); FSE/Huffman compressed blocks raise
    ``NotImplementedError`` until the entropy tier lands — the same
    honest-gate discipline as progressive-JPEG-before-round-7. When a
    ``zstandard``/libzstd binding is present in a deployment, route
    compressed frames through it; the FRAME walk above (offsets,
    shard splitting) is binding-independent."""
    return b"".join(p for _, _, p in iter_zstd_frames(data))
