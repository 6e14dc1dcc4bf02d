"""WebDataset-style tar shard builder + parser (POSIX ustar).

The second archive format web-scale training corpora arrive in
(beside ``sources/warc.py``'s WARC): multimodal datasets ship as tar
shards where one SAMPLE is a run of adjacent members sharing a key
prefix — ``000017.img`` + ``000017.json`` + ``000017.txt`` — so a
shard streams sample-by-sample with no index and splits at shard
granularity. This module implements the layout from the public tar
spec (POSIX.1-1988 ustar header: 512-byte blocks, octal fields,
space-padded checksum), not via the ``tarfile`` module — but the
tests pin INTEROP both ways (stdlib ``tarfile`` reads our shards;
we read ``tarfile``-written shards), which is the real wild-file
guarantee.

Reference parity: the reference ingests Kafka JSON
(``/root/reference/flink/stream_to_star.py:200-260``); archive-shard
ingest is part of the training-data extension suite (SURVEY.md §7).

Parse side verifies what the format allows: header checksums, octal
field syntax, size-vs-physical bounds, and the end-of-archive zero
blocks. Grouping enforces the WebDataset adjacency contract —
members of one sample must be contiguous; a key that reappears after
a different key is a corrupt shard, not a new sample.
"""

from __future__ import annotations

from collections.abc import Iterator

_BLOCK = 512


# ---------------------------------------------------------------------------
# build side
# ---------------------------------------------------------------------------

def _octal(value: int, width: int) -> bytes:
    """NUL-terminated, zero-padded octal field (ustar convention)."""
    return f"{value:0{width - 1}o}".encode() + b"\x00"


def tar_member(name: str, payload: bytes, mtime: int = 0) -> bytes:
    """One ustar header block + payload padded to 512 bytes."""
    name_b = name.encode()
    prefix = b""
    if len(name_b) > 100:
        # ustar prefix split: prefix/name joined by '/' on read
        cut = name_b.rfind(b"/", 0, 156)
        if cut <= 0 or len(name_b) - cut - 1 > 100:
            raise ValueError(f"tar member name too long: {name!r}")
        prefix, name_b = name_b[:cut], name_b[cut + 1:]
    hdr = bytearray(_BLOCK)
    hdr[0:len(name_b)] = name_b                     # name
    hdr[100:108] = _octal(0o644, 8)                 # mode
    hdr[108:116] = _octal(0, 8)                     # uid
    hdr[116:124] = _octal(0, 8)                     # gid
    hdr[124:136] = _octal(len(payload), 12)         # size
    hdr[136:148] = _octal(mtime, 12)                # mtime
    hdr[148:156] = b" " * 8                         # chksum (spaces while summing)
    hdr[156] = 0x30                                 # typeflag '0' regular
    hdr[257:263] = b"ustar\x00"                     # magic
    hdr[263:265] = b"00"                            # version
    hdr[345:345 + len(prefix)] = prefix             # prefix
    chksum = sum(hdr)
    hdr[148:156] = f"{chksum:06o}".encode() + b"\x00 "
    pad = (-len(payload)) % _BLOCK
    return bytes(hdr) + payload + b"\x00" * pad


def tar_build_shard(members: list[tuple[str, bytes]]) -> bytes:
    """A complete tar shard: members in the given order, closed by
    the spec's two zero blocks."""
    return b"".join(
        tar_member(n, p) for n, p in members
    ) + b"\x00" * (2 * _BLOCK)


def wds_build_shard(
    samples: list[tuple[str, list[tuple[str, bytes]]]],
) -> bytes:
    """WebDataset layout: ``samples`` is [(key, [(ext, payload)..])];
    each sample's members are emitted adjacently as ``{key}.{ext}``."""
    members = [
        (f"{key}.{ext}", payload)
        for key, exts in samples
        for ext, payload in exts
    ]
    return tar_build_shard(members)


# ---------------------------------------------------------------------------
# parse side
# ---------------------------------------------------------------------------

def _read_octal(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip(b" \x00")
    if not s:
        return 0
    if not all(0x30 <= b <= 0x37 for b in s):
        raise ValueError(f"non-octal tar field {field!r}")
    return int(s, 8)


def iter_tar_members(data: bytes) -> Iterator[tuple[str, bytes]]:
    """Walk a tar stream: yield ``(name, payload)`` per regular
    member, verifying header checksums and physical bounds; stops at
    the end-of-archive zero block."""
    pos, n = 0, len(data)
    while True:
        if pos + _BLOCK > n:
            raise ValueError(f"truncated tar header at offset {pos}")
        hdr = data[pos:pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            return
        stored = _read_octal(hdr[148:156])
        computed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != computed:
            raise ValueError(
                f"tar header checksum mismatch at offset {pos}"
            )
        size = _read_octal(hdr[124:136])
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
        if prefix:
            name = f"{prefix}/{name}"
        body_start = pos + _BLOCK
        body_end = body_start + size
        if body_end > n:
            raise ValueError(f"tar member {name!r} overruns the shard")
        typeflag = hdr[156:157]
        pos = body_end + ((-size) % _BLOCK)
        if typeflag in (b"0", b"\x00"):  # regular file (old tars use NUL)
            yield name, data[body_start:body_end]
        # directories / links / pax headers are walked over, not yielded


def iter_wds_samples(
    data: bytes,
) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Group a shard's members into WebDataset samples:
    ``(key, {ext: payload})`` per run of adjacent members sharing the
    key — the member path up to the FIRST dot of the basename, so
    ``d/x.seg.png`` is key ``d/x`` with ext ``seg.png`` (real
    WebDataset keys include the directory, and two samples in
    different directories sharing a basename are distinct; ADVICE r6).
    Enforces adjacency — a key that reappears later in the shard
    raises."""
    seen: set[str] = set()
    cur_key: str | None = None
    cur: dict[str, bytes] = {}
    for name, payload in iter_tar_members(data):
        dirpart, _, base = name.rpartition("/")
        stem, dot, ext = base.partition(".")
        if not dot:
            raise ValueError(f"member {name!r} has no extension")
        key = f"{dirpart}/{stem}" if dirpart else stem
        if key != cur_key:
            if cur_key is not None:
                yield cur_key, cur
            if key in seen:
                raise ValueError(
                    f"sample key {key!r} reappears non-adjacently"
                )
            seen.add(key)
            cur_key, cur = key, {}
        if ext in cur:
            raise ValueError(f"duplicate extension {ext!r} in {key!r}")
        cur[ext] = payload
    if cur_key is not None:
        yield cur_key, cur
