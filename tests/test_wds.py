"""WebDataset tar shard build/parse tests (q198's machinery).

The load-bearing guarantee is INTEROP: our ustar writer and walker
are built from the spec, so stdlib ``tarfile`` must read our shards
and we must read ``tarfile``-written shards — that is the wild-file
test no generative fixture can fake.
"""

from __future__ import annotations

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.sources.wds import (
    iter_tar_members,
    iter_wds_samples,
    tar_build_shard,
    tar_member,
    wds_build_shard,
)


def test_round_trip_padding_edges_and_empty():
    members = [
        ("a.bin", b""),
        ("b.bin", b"x" * 511),
        ("c.bin", b"y" * 512),
        ("d.bin", b"z" * 513),
        ("e.bin", bytes(range(256)) * 5),
    ]
    shard = tar_build_shard(members)
    assert len(shard) % 512 == 0
    assert list(iter_tar_members(shard)) == members


def test_stdlib_tarfile_reads_our_shards():
    members = [("k1.txt", b"hello"), ("k1.json", b"{}"),
               ("k2.txt", b"\x00\xff binary \r\n\r\n")]
    shard = tar_build_shard(members)
    with tarfile.open(fileobj=io.BytesIO(shard)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


def test_we_read_stdlib_tarfile_shards():
    buf = io.BytesIO()
    members = [("s/000001.txt", b"alpha"), ("s/000001.json", b'{"a":1}'),
               ("s/000002.txt", b"beta" * 200)]
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    got = list(iter_tar_members(buf.getvalue()))
    assert got == members
    samples = dict(iter_wds_samples(buf.getvalue()))
    # keys carry the directory (real WebDataset key semantics)
    assert samples["s/000001"] == {"txt": b"alpha", "json": b'{"a":1}'}


def test_long_names_via_prefix_field():
    deep = "a/" * 60 + "sample0001.txt"  # > 100 chars, needs prefix
    shard = tar_build_shard([(deep, b"deep")])
    assert list(iter_tar_members(shard)) == [(deep, b"deep")]
    with tarfile.open(fileobj=io.BytesIO(shard)) as tf:
        m = tf.getmembers()[0]
        assert m.name == deep and tf.extractfile(m).read() == b"deep"
    with pytest.raises(ValueError, match="too long"):
        tar_member("x" * 300, b"")


def test_checksum_corruption_and_truncation_raise():
    shard = bytearray(tar_build_shard([("k.txt", b"payload")]))
    shard[0] ^= 0x01  # corrupt the name -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        list(iter_tar_members(bytes(shard)))
    good = tar_build_shard([("k.txt", b"p" * 600)])
    with pytest.raises(ValueError, match="truncated|overruns"):
        list(iter_tar_members(good[: 512 + 300]))


def test_wds_grouping_contracts():
    # multi-dot extension: key is up to the FIRST dot
    shard = wds_build_shard([
        ("000001", [("img", b"I"), ("seg.png", b"S"), ("json", b"{}")]),
        ("000002", [("img", b"J")]),
    ])
    samples = list(iter_wds_samples(shard))
    assert samples[0] == ("000001", {"img": b"I", "seg.png": b"S",
                                     "json": b"{}"})
    assert samples[1] == ("000002", {"img": b"J"})

    # non-adjacent key reappearance is a corrupt shard
    bad = tar_build_shard([("a.x", b"1"), ("b.x", b"2"), ("a.y", b"3")])
    with pytest.raises(ValueError, match="non-adjacent"):
        list(iter_wds_samples(bad))
    # duplicate extension within one sample
    dup = tar_build_shard([("a.x", b"1"), ("a.x", b"2")])
    with pytest.raises(ValueError, match="duplicate extension"):
        list(iter_wds_samples(dup))
    # member with no extension can't join a sample
    noext = tar_build_shard([("plainname", b"1")])
    with pytest.raises(ValueError, match="no extension"):
        list(iter_wds_samples(noext))


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.tuples(
            st.integers(0, 10**9),
            st.lists(
                st.tuples(st.sampled_from(["txt", "json", "img", "cls"]),
                          st.binary(min_size=0, max_size=700)),
                min_size=1, max_size=4, unique_by=lambda t: t[0],
            ),
        ),
        min_size=1, max_size=6, unique_by=lambda s: s[0],
    )
)
def test_property_wds_round_trip(samples):
    keyed = [(f"{k:012d}", exts) for k, exts in samples]
    shard = wds_build_shard(keyed)
    got = list(iter_wds_samples(shard))
    assert got == [(k, dict(exts)) for k, exts in keyed]
    # and stdlib tarfile agrees member-for-member
    with tarfile.open(fileobj=io.BytesIO(shard)) as tf:
        names = [m.name for m in tf.getmembers()]
    assert names == [f"{k}.{e}" for k, exts in keyed for e, _ in exts]


def test_same_basename_in_different_dirs_are_distinct_samples():
    # real WebDataset keys include the directory: d1/s.txt and
    # d2/s.txt are two samples, not a non-adjacent reappearance
    shard = tar_build_shard([
        ("d1/s.txt", b"1"), ("d1/s.json", b"{}"), ("d2/s.txt", b"2"),
    ])
    samples = list(iter_wds_samples(shard))
    assert samples == [
        ("d1/s", {"txt": b"1", "json": b"{}"}),
        ("d2/s", {"txt": b"2"}),
    ]
    # the SAME dir+key reappearing non-adjacently still raises
    bad = tar_build_shard([
        ("d1/a.x", b"1"), ("d2/a.x", b"2"), ("d1/a.y", b"3"),
    ])
    with pytest.raises(ValueError, match="non-adjacent"):
        list(iter_wds_samples(bad))
