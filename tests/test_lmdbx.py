"""Direct tests of the from-scratch LMDB v1 format engine.

lmdbx writes real LMDB data files (bottom-up bulk build: leaf pages,
branch levels, overflow pages, dual meta pages) and reads them through an
mmap B+tree walker — the layer every features/CC reader sits on. These
tests hammer the format edges the dataset fixtures never reach: values
spanning overflow pages, enough keys to force multi-level branch pages,
empty values, binary keys, missing-key probes around every leaf boundary,
and both subdir/file layouts.
"""

import os
import random

import pytest

from volta_tpu.data import lmdbx


def roundtrip(tmp, items, **kw):
    path = os.path.join(tmp, "t.mdb")
    lmdbx.write(path, items, **kw)
    return lmdbx.open_env(path)


def test_roundtrip_small(tmp_path):
    items = [(f"k{i:03d}".encode(), f"value-{i}".encode())
             for i in range(10)]
    with roundtrip(str(tmp_path), items) as env:
        assert env.keys() == [k for k, _ in items]
        for k, v in items:
            assert env.get(k) == v
        assert env.get(b"missing") is None
        assert dict(env.items()) == dict(items)


def test_empty_and_binary_values(tmp_path):
    items = [(b"\x00\x01key", b""), (b"\xff\xfe", b"\x00" * 37),
             (b"mid", bytes(range(256)))]
    with roundtrip(str(tmp_path), items) as env:
        for k, v in items:
            assert env.get(k) == v


def test_overflow_values(tmp_path):
    rng = random.Random(0)
    # straddle every interesting size: inline max, one overflow page,
    # page-boundary +/- 1, multi-page
    psize = 4096
    sizes = [1, 100, (psize - 16) // 2 - 16, (psize - 16) // 2 - 15,
             psize - 17, psize - 16, psize - 15, psize, 3 * psize + 5,
             257 * 1024]
    items = [(f"size{s:08d}".encode(),
              bytes(rng.getrandbits(8) for _ in range(min(s, 4096))) *
              (s // min(s, 4096)) +
              bytes(rng.getrandbits(8) for _ in range(s % min(s, 4096))))
             for s in sizes]
    items = [(k, v[:s]) for (k, v), s in zip(items, sizes)]
    with roundtrip(str(tmp_path), items, psize=psize) as env:
        for (k, v), s in zip(items, sizes):
            got = env.get(k)
            assert got is not None and len(got) == s, (k, s)
            assert got == v
        assert len(env.keys()) == len(items)


def test_many_keys_multilevel_branches(tmp_path):
    rng = random.Random(1)
    n = 5000  # enough leaves to need >1 branch level at psize 4096
    items = [(f"{rng.random():.12f}-{i}".encode(),
              f"payload-{i}".encode() * (i % 7 + 1)) for i in range(n)]
    with roundtrip(str(tmp_path), items) as env:
        expect = sorted(items)
        assert list(env.items()) == expect
        # point lookups across leaf boundaries + misses adjacent to hits
        for k, v in expect[:: 97]:
            assert env.get(k) == v
            assert env.get(k + b"\x00") is None
            assert env.get(k[:-1]) in (None, env.get(k[:-1]))


def test_subdir_layout(tmp_path):
    d = os.path.join(str(tmp_path), "feats.lmdb")
    items = [(b"a", b"1"), (b"b", b"2")]
    lmdbx.write(d, items, subdir=True)
    assert os.path.exists(os.path.join(d, "data.mdb"))
    with lmdbx.open_env(d) as env:
        assert env.get(b"b") == b"2"


def test_nonbytes_keys_values_coerced(tmp_path):
    with roundtrip(str(tmp_path), [(7, bytearray(b"x")),
                                   ("s", memoryview(b"y"))]) as env:
        assert env.get(b"7") == b"x"
        assert env.get(b"s") == b"y"


def test_empty_db(tmp_path):
    with roundtrip(str(tmp_path), []) as env:
        assert env.keys() == []
        assert env.get(b"anything") is None


@pytest.mark.parametrize("psize", [4096, 8192])
def test_page_sizes(tmp_path, psize):
    items = [(f"{i:05d}".encode(), b"v" * (i % 300)) for i in range(800)]
    with roundtrip(str(tmp_path), items, psize=psize) as env:
        assert list(env.items()) == items


def test_int_keys_sorted_in_byte_order(tmp_path):
    """Regression: keys must be coerced to bytes BEFORE sorting — int keys
    2 < 10 natively but b"10" < b"2" in the byte order the reader's binary
    search assumes."""
    items = [(i, f"v{i}".encode()) for i in (2, 10, 1, 100, 20, 3)]
    with roundtrip(str(tmp_path), items) as env:
        for i, v in items:
            assert env.get(str(i).encode()) == v
        assert env.keys() == sorted(str(i).encode() for i, _ in items)
