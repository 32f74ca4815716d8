"""Suffix-array construction and bit-packing tests.

Models: test/suffixArrayCompressionTests/saTest.c (packing roundtrip for
every length, expected bit widths) and the createTests divsufsort smoke.
"""

import numpy as np
import pytest

from avxwindowfmindex_tpu import suffix_array as sa_mod

from oracle import random_sequence, suffix_array_naive
from avxwindowfmindex_tpu.models.config import AlphabetType


def test_numpy_suffix_array_vs_naive(rng):
    for _ in range(20):
        n = int(rng.integers(2, 400))
        seq = random_sequence(rng, n, AlphabetType.DNA) + b"$"
        arr = np.frombuffer(seq, dtype=np.uint8)
        got = sa_mod.build_suffix_array_numpy(arr)
        want = suffix_array_naive(seq)
        np.testing.assert_array_equal(got, want)


def test_numpy_suffix_array_degenerate():
    # all-equal letters stress the doubling ranks
    seq = b"a" * 257 + b"$"
    got = sa_mod.build_suffix_array_numpy(np.frombuffer(seq, dtype=np.uint8))
    want = suffix_array_naive(seq)
    np.testing.assert_array_equal(got, want)


def test_value_min_bit_width():
    # width = 64 - clzll(saLength - 1) (AwFmSuffixArray.c:12-18)
    assert sa_mod.value_min_bit_width(2) == 1
    assert sa_mod.value_min_bit_width(3) == 2
    assert sa_mod.value_min_bit_width(256) == 8
    assert sa_mod.value_min_bit_width(257) == 9
    assert sa_mod.value_min_bit_width(1025) == 11


def test_pack_unpack_roundtrip_every_length(rng):
    # saTest.c:28-50 — every SA length 4..1024, shuffled values
    for n in range(4, 1025, 7):
        vals = rng.permutation(n).astype(np.uint64)
        width = sa_mod.value_min_bit_width(n)
        packed = sa_mod.pack_values(vals, width)
        got = sa_mod.unpack_values(packed, width, n)
        np.testing.assert_array_equal(got, vals)


def test_packed_offset_matches_reference_formula():
    # AwFmSuffixArray.c:22-39: grouped-by-8 formula == flat bit offset
    for width in (1, 5, 8, 11, 23, 33, 57, 63, 64):
        for idx in (0, 1, 7, 8, 9, 100):
            byte_off, bit_off = sa_mod.packed_offset(width, idx)
            aligned = (idx // 8) * width
            ending_bits = (idx % 8) * width
            assert byte_off == aligned + ending_bits // 8
            assert bit_off == ending_bits % 8


def test_read_packed_value(rng):
    n = 333
    vals = rng.integers(0, n, size=n).astype(np.uint64)
    width = sa_mod.value_min_bit_width(n)
    packed = np.concatenate(
        [sa_mod.pack_values(vals, width), np.zeros(8, np.uint8)]
    )
    for idx in [0, 1, 7, 8, 100, n - 1]:
        assert sa_mod.read_packed_value(packed, width, idx) == vals[idx]


def test_pack_sampled_sa(rng):
    sa_len = 1000
    ratio = 8
    full = rng.permutation(sa_len).astype(np.uint64)
    packed, width = sa_mod.pack_sampled_sa(full, sa_len, ratio)
    assert len(packed) == sa_mod.compressed_sa_size_in_bytes(sa_len, ratio)
    n_samples = (sa_len + ratio - 1) // ratio
    got = sa_mod.unpack_values(packed, width, n_samples)
    np.testing.assert_array_equal(got, full[::ratio])


def test_wide_values_64bit():
    vals = np.array([2**63 + 5, 2**64 - 1, 0, 12345], dtype=np.uint64)
    packed = sa_mod.pack_values(vals, 64)
    got = sa_mod.unpack_values(packed, 64, 4)
    np.testing.assert_array_equal(got, vals)
    padded = np.concatenate([packed, np.zeros(8, np.uint8)])
    for i in range(4):
        assert sa_mod.read_packed_value(padded, 64, i) == vals[i]


def test_pack_unpack_chunked_boundaries(monkeypatch):
    """pack/unpack are chunked (the whole-array bit matrix is ~100 GB at
    hg38 scale); chunk seams must be byte-exact for every width."""
    import avxwindowfmindex_tpu.suffix_array as sa_mod

    rng = np.random.default_rng(33)
    monkeypatch.setattr(sa_mod, "_PACK_CHUNK", 64)  # tiny chunks
    for width in (1, 5, 8, 17, 32, 33, 64):
        n = 613  # not a multiple of any chunk size
        vals = rng.integers(0, 2 ** min(width, 63), size=n, dtype=np.uint64)
        packed_chunked = sa_mod.pack_values(vals, width)
        monkeypatch.setattr(sa_mod, "_PACK_CHUNK", 1 << 23)
        packed_whole = sa_mod.pack_values(vals, width)
        np.testing.assert_array_equal(packed_chunked, packed_whole)
        monkeypatch.setattr(sa_mod, "_PACK_CHUNK", 64)
        out = sa_mod.unpack_values(packed_chunked, width, n)
        np.testing.assert_array_equal(out, vals)
    # empty input round-trips
    assert len(sa_mod.pack_values(np.zeros(0, np.uint64), 32)) == 0
    assert len(sa_mod.unpack_values(np.zeros(0, np.uint8), 32, 0)) == 0
