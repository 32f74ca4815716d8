"""Double-step (digram) search parity tests.

The digram path must return bit-identical ranges/counts/hits to the
single-step engine on its fast path, and fall back transparently
elsewhere.
"""

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
)
from avxwindowfmindex_tpu.ops import digram as digram_ops
from avxwindowfmindex_tpu.search import DigramSearchEngine

from oracle import count_occurrences, random_kmer, random_sequence


def _cfg(k=3, ratio=4):
    return IndexConfiguration(
        suffix_array_compression_ratio=ratio,
        kmer_length_in_seed_table=k,
        alphabet_type=AlphabetType.DNA,
    )


def test_digram_codes_match_definition(rng):
    # BWT2[i] = pair of the two characters preceding suffix SA[i]
    from avxwindowfmindex_tpu.models import alphabet as alpha
    from oracle import suffix_array_naive

    seq = random_sequence(rng, 400, AlphabetType.DNA)
    index = create_index(seq, _cfg())
    codes, c2 = digram_ops.build_digram_host(index)
    sanitized = alpha.sanitize(np.frombuffer(seq, np.uint8), AlphabetType.DNA)
    full = bytes(sanitized) + b"$"
    sa = suffix_array_naive(full)
    lett = alpha.ascii_to_index(np.frombuffer(full, np.uint8), AlphabetType.DNA)
    for i in range(index.bwt_length):
        p = sa[i]
        if p < 2:
            assert codes[i] == digram_ops.DIRTY, i
        else:
            x, y = int(lett[p - 2]), int(lett[p - 1])
            want = x * 4 + y if (x < 4 and y < 4) else digram_ops.DIRTY
            assert codes[i] == want, (i, p, x, y)


def test_c2_is_two_mer_range_start(rng):
    seq = random_sequence(rng, 600, AlphabetType.DNA, clean=True)
    index = create_index(seq, _cfg(k=2))
    _, c2 = digram_ops.build_digram_host(index)
    # present 2-mers: c2 must equal the seed table's range start
    for x in range(4):
        for y in range(4):
            start, end = index.kmer_seed_table[x * 4 + y]
            if start <= end:
                assert c2[x * 4 + y] == start, (x, y)


@pytest.mark.parametrize("kmer_len", [4, 5, 9, 12])
def test_digram_counts_match_single_step(rng, kmer_len):
    for trial in range(3):
        n = int(rng.integers(300, 3000))
        seq = random_sequence(rng, n, AlphabetType.DNA)
        index = create_index(seq, _cfg())
        single = SearchEngine(index)
        double = DigramSearchEngine(index)
        kmers = [random_kmer(rng, kmer_len, AlphabetType.DNA) for _ in range(150)]
        np.testing.assert_array_equal(double.count(kmers), single.count(kmers))
        # also vs brute force
        for kmer, got in zip(kmers, double.count(kmers)):
            assert got == count_occurrences(seq, kmer, AlphabetType.DNA), kmer


def test_digram_locate_matches(rng):
    seq = random_sequence(rng, 1500, AlphabetType.DNA)
    index = create_index(seq, _cfg(ratio=3))
    single = SearchEngine(index)
    double = DigramSearchEngine(index)
    kmers = [random_kmer(rng, 6, AlphabetType.DNA) for _ in range(60)]
    got = double.locate(kmers)
    want = single.locate(kmers)
    for kmer, a, b in zip(kmers, got, want):
        np.testing.assert_array_equal(a, b, err_msg=repr(kmer))


def test_digram_fallback_paths(rng):
    seq = random_sequence(rng, 800, AlphabetType.DNA)
    index = create_index(seq, _cfg(k=4))
    single = SearchEngine(index)
    double = DigramSearchEngine(index)
    # mixed lengths -> fallback
    kmers = [b"ACGT", b"ACGTAC", b"GATTACA"]
    np.testing.assert_array_equal(double.count(kmers), single.count(kmers))
    # ambiguity chars -> fallback
    kmers = [b"ACGNT", b"ACGNT", b"ACGNT"]
    np.testing.assert_array_equal(double.count(kmers), single.count(kmers))
    # exactly seed-length -> pure seed lookup
    kmers = [b"ACGT", b"TTTT"]
    np.testing.assert_array_equal(double.count(kmers), single.count(kmers))


def test_digram_rejects_amino(rng):
    seq = random_sequence(rng, 200, AlphabetType.AMINO)
    cfg = IndexConfiguration(4, 2, AlphabetType.AMINO)
    index = create_index(seq, cfg)
    with pytest.raises(NotImplementedError):
        DigramSearchEngine(index)
