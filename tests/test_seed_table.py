"""Seed-table parity (model: test/kmerSeedTableTests/kmerSeedTableTests.c).

Every one of the |A|^k memoized ranges is checked against brute force,
and against the ranges the live (unseeded) search computes.
"""

import itertools

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
    find_search_range_for_string,
)

from oracle import count_occurrences, random_sequence


@pytest.mark.parametrize(
    "alphabet,letters,k",
    [
        (AlphabetType.DNA, "acgt", 3),
        (AlphabetType.DNA, "acgt", 4),
        (AlphabetType.AMINO, "acdefghiklmnpqrstvwy", 2),
    ],
)
def test_every_memoized_range(rng, alphabet, letters, k):
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=4,
        kmer_length_in_seed_table=k,
        alphabet_type=alphabet,
    )
    seq = random_sequence(rng, 3000, alphabet)
    index = create_index(seq, cfg)
    card = len(letters)
    assert index.kmer_seed_table.shape == (card**k, 2)

    for digits in itertools.product(range(card), repeat=k):
        # lookup index: leftmost letter most significant (AwFmKmerTable.c:21-51)
        table_idx = 0
        for d in digits:
            table_idx = table_idx * card + d
        kmer = "".join(letters[d] for d in digits).encode()
        start, end = index.kmer_seed_table[table_idx]
        want = count_occurrences(seq, kmer, alphabet)
        got = int(end - start + 1) if start <= end else 0
        assert got == want, (kmer, start, end, want)
        # when present, the memoized range must equal the live search range
        if want > 0:
            s2, e2 = find_search_range_for_string(index, kmer)
            assert (int(start), int(end)) == (s2, e2), kmer


def test_seed_table_values_match_unseeded_dfs_semantics(rng):
    # absent kmers store the stepped-through (invalid) range rather than a
    # canonical empty marker; stepping them further must keep them invalid
    seq = b"AAAACCCCGGGG"  # no 'T' anywhere
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=2,
        kmer_length_in_seed_table=2,
        alphabet_type=AlphabetType.DNA,
    )
    index = create_index(seq, cfg)
    engine = SearchEngine(index)
    # TT absent: the stored range must be invalid
    tt = index.kmer_seed_table[3 * 4 + 3]
    assert tt[0] > tt[1]
    assert engine.count([b"TT", b"TTT", b"ATT"]).tolist() == [0, 0, 0]
