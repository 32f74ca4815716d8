"""SearchEngine API unit tests."""

import numpy as np


def test_encode_kmers_fast_path_matches_general(rng):
    from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
    from avxwindowfmindex_tpu.search import SearchEngine
    from oracle import random_kmer, random_sequence

    seq = random_sequence(rng, 600, AlphabetType.DNA)
    eng = SearchEngine(create_index(seq, IndexConfiguration(4, 3, AlphabetType.DNA)))
    kmers = [random_kmer(rng, 7, AlphabetType.DNA) for _ in range(37)]
    fast = eng.encode_kmers(kmers)  # uniform bytes -> vectorized path
    slow = eng.encode_kmers([k.decode() for k in kmers])  # str -> general
    np.testing.assert_array_equal(fast[0], slow[0])
    np.testing.assert_array_equal(fast[1], slow[1])
    assert fast[2] == slow[2] == 37
    # mixed lengths still go through the general path
    mixed = eng.encode_kmers(kmers + [kmers[0][:5]])
    assert mixed[2] == 38
    assert mixed[1][37] == 5
