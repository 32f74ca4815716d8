"""Batch-API parity surface tests (awFmParallelSearch* + searchList shim)."""

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
    parallel_search_count,
    parallel_search_locate,
)
from avxwindowfmindex_tpu.parallel.api import create_kmer_search_list

from oracle import count_occurrences, random_kmer, random_sequence


@pytest.fixture
def built(rng):
    seq = random_sequence(rng, 1000, AlphabetType.DNA)
    return seq, create_index(seq, IndexConfiguration(4, 3, AlphabetType.DNA))


def test_parallel_search_count_and_locate(built, rng):
    seq, index = built
    kmers = [random_kmer(rng, 5, AlphabetType.DNA) for _ in range(40)]
    counts = parallel_search_count(index, kmers, num_threads=4)
    hits = parallel_search_locate(index, kmers, num_threads=4)
    for kmer, c, h in zip(kmers, counts, hits):
        assert c == count_occurrences(seq, kmer, AlphabetType.DNA)
        assert len(h) == c


def test_kmer_search_list_shim(built, rng):
    # reference usage pattern (AwFmIndex.h:330-346): allocate, fill,
    # search, read counts/position lists, reuse
    seq, index = built
    search_list = create_kmer_search_list(capacity=16)
    kmers = [random_kmer(rng, 4, AlphabetType.DNA) for _ in range(10)]
    search_list.set_kmers(kmers)
    assert search_list.count == 10

    search_list.search_count(index, num_threads=2)
    for i, kmer in enumerate(kmers):
        assert search_list.kmer_search_data[i].count == count_occurrences(
            seq, kmer, AlphabetType.DNA
        )

    search_list.search_locate(index)
    want = SearchEngine(index).locate(kmers)
    for i in range(10):
        np.testing.assert_array_equal(
            search_list.kmer_search_data[i].position_list, want[i]
        )

    # reuse with a different count (step 4 of the documented pattern)
    search_list.set_kmers(kmers[:3])
    search_list.search_count(index)
    assert search_list.count == 3

    with pytest.raises(ValueError):
        search_list.set_kmers([b"A"] * 17)  # beyond capacity


def test_parallel_api_empty_batch_noop(built):
    """The reference's loop over 0 entries is a no-op, not an error
    (unlike SearchEngine, which rejects empty batches)."""
    _, index = built
    assert parallel_search_count(index, []).shape == (0,)
    assert parallel_search_locate(index, []) == []
    sl = create_kmer_search_list(capacity=4)  # count=0 before first fill
    sl.search_count(index)
    sl.search_locate(index)


def test_engine_cache_is_bounded(rng):
    """The engine cache must not pin every index ever searched (an
    engine strong-refs its index, so an unbounded cache leaks host RAM
    and HBM)."""
    import avxwindowfmindex_tpu.parallel.api as api_mod

    cfg = IndexConfiguration(4, 3, AlphabetType.DNA)
    indexes = [
        create_index(random_sequence(rng, 400, AlphabetType.DNA), cfg)
        for _ in range(api_mod._ENGINE_CACHE_MAX + 3)
    ]
    for index in indexes:
        parallel_search_count(index, [b"ACGT"])
    assert len(api_mod._ENGINE_CACHE) <= api_mod._ENGINE_CACHE_MAX
    # the most recent index is still cached and its engine is reused
    eng = api_mod._engine_for(indexes[-1])
    assert api_mod._engine_for(indexes[-1]) is eng
