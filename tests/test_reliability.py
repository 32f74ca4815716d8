"""Failure-handling tests: deterministic shard retry + index reload."""

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
)
from avxwindowfmindex_tpu.parallel.reliability import (
    ReliableSearchEngine,
    RetryPolicy,
)

from oracle import random_kmer, random_sequence


class FlakyEngine(SearchEngine):
    """Fails the first N calls, then behaves normally."""

    failures_remaining = 0

    def count(self, kmers):
        if FlakyEngine.failures_remaining > 0:
            FlakyEngine.failures_remaining -= 1
            raise RuntimeError("injected fault")
        return super().count(kmers)

    def locate(self, kmers):
        if FlakyEngine.failures_remaining > 0:
            FlakyEngine.failures_remaining -= 1
            raise RuntimeError("injected fault")
        return super().locate(kmers)


@pytest.fixture(autouse=True)
def _reset_flaky_state():
    FlakyEngine.failures_remaining = 0
    yield
    FlakyEngine.failures_remaining = 0


@pytest.fixture
def built(rng, tmp_path):
    seq = random_sequence(rng, 1200, AlphabetType.DNA)
    cfg = IndexConfiguration(4, 3, AlphabetType.DNA)
    path = str(tmp_path / "r.awfmi")
    return seq, create_index(seq, cfg, file_src=path)


def test_retry_recovers_and_matches(built, rng):
    seq, index = built
    kmers = [random_kmer(rng, 5, AlphabetType.DNA) for _ in range(300)]
    want = SearchEngine(index).count(kmers)

    FlakyEngine.failures_remaining = 2
    eng = ReliableSearchEngine(
        index, shard_size=100,
        policy=RetryPolicy(max_attempts=3, backoff_seconds=0.0),
        engine_factory=FlakyEngine,
    )
    got = eng.count(kmers)
    np.testing.assert_array_equal(got, want)
    assert eng.stats["retries"] == 2
    assert eng.stats["reloads"] == 2  # reload path exercised


def test_retry_exhaustion_raises(built, rng):
    seq, index = built
    FlakyEngine.failures_remaining = 99
    eng = ReliableSearchEngine(
        index, shard_size=100,
        policy=RetryPolicy(max_attempts=2, backoff_seconds=0.0,
                           reload_index_on_failure=False),
        engine_factory=FlakyEngine,
    )
    with pytest.raises(RuntimeError, match="injected fault"):
        eng.count([b"ACGT"] * 10)


def test_locate_through_retry(built, rng):
    seq, index = built
    kmers = [random_kmer(rng, 4, AlphabetType.DNA) for _ in range(50)]
    want = SearchEngine(index).locate(kmers)
    FlakyEngine.failures_remaining = 1
    eng = ReliableSearchEngine(
        index, shard_size=25,
        policy=RetryPolicy(max_attempts=2, backoff_seconds=0.0),
        engine_factory=FlakyEngine,
    )
    got = eng.locate(kmers)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_empty_kmer_list(built):
    seq, index = built
    eng = ReliableSearchEngine(index)
    assert len(eng.count([])) == 0
    assert eng.locate([]) == []
