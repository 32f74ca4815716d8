"""Metrics registry + engine instrumentation (SURVEY.md §5)."""

import numpy as np

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
)
from avxwindowfmindex_tpu.utils import metrics


def test_counter_and_timer_accumulate():
    metrics.reset()
    metrics.counter("x").add(3)
    metrics.counter("x").inc()
    with metrics.timer("t"):
        pass
    snap = metrics.snapshot()
    assert snap["x"] == 4
    assert snap["t"] >= 0 and snap["t.calls"] == 1
    metrics.reset()
    assert metrics.snapshot() == {}


def test_disabled_via_env(monkeypatch):
    metrics.reset()
    monkeypatch.setenv("AWFM_METRICS", "0")
    metrics.counter("y").add(5)
    with metrics.timer("ty"):
        pass
    assert metrics.snapshot() == {}


def test_engine_counts_queries(rng):
    metrics.reset()
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=600))
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=4,
        kmer_length_in_seed_table=3,
        alphabet_type=AlphabetType.DNA,
    )
    engine = SearchEngine(create_index(seq, cfg))
    engine.count([b"ACG", b"TTT"])
    engine.locate([b"ACG"])
    snap = metrics.snapshot()
    assert snap["search.count.queries"] == 2
    assert snap["search.locate.queries"] == 1
    assert snap["search.count.seconds.calls"] == 1
    assert "search.locate.hits" in snap
    metrics.reset()
