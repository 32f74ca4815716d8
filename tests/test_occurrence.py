"""Rank-primitive property tests (model: test/occurrenceTests).

The reference tests AwFmMaskedVectorPopcount against counted bits on
known patterns and 20,000 random vectors; here the device occurrence op
is checked against a cumulative-count oracle over random BWTs, for both
alphabets, including the inclusive-mask boundary cases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
from avxwindowfmindex_tpu.ops import rank as rank_ops

from oracle import random_sequence


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_occurrence_matches_cumulative_counts(rng, alphabet):
    seq = random_sequence(rng, 2000, alphabet)
    cfg = IndexConfiguration(4, 2, alphabet)
    index = create_index(seq, cfg)
    dev = index.to_device()
    bwt = index.bwt_letters.astype(np.int64)

    n = index.bwt_length
    positions = np.concatenate([
        rng.integers(0, n, size=500),
        # inclusive-mask boundaries: block edges, byte edges, bit 7
        np.array([0, 7, 8, 255 % n, min(256, n - 1), n - 1]),
    ]).astype(np.uint32)
    for lett in range(index.cardinality + 1):
        ll = np.full(len(positions), lett, dtype=np.int32)
        got = np.asarray(
            rank_ops.occurrence(dev, jnp.asarray(positions), jnp.asarray(ll))
        )
        cum = np.cumsum(bwt == lett)
        want = cum[positions.astype(np.int64)]
        np.testing.assert_array_equal(got, want, err_msg=f"letter {lett}")


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_letter_and_lf_matches_host(rng, alphabet):
    seq = random_sequence(rng, 1500, alphabet)
    index = create_index(seq, IndexConfiguration(4, 2, alphabet))
    dev = index.to_device()
    bwt = index.bwt_letters.astype(np.int64)
    ps = index.prefix_sums.astype(np.int64)
    n = index.bwt_length
    positions = rng.integers(0, n, size=400).astype(np.uint32)
    lett, lf = rank_ops.letter_and_lf_at(dev, jnp.asarray(positions))
    lett = np.asarray(lett)
    lf = np.asarray(lf)
    for p, l, f in zip(positions, lett, lf):
        assert l == bwt[p]
        if l == index.sentinel_index:
            assert f == 0
        else:
            want = ps[l] + np.sum(bwt[: p + 1] == l) - 1
            assert f == want, (p, l)
