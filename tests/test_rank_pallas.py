"""Pallas masked-popcount rank kernel parity (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
from avxwindowfmindex_tpu.ops import rank as rank_ops
from avxwindowfmindex_tpu.ops import rank_pallas

from oracle import random_sequence


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_pallas_rank_matches_reference(rng, alphabet):
    seq = random_sequence(rng, 1800, alphabet)
    index = create_index(seq, IndexConfiguration(4, 2, alphabet))
    dev = index.to_device()
    n = index.bwt_length
    positions = jnp.asarray(
        np.concatenate([
            rng.integers(0, n, size=300),
            np.array([0, 7, 8, 255 % n, n - 1]),
        ]).astype(np.uint32)
    )
    for lett in range(index.cardinality + 1):
        ll = jnp.asarray(np.full(positions.shape[0], lett, dtype=np.int32))
        want = np.asarray(rank_ops.occurrence(dev, positions, ll))
        got = np.asarray(
            rank_pallas.occurrence(dev, positions, ll, interpret=True)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"letter {lett}")


def test_pallas_rank_non_tile_batch(rng):
    # batch not a multiple of the kernel tile
    seq = random_sequence(rng, 900, AlphabetType.DNA)
    index = create_index(seq, IndexConfiguration(4, 2, AlphabetType.DNA))
    dev = index.to_device()
    positions = jnp.asarray(
        rng.integers(0, index.bwt_length, size=77).astype(np.uint32)
    )
    ll = jnp.asarray(np.zeros(77, dtype=np.int32))
    want = np.asarray(rank_ops.occurrence(dev, positions, ll))
    got = np.asarray(rank_pallas.occurrence(dev, positions, ll, interpret=True))
    np.testing.assert_array_equal(got, want)
