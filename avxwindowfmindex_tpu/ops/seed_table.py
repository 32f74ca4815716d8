"""Vectorized k-mer seed-table construction.

The reference fills all |A|^k memoized ranges with a depth-first
recursion, one backward step per tree edge (AwFmCreate.c:407-450). The
TPU build performs the identical recurrence breadth-first and batched:
at depth d it holds the |A|^d ranges of all d-length suffixes and
extends every one of them by every letter in a single batched backward
step, producing |A|^(d+1) ranges with the index arithmetic

    new_index = letter * |A|^d + old_index

which matches the reference's ``currentKmerIndex + letter * multiplier``
(AwFmCreate.c:444-445); the final leaf values are bit-identical,
including the not-canonical (startPtr > endPtr) values stored for absent
kmers, because the builder — like the reference DFS — steps ranges
unconditionally, without a validity check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import rank as rank_ops

_CHUNK = 1 << 19  # ranges stepped per device dispatch at large depths


@functools.partial(jax.jit, static_argnames=("card",))
def _extend_all_letters(letters, milestones, prefix_sums, start, end, *, card):
    """Step each of N ranges by every letter: returns (card*N,) arrays
    ordered letter-major (new_index = letter * N + old_index)."""
    n = start.shape[0]
    start_t = jnp.tile(start, card)
    end_t = jnp.tile(end, card)
    letts = jnp.repeat(jnp.arange(card, dtype=jnp.int32), n)
    return rank_ops.backward_step(
        letters, milestones, prefix_sums, start_t, end_t, letts,
        active=None, check_valid=False,
    )


@functools.partial(jax.jit, static_argnames=("card",))
def _extend_chunk(letters, milestones, prefix_sums, start, end, lett_value, *, card):
    """Step a fixed-size chunk of ranges by one letter (large depths)."""
    letts = jnp.full(start.shape, lett_value, dtype=jnp.int32)
    return rank_ops.backward_step(
        letters, milestones, prefix_sums, start, end, letts,
        active=None, check_valid=False,
    )


def build_seed_table(
    letters, milestones, prefix_sums, cardinality: int, k: int
) -> np.ndarray:
    """Compute the (|A|^k, 2) uint64 seed table on device.

    Depth-1 ranges come straight from the prefix sums
    (AwFmCreate.c:410-413): table1[i] = [C[i], C[i+1]-1].
    """
    ps = np.asarray(prefix_sums, dtype=np.uint64)
    start = ps[:cardinality].astype(np.uint32)
    end = (ps[1 : cardinality + 1] - 1).astype(np.uint32)

    for _depth in range(1, k):
        n = len(start)
        if cardinality * n <= _CHUNK:
            s, e = _extend_all_letters(
                letters, milestones, prefix_sums,
                jnp.asarray(start), jnp.asarray(end), card=cardinality,
            )
            start = np.asarray(s)
            end = np.asarray(e)
        else:
            new_start = np.empty(cardinality * n, dtype=np.uint32)
            new_end = np.empty(cardinality * n, dtype=np.uint32)
            for lett in range(cardinality):
                for lo in range(0, n, _CHUNK):
                    hi = min(lo + _CHUNK, n)
                    pad = _CHUNK - (hi - lo)
                    s_in = np.pad(start[lo:hi], (0, pad), constant_values=1)
                    e_in = np.pad(end[lo:hi], (0, pad))
                    s, e = _extend_chunk(
                        letters, milestones, prefix_sums,
                        jnp.asarray(s_in), jnp.asarray(e_in),
                        np.int32(lett), card=cardinality,
                    )
                    new_start[lett * n + lo : lett * n + hi] = np.asarray(
                        s[: hi - lo]
                    )
                    new_end[lett * n + lo : lett * n + hi] = np.asarray(e[: hi - lo])
            start, end = new_start, new_end

    return np.stack(
        [start.astype(np.uint64), end.astype(np.uint64)], axis=1
    )
