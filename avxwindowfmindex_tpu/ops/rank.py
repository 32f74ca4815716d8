"""Occurrence (rank) primitives — the roofline-critical inner op.

The reference computes rank with AVX2 bit-plane AND/ANDNOT + masked
popcount (AwFmOccurrence.c:8-135, AwFmSimdConfig.c:89-114):

    rank(l, pos) = milestones[pos/256, l]
                 + popcount_inclusive(match_bits(block, l), pos%256)

The TPU formulation keeps the same math but swaps the storage: the BWT is
a (num_blocks, 256) int8 array of letter indices, so the masked popcount
becomes a gather + vectorized compare + masked sum on the VPU — a layout
XLA tiles natively ((256,) = 2x128 lanes). The masked count is INCLUSIVE
of the query position, matching AwFmSimdConfig.c:91.

All functions are pure and shape-polymorphic over the batch dimension;
they are traced inside the jitted search/locate loops in search.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

POSITIONS_PER_BLOCK = 256
# numpy constant: folded into the trace, never a leaked tracer
_LOCAL_IOTA_NP = np.arange(POSITIONS_PER_BLOCK, dtype=np.int32)


def _local_iota():
    return _LOCAL_IOTA_NP


def occurrence(letters, milestones, positions, letter_indices):
    """Batched occ(l, pos), inclusive of pos.

    Args:
      letters:     (num_blocks, 256) int8 BWT letters.
      milestones:  (num_blocks, A+1) uint32 block-start counts.
      positions:   (B,) uint32 global BWT positions.
      letter_indices: (B,) int32 letter indices in [0, A] (A = ambiguity).
    Returns:
      (B,) uint32 occurrence counts (milestone + in-block inclusive count).
    """
    blk = (positions // POSITIONS_PER_BLOCK).astype(jnp.int32)
    local = (positions % POSITIONS_PER_BLOCK).astype(jnp.int32)
    rows = letters[blk]  # (B, 256) gather — the HBM-bound read
    ms = milestones[blk, letter_indices]
    match = (rows == letter_indices[:, None].astype(jnp.int8)) & (
        _local_iota()[None, :] <= local[:, None]
    )
    cnt = jnp.sum(match, axis=1, dtype=jnp.int32)
    return ms + cnt.astype(jnp.uint32)


def backward_step(
    letters, milestones, prefix_sums, start, end, letter_indices,
    active=None, check_valid=True,
):
    """One batched backward-search step (AwFmSearch.c:42-159).

    newStart = C[l] + occ(l, startPtr-1)
    newEnd   = C[l] + occ(l, endPtr) - 1

    With ``check_valid`` (the search path), only rows where
    ``active & (start <= end)`` are updated — this reproduces the
    reference's "stop stepping once the range is invalid" rule
    (AwFmSearch.c:342-356) as a total, maskable operation. The seed-table
    builder steps unconditionally (check_valid=False), matching the DFS in
    AwFmCreate.c:434-442 which extends even already-empty ranges.
    """
    b = start.shape[0]
    c = prefix_sums[letter_indices]
    pos = jnp.concatenate([start - jnp.uint32(1), end])
    ll = jnp.concatenate([letter_indices, letter_indices])
    occ = occurrence(letters, milestones, pos, ll)
    new_start = c + occ[:b]
    new_end = c + occ[b:] - jnp.uint32(1)
    keep = None
    if check_valid:
        keep = start <= end
    if active is not None:
        keep = active if keep is None else (active & keep)
    if keep is None:
        return new_start, new_end
    return jnp.where(keep, new_start, start), jnp.where(keep, new_end, end)


def letter_and_lf_at(letters, milestones, prefix_sums, positions, *, cardinality, sentinel):
    """Read the BWT letter at each position and compute its LF mapping.

    Mirrors awFmNucleotideBacktraceBwtPosition / amino variant
    (AwFmSearch.c:369-427): LF(p) = C[l] + occ(l, p) - 1 with l the letter
    at p; a sentinel letter maps to position 0.

    Returns (letter_indices, lf_positions) — both (B,).
    """
    blk = (positions // POSITIONS_PER_BLOCK).astype(jnp.int32)
    local = (positions % POSITIONS_PER_BLOCK).astype(jnp.int32)
    rows = letters[blk]  # (B, 256)
    lett = jnp.take_along_axis(rows, local[:, None], axis=1)[:, 0].astype(jnp.int32)
    is_sentinel = lett == sentinel
    # clamp the sentinel for the gathers below; its result is overridden.
    lclip = jnp.minimum(lett, cardinality)
    ms = milestones[blk, lclip]
    match = (rows == lclip[:, None].astype(jnp.int8)) & (
        _local_iota()[None, :] <= local[:, None]
    )
    occ = ms + jnp.sum(match, axis=1, dtype=jnp.int32).astype(jnp.uint32)
    lf = prefix_sums[lclip] + occ - jnp.uint32(1)
    lf = jnp.where(is_sentinel, jnp.uint32(0), lf)
    return lett, lf
