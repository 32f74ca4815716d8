"""Double-step (digram) backward search — 2 letters per rank step.

The search throughput ceiling on TPU is the random block-row gather
rate (ops/rank.py); rows per query is the only real lever. This module
builds a SECOND windowed BWT over the *pair of characters preceding
each suffix* so one gather extends the pattern by TWO letters:

    BWT2[i] = (T[SA[i]-2], T[SA[i]-1])
    range(xyP) = [ C2[xy] + occ2_incl(xy, start-1),
                   C2[xy] + occ2_incl(xy, end) - 1 ]

which equals the composition of two single-letter steps (LF applied
twice) — the classical k-step FM-index construction. Measured on TPU
v5e, the digram's 256-byte row gathers at only ~1.19x the cost of the
single-step 128-byte row, so halving the step count nets ~1.6x.

Pair symbol space (nucleotide only): the 16 clean pairs (x, y in
0..3) encode as v = 4x + y; any pair touching the sentinel or the
ambiguity letter encodes as DIRTY (16) and can never match a clean
query pair. 17 symbols -> 5 bit-planes; block row = 5 x 32 B planes +
16 x u32 pair milestones = 224 B, padded to 256 B (2 x 128 uint8
lanes).

The digram BWT is derived from the single-letter index alone (no suffix
array needed): x = BWT1[LF(i)], y = BWT1[i], with LF computed in one
vectorized host pass.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models import alphabet as alpha
from ..models.config import AlphabetType
from ..models.index import FmIndex, POSITIONS_PER_BLOCK, num_blocks_from_bwt_length

DIRTY = 16
_N_PLANES = 5
_MS_OFFSET = _N_PLANES * 32  # 160
ROW_BYTES = 256
_BYTE_IOTA = np.arange(32, dtype=np.int32)


@dataclasses.dataclass
class DigramIndex:
    """Device arrays for the double-step path (registered pytree)."""

    packed2: object  # (num_blocks, 256) uint8: 5 planes + 16 u32 milestones
    c2: object  # (16,) uint32: range start of each 2-mer


jax.tree_util.register_dataclass(
    DigramIndex, data_fields=["packed2", "c2"], meta_fields=[]
)


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def build_digram_host(index: FmIndex):
    """(pair_codes, c2) from the single-letter index via vectorized LF.

    LF(i) = C[l] + rank_incl(l, i) - 1; the j-th occurrence (0-based,
    in BWT order) of letter l maps to C[l] + j. Sentinel positions map
    to 0 but their pairs are DIRTY anyway.
    """
    if index.alphabet == AlphabetType.AMINO:
        raise NotImplementedError("digram stepping is nucleotide-only")
    bwt = index.bwt_letters.astype(np.int64)
    n = index.bwt_length
    ps = index.prefix_sums.astype(np.int64)
    sentinel = index.sentinel_index

    counts = np.bincount(bwt, minlength=sentinel + 1)
    order = np.argsort(bwt, kind="stable")
    lf = np.zeros(n, dtype=np.int64)
    group_start = 0
    for lett in range(sentinel + 1):
        grp = order[group_start : group_start + counts[lett]]
        if lett == sentinel:
            lf[grp] = 0
        else:
            lf[grp] = ps[lett] + np.arange(counts[lett], dtype=np.int64)
        group_start += counts[lett]

    y = bwt
    x = bwt[lf]
    clean = (x < 4) & (y < 4)
    codes = np.where(clean, x * 4 + y, DIRTY).astype(np.uint8)

    # C2[4x+y] = C[x] + occ_incl(x, C[y] - 1): the start of "xy"'s range,
    # i.e. one backward step with x from the start of "y"'s range.
    c2 = np.empty(16, dtype=np.uint64)
    letter_positions = [np.flatnonzero(bwt == l) for l in range(4)]
    for xx in range(4):
        for yy in range(4):
            occ = np.searchsorted(letter_positions[xx], ps[yy] - 1, side="right")
            c2[xx * 4 + yy] = ps[xx] + occ
    return codes, c2


def pack_digram_blocks(codes: np.ndarray) -> np.ndarray:
    """Pair codes -> (num_blocks, 256) uint8 fused rows."""
    n = len(codes)
    nb = num_blocks_from_bwt_length(n)
    padded = np.full(nb * POSITIONS_PER_BLOCK, DIRTY, dtype=np.uint8)
    padded[:n] = codes

    out = np.zeros((nb, ROW_BYTES), dtype=np.uint8)
    for b in range(_N_PLANES):
        bits = ((padded >> b) & 1).reshape(nb, POSITIONS_PER_BLOCK)
        out[:, b * 32 : (b + 1) * 32] = np.packbits(
            bits, axis=1, bitorder="little"
        )
    # pair milestones: counts of each clean pair before block start
    blocks = np.arange(n) // POSITIONS_PER_BLOCK
    counts = np.bincount(
        blocks * 17 + codes.astype(np.int64), minlength=nb * 17
    ).reshape(nb, 17)[:, :16]
    cum = np.cumsum(counts, axis=0)
    milestones = np.zeros_like(cum)
    milestones[1:] = cum[:-1]
    out[:, _MS_OFFSET : _MS_OFFSET + 64] = (
        milestones.astype("<u4").view(np.uint8).reshape(nb, 64)
    )
    return out


def build_digram_device(index: FmIndex) -> DigramIndex:
    codes, c2 = build_digram_host(index)
    return DigramIndex(
        packed2=jnp.asarray(pack_digram_blocks(codes)),
        c2=jnp.asarray(c2.astype(np.uint32)),
    )


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------

def digram_occurrence(dig: DigramIndex, positions, x_letters, y_letters):
    """Batched occ2(xy, pos), inclusive. x/y in [0, 4)."""
    blk = (positions // POSITIONS_PER_BLOCK).astype(jnp.int32)
    local = (positions % POSITIONS_PER_BLOCK).astype(jnp.int32)
    rows = dig.packed2[blk]  # (B, 256) — the single 256-byte gather

    # plane masks straight from the pair bits: v = 4x+y = [y0 y1 x0 x1 0]
    full = jnp.uint8(0xFF)
    m = [
        (y_letters & 1).astype(jnp.uint8) * full,
        ((y_letters >> 1) & 1).astype(jnp.uint8) * full,
        (x_letters & 1).astype(jnp.uint8) * full,
        ((x_letters >> 1) & 1).astype(jnp.uint8) * full,
        jnp.zeros(x_letters.shape, jnp.uint8),  # plane 4 must be clear
    ]
    diff = None
    for i in range(_N_PLANES):
        p = rows[:, i * 32 : (i + 1) * 32] ^ m[i][:, None]
        diff = p if diff is None else (diff | p)
    match = ~diff

    byte_idx = (local >> 3)[:, None]
    bit_idx = (local & 7)[:, None].astype(jnp.uint8)
    low = (jnp.uint8(2) << bit_idx) - jnp.uint8(1)
    b = _BYTE_IOTA[None, :]
    mask = jnp.where(
        b < byte_idx, full, jnp.where(b == byte_idx, low, jnp.uint8(0))
    )
    cnt = jnp.sum(lax.population_count(match & mask), axis=1, dtype=jnp.int32)

    ms_all = lax.bitcast_convert_type(
        rows[:, _MS_OFFSET : _MS_OFFSET + 64].reshape(-1, 16, 4), jnp.uint32
    )
    v = (x_letters * 4 + y_letters).astype(jnp.int32)
    ms = jnp.zeros(v.shape, dtype=jnp.uint32)
    for j in range(16):
        ms = ms + jnp.where(v == j, ms_all[:, j], jnp.uint32(0))
    return ms + cnt.astype(jnp.uint32)


def digram_backward_step(dig: DigramIndex, start, end, x_letters, y_letters):
    """One double step: prepend the pair (x, y) to the current pattern.

    newStart = C2[xy] + occ2(xy, start-1); newEnd = C2[xy] + occ2(xy, end) - 1.
    Rows with an invalid range keep it (the reference's stop rule).
    """
    b = start.shape[0]
    v = (x_letters * 4 + y_letters).astype(jnp.int32)
    c2 = jnp.zeros(v.shape, dtype=jnp.uint32)
    for j in range(16):
        c2 = c2 + jnp.where(v == j, dig.c2[j], jnp.uint32(0))
    pos = jnp.concatenate([start - jnp.uint32(1), end])
    xx = jnp.concatenate([x_letters, x_letters])
    yy = jnp.concatenate([y_letters, y_letters])
    occ = digram_occurrence(dig, pos, xx, yy)
    new_start = c2 + occ[:b]
    new_end = c2 + occ[b:] - jnp.uint32(1)
    keep = start <= end
    return jnp.where(keep, new_start, start), jnp.where(keep, new_end, end)
