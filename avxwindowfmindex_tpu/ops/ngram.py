"""n-step (n-gram) backward search — n letters per rank step.

Generalizes ops/digram.py to n in {2, 3}: a windowed BWT over the
n-gram of characters preceding each suffix lets one fused-row gather
extend the pattern by n letters (the classical k-step FM-index):

    BWTn[i] = T[SA[i]-n .. SA[i]-1]
    range(wP) = [ Cn[w] + occn_incl(w, start-1),
                  Cn[w] + occn_incl(w, end) - 1 ]        |w| = n

Row layouts (nucleotide only; clean symbols are the 4^n words over
ACGT, everything touching sentinel/ambiguity is DIRTY):

    n=2: 17 symbols, 5 planes x 32 B + 16 u32 milestones = 224 -> 256 B
    n=3: 65 symbols, 7 planes x 32 B + 64 u32 milestones = 480 -> 512 B

Measured on TPU v5e, row-gather cost grows far slower than row bytes
(128 B -> 256 B costs ~1.19x), so each extra letter per step is nearly
free bandwidth-wise; rows-per-query is the throughput lever.

The n-gram BWT derives from the single-letter index alone via n-1
applications of the vectorized LF mapping — no suffix array needed.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models.config import AlphabetType
from ..models.index import FmIndex, POSITIONS_PER_BLOCK, num_blocks_from_bwt_length

_BYTE_IOTA = np.arange(32, dtype=np.int32)


def _geometry(n: int):
    if n not in (2, 3):
        raise ValueError("n-gram stepping supports n in {2, 3}")
    n_words = 4**n
    dirty = n_words
    n_planes = (2 * n + 1)
    ms_offset = n_planes * 32
    row_bytes = ms_offset + n_words * 4
    row_bytes = ((row_bytes + 127) // 128) * 128
    return n_words, dirty, n_planes, ms_offset, row_bytes


@dataclasses.dataclass
class NgramIndex:
    """Device arrays for the n-step path (registered pytree)."""

    packed: object  # (num_blocks, row_bytes) uint8
    cn: object  # (4**n,) uint32: range start of each n-mer
    n: int  # static: letters per step


jax.tree_util.register_dataclass(
    NgramIndex, data_fields=["packed", "cn"], meta_fields=["n"]
)


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def _lf_array(index: FmIndex) -> np.ndarray:
    """Vectorized LF over all BWT positions (sentinel -> 0)."""
    bwt = index.bwt_letters.astype(np.int64)
    ps = index.prefix_sums.astype(np.int64)
    sentinel = index.sentinel_index
    lf = np.zeros(index.bwt_length, dtype=np.int64)
    # per-letter position lists replace a full stable argsort: same
    # grouping/order (flatnonzero is ascending) at O(n) per letter and a
    # fraction of the temporaries — the argsort dominated genome-scale
    # digram builds
    for lett in range(sentinel + 1):
        grp = np.flatnonzero(bwt == lett)
        if lett == sentinel:
            lf[grp] = 0
        else:
            lf[grp] = ps[lett] + np.arange(len(grp), dtype=np.int64)
    return lf


def build_ngram_host(index: FmIndex, n: int):
    """(codes, cn): the n-gram BWT codes and the n-mer range starts."""
    if index.alphabet == AlphabetType.AMINO:
        raise NotImplementedError("n-gram stepping is nucleotide-only")
    n_words, dirty, _, _, _ = _geometry(n)
    bwt = index.bwt_letters.astype(np.int64)
    ps = index.prefix_sums.astype(np.int64)

    lf = _lf_array(index)
    # letters[j] = T[SA[i] - 1 - j]: walk the LF chain n-1 times
    letters = [bwt]
    pos = np.arange(index.bwt_length, dtype=np.int64)
    for _ in range(n - 1):
        pos = lf[pos]
        letters.append(bwt[pos])
    # code = sum letters[j] * 4^j  (nearest preceding char least
    # significant), i.e. word value of T[SA[i]-n..SA[i]-1] base-4 with
    # the LEFTMOST character most significant.
    clean = np.ones(index.bwt_length, dtype=bool)
    code = np.zeros(index.bwt_length, dtype=np.int64)
    for j, lj in enumerate(letters):
        clean &= lj < 4
        code += lj * (4**j)
    codes = np.where(clean, code, dirty).astype(np.uint8)

    # Cn[w] = range start of the n-mer w: fold backward steps from the
    # (n-1)-mer starts. C1 = prefix sums.
    letter_positions = [np.flatnonzero(bwt == l) for l in range(4)]
    c_prev = ps[:4].astype(np.uint64)  # C1[y] = ps[y]
    for _depth in range(1, n):
        c_new = np.empty(4 * len(c_prev), dtype=np.uint64)
        for x in range(4):
            occ = np.searchsorted(
                letter_positions[x], c_prev.astype(np.int64) - 1, side="right"
            )
            # new word = x * 4^depth + suffix-word (x most significant)
            c_new[x * len(c_prev) : (x + 1) * len(c_prev)] = ps[x] + occ
        c_prev = c_new
    return codes, c_prev


def pack_ngram_blocks(codes: np.ndarray, n: int) -> np.ndarray:
    """n-gram codes -> (num_blocks, row_bytes) uint8 fused rows."""
    n_words, dirty, n_planes, ms_offset, row_bytes = _geometry(n)
    length = len(codes)
    nb = num_blocks_from_bwt_length(length)
    padded = np.full(nb * POSITIONS_PER_BLOCK, dirty, dtype=np.uint8)
    padded[:length] = codes

    out = np.zeros((nb, row_bytes), dtype=np.uint8)
    for b in range(n_planes):
        bits = ((padded >> b) & 1).reshape(nb, POSITIONS_PER_BLOCK)
        out[:, b * 32 : (b + 1) * 32] = np.packbits(
            bits, axis=1, bitorder="little"
        )
    # per-symbol per-block sums over the (nb, 256) uint8 view: avoids
    # the O(length) int64 key temporaries of a flat bincount (tens of
    # GB transient at genome scale)
    codes_mat = padded.reshape(nb, POSITIONS_PER_BLOCK)
    counts = np.empty((nb, n_words), dtype=np.int64)
    for w in range(n_words):
        counts[:, w] = (codes_mat == w).sum(axis=1)
    cum = np.cumsum(counts, axis=0)
    milestones = np.zeros_like(cum)
    milestones[1:] = cum[:-1]
    out[:, ms_offset : ms_offset + n_words * 4] = (
        milestones.astype("<u4").view(np.uint8).reshape(nb, n_words * 4)
    )
    return out


def build_ngram_device(index: FmIndex, n: int) -> NgramIndex:
    codes, cn = build_ngram_host(index, n)
    return NgramIndex(
        packed=jnp.asarray(pack_ngram_blocks(codes, n)),
        cn=jnp.asarray(cn.astype(np.uint32)),
        n=n,
    )


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------

def _word_value(letter_list):
    """Word value from per-position letters; letter_list[0] is the
    LEFTMOST (most significant) character of the n-gram."""
    n = len(letter_list)
    v = None
    for j, lett in enumerate(letter_list):
        term = lett.astype(jnp.int32) * (4 ** (n - 1 - j))
        v = term if v is None else v + term
    return v


def ngram_occurrence(ng: NgramIndex, positions, letter_list):
    """Batched occn(w, pos), inclusive. letter_list: n arrays in [0,4)."""
    n = ng.n
    n_words, dirty, n_planes, ms_offset, row_bytes = _geometry(n)
    blk = (positions // POSITIONS_PER_BLOCK).astype(jnp.int32)
    local = (positions % POSITIONS_PER_BLOCK).astype(jnp.int32)
    rows = ng.packed[blk]  # the single fused-row gather

    v = _word_value(letter_list)
    full = jnp.uint8(0xFF)
    diff = None
    for i in range(n_planes):
        m = ((v >> i) & 1).astype(jnp.uint8) * full
        x = rows[:, i * 32 : (i + 1) * 32] ^ m[:, None]
        diff = x if diff is None else (diff | x)
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
        rows[:, ms_offset : ms_offset + n_words * 4].reshape(-1, n_words, 4),
        jnp.uint32,
    )
    ms = jnp.zeros(v.shape, dtype=jnp.uint32)
    for j in range(n_words):
        ms = ms + jnp.where(v == j, ms_all[:, j], jnp.uint32(0))
    return ms + cnt.astype(jnp.uint32)


def ngram_backward_step(ng: NgramIndex, start, end, letter_list):
    """One n-step: prepend the n-gram (letter_list, leftmost first).

    newStart = Cn[w] + occn(w, start-1); newEnd = Cn[w] + occn(w, end) - 1.
    Rows with an invalid range keep it (the reference's stop rule).
    """
    b = start.shape[0]
    v = _word_value(letter_list)
    cn = jnp.zeros(v.shape, dtype=jnp.uint32)
    for j in range(4**ng.n):
        cn = cn + jnp.where(v == j, ng.cn[j], jnp.uint32(0))
    pos = jnp.concatenate([start - jnp.uint32(1), end])
    doubled = [jnp.concatenate([l, l]) for l in letter_list]
    occ = ngram_occurrence(ng, pos, doubled)
    new_start = cn + occ[:b]
    new_end = cn + occ[b:] - jnp.uint32(1)
    keep = start <= end
    return jnp.where(keep, new_start, start), jnp.where(keep, new_end, end)
