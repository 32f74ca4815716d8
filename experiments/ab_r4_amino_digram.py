"""Amino digram economics (VERDICT r3 #4): win or measured refusal.

The reference treats amino rank as a first-class equal
(/root/reference/src/AwFmOccurrence.c:52-135); our amino path composes
every shared win (pair rows, wsum milestones, tight backtrace) but
extends ONE letter per gather. A 2-letter amino step needs rank over
400 clean pair-words (+ dirty), i.e. 9 bit-planes and 484 milestone
words. Two candidate geometries, A/B'd here as synthetic kernels at the
16M-letter protocol geometry (nb = 62,501 blocks; all tables are
fast-regime sized, so this measures the VPU/step economics the digram
must win on):

  baseline  2x production single pair steps (512 B rows, 5 planes,
            21-word wsum milestone) per 2 letters
  cand A    milestone-in-row: 2560 B pair rows (9 planes x 64 B + 484
            u32 milestones), wsum select over the 1936 B section
  cand B    split milestone: 640 B pair rows (planes only) + one u32
            gather from a flat (nb*484,) milestone table (121 MB at
            this scale)

Capacity note recorded with the results: at genome-ish amino scale
(1.6G letters, nb = 6.25M) candidate A needs 16 GB and candidate B a
12.1 GB milestone table — neither fits v5e HBM beside the base tables,
so the digram could only ever serve small amino corpora (which are
dispatch-bound, not gather-bound). The bar for a win is therefore the
VPU economics measured here.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu.models.config import AlphabetType
from avxwindowfmindex_tpu.models.index import (
    DeviceIndex,
    device_code_masks,
    device_pair_row_bytes,
)
from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.ops import rank as rank_ops

B = int(os.environ.get("AWFM_AB_BATCH", 1 << 20))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8
NB = int(  # ceil((16M+1)/256): the amino bench protocol geometry
    os.environ.get("AWFM_AB_NB", 62_501)
)

N_PLANES9 = 9
MS_WORDS = 484  # 22*22 pair codes (clean 400 + dirty combos)
ROW_A = ((N_PLANES9 * 64 + MS_WORDS * 4 + 127) // 128) * 128  # 2560
ROW_B = ((N_PLANES9 * 64 + 127) // 128) * 128  # 640


def log(m):
    print(f"[aminodig] {m}", file=sys.stderr, flush=True)


def time_rate(fn, n_rows, reps=REPS):
    def run(seg):
        _ = int(np.asarray(fn(seg)))

    run(SEG_LO)
    run(SEG_HI)
    lo_t, hi_t = [], []
    for _ in range(reps):
        t0 = time.time()
        run(SEG_LO)
        lo_t.append(time.time() - t0)
        t0 = time.time()
        run(SEG_HI)
        hi_t.append(time.time() - t0)
    dt = float(np.median(hi_t)) - float(np.median(lo_t))
    if dt <= 0:
        dt = float(np.median(hi_t))
        return n_rows * SEG_HI / dt
    return n_rows * (SEG_HI - SEG_LO) / dt


def _mix(h, n):
    return ((h * jnp.uint32(2654435761)) % jnp.uint32(n)).astype(jnp.uint32)


def baseline_single_pair():
    """Two production amino pair steps per iteration (2 letters)."""
    rb = device_pair_row_bytes(AlphabetType.AMINO)
    key = jax.random.PRNGKey(1)
    packed = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, 128 * 3), dtype=jnp.uint8))(
            key
        )
    )
    pair = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, rb), dtype=jnp.uint8))(
            jax.random.fold_in(key, 1)
        )
    )
    dev = DeviceIndex(
        packed=packed,
        packed_pair=pair,
        prefix_sums=jnp.zeros((22,), jnp.uint32),
        seed_table=None,
        sampled_sa=None,
        code_masks=jnp.asarray(device_code_masks(AlphabetType.AMINO)),
        vec_to_index=jnp.asarray(
            np.asarray(alpha.vector_to_index_lut(AlphabetType.AMINO))
        ),
        bwt_length=NB * 256,
        ratio=8,
        kmer_length_in_seed_table=5,
        alphabet=AlphabetType.AMINO,
    )
    rng = np.random.default_rng(5)
    lim = NB * 256 - 600
    pos0 = jnp.asarray(rng.integers(1, lim, size=B, dtype=np.uint32))
    l0 = jnp.asarray(rng.integers(0, 20, size=B, dtype=np.int32))
    jax.block_until_ready((pos0, l0))

    @functools.partial(jax.jit, static_argnames=("seg",))
    def f(dv, pos, lett, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            start = pos
            end = pos + jnp.uint32(200)
            bad = jnp.zeros(pos.shape, dtype=bool)
            s1, e1, bad = rank_ops.backward_step_pair(
                dv, start, end, lett, bad
            )
            s2, e2, bad = rank_ops.backward_step_pair(
                dv, s1, e1, (lett + 3) % 20, bad
            )
            h = s2 + e2 + bad.astype(jnp.uint32)
            acc = acc + jnp.sum(h)
            pos = jnp.maximum(_mix(h + pos, lim), jnp.uint32(1))
        return acc

    rate = time_rate(lambda s: f(dev, pos0, l0, seg=s), B)
    log(f"baseline 2x single pair steps: {rate / 1e6:.1f} iters/s "
        f"({2 * rate / 1e6:.1f} letters/s equiv)")
    del packed, pair
    return rate


def _match9_occ(rows, v, local_s, local_e):
    """9-plane code-equality match + two inclusive masked popcounts over
    a 64-byte pair window — the candidate digram VPU core."""
    iota = np.arange(64, dtype=np.int32)

    def incl(local):
        byte_idx = (local >> 3)[:, None]
        bit_idx = (local & 7)[:, None].astype(jnp.uint8)
        low = (jnp.uint8(2) << bit_idx) - jnp.uint8(1)
        bb = jnp.asarray(iota)[None, :]
        return jnp.where(
            bb < byte_idx, jnp.uint8(0xFF),
            jnp.where(bb == byte_idx, low, jnp.uint8(0)),
        )

    diff = None
    for i in range(N_PLANES9):
        cm = jnp.where(
            ((v >> i) & 1).astype(bool), jnp.uint8(0xFF), jnp.uint8(0)
        )[:, None]
        x = rows[:, i * 64 : (i + 1) * 64] ^ cm
        diff = x if diff is None else (diff | x)
    match = ~diff
    occ_s = jnp.sum(
        lax.population_count(match & incl(local_s)), axis=1,
        dtype=jnp.int32,
    )
    occ_e = jnp.sum(
        lax.population_count(match & incl(local_e)), axis=1,
        dtype=jnp.int32,
    )
    return occ_s, occ_e


def cand_a():
    """Milestone-in-row: 2560 B rows, wsum over the 484-word section."""
    from avxwindowfmindex_tpu.ops.ngram import _milestone_wsum

    key = jax.random.PRNGKey(2)
    log(f"cand A table: {NB} x {ROW_A} B = {NB * ROW_A / 2**20:.0f} MiB")
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, ROW_A), dtype=jnp.uint8))(
            key
        )
    )
    rng = np.random.default_rng(6)
    lim = NB * 256 - 600
    pos0 = jnp.asarray(rng.integers(1, lim, size=B, dtype=np.uint32))
    v0 = jnp.asarray(rng.integers(0, 400, size=B, dtype=np.int32))
    jax.block_until_ready((pos0, v0))

    @functools.partial(jax.jit, static_argnames=("seg",))
    def f(t, pos, v, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            blk = (pos >> jnp.uint32(8)).astype(jnp.int32)
            local_s = (pos & jnp.uint32(0xFF)).astype(jnp.int32)
            local_e = jnp.minimum(local_s + 200, 511)
            rows = t[blk]
            occ_s, occ_e = _match9_occ(rows, v, local_s, local_e)
            ms = _milestone_wsum(
                rows[:, N_PLANES9 * 64 : N_PLANES9 * 64 + MS_WORDS * 4],
                v, MS_WORDS,
            )
            h = ms + occ_s.astype(jnp.uint32) + occ_e.astype(jnp.uint32)
            acc = acc + jnp.sum(h)
            pos = jnp.maximum(_mix(h + pos, lim), jnp.uint32(1))
        return acc

    rate = time_rate(lambda s: f(table, pos0, v0, seg=s), B)
    log(f"cand A (2560 B wsum rows): {rate / 1e6:.1f} steps/s "
        f"({2 * rate / 1e6:.1f} letters/s equiv)")
    del table
    return rate


def cand_b():
    """Split milestone: 640 B plane rows + one u32 milestone gather."""
    key = jax.random.PRNGKey(7)
    log(f"cand B tables: {NB} x {ROW_B} B rows + {NB}x{MS_WORDS} u32 ms "
        f"({NB * MS_WORDS * 4 / 2**20:.0f} MiB)")
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, ROW_B), dtype=jnp.uint8))(
            key
        )
    )
    ms_table = jax.block_until_ready(
        jax.jit(
            lambda k: jax.random.bits(k, (NB * MS_WORDS,), dtype=jnp.uint32)
        )(jax.random.fold_in(key, 1))
    )
    rng = np.random.default_rng(8)
    lim = NB * 256 - 600
    pos0 = jnp.asarray(rng.integers(1, lim, size=B, dtype=np.uint32))
    v0 = jnp.asarray(rng.integers(0, 400, size=B, dtype=np.int32))
    jax.block_until_ready((pos0, v0))

    @functools.partial(jax.jit, static_argnames=("seg",))
    def f(t, mst, pos, v, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            blk = (pos >> jnp.uint32(8)).astype(jnp.int32)
            local_s = (pos & jnp.uint32(0xFF)).astype(jnp.int32)
            local_e = jnp.minimum(local_s + 200, 511)
            rows = t[blk]
            occ_s, occ_e = _match9_occ(rows, v, local_s, local_e)
            ms = mst[blk * MS_WORDS + v]
            h = ms + occ_s.astype(jnp.uint32) + occ_e.astype(jnp.uint32)
            acc = acc + jnp.sum(h)
            pos = jnp.maximum(_mix(h + pos, lim), jnp.uint32(1))
        return acc

    rate = time_rate(lambda s: f(table, ms_table, pos0, v0, seg=s), B)
    log(f"cand B (640 B rows + ms gather): {rate / 1e6:.1f} steps/s "
        f"({2 * rate / 1e6:.1f} letters/s equiv)")
    del table, ms_table
    return rate


def main():
    base = baseline_single_pair()
    a = cand_a()
    b = cand_b()
    # baseline does 2 letters per iteration; candidates 2 letters/step
    out = {
        "exp": "amino_digram_16M_geometry",
        "letters_per_sec_M": {
            "baseline_2x_single_pair": round(2 * base / 1e6, 1),
            "cand_A_ms_in_row_2560B": round(2 * a / 1e6, 1),
            "cand_B_split_ms_640B": round(2 * b / 1e6, 1),
        },
        "speedup_vs_baseline": {
            "cand_A": round(a / base, 3),
            "cand_B": round(b / base, 3),
        },
        "capacity_note": (
            "1.6G-letter amino: cand A 16.0 GB, cand B 12.1 GB milestone "
            "table — neither fits v5e HBM beside base tables; digram "
            "could only serve small (dispatch-bound) amino corpora"
        ),
    }
    print(json.dumps(out), flush=True)
    log("done")


if __name__ == "__main__":
    main()
