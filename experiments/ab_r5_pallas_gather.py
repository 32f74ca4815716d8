"""Is Mosaic's tpu.dynamic_gather fast enough to fuse the digram step?

VERDICT r4 next #2: the 384/512 B digram row measured an exact routing
wash because the (B, 512) materialization cancels the slab-gather win;
a Pallas kernel that keeps the slab in VMEM and fuses
match+popcount+wsum inside the slab walk materializes nothing. The
make-or-break primitive is a VECTORIZED in-VMEM row gather: this jax
version lowers 2-D ``jnp.take_along_axis(x, idx, axis=0)`` to
``tpu.dynamic_gather`` (jax/_src/pallas/mosaic/lowering.py:2464-2524),
a sublane gather — but its throughput at FM-index geometry (u32-lane
rows, slab-extent indices) is unmeasured, and round 2's per-row-DMA
formulation was issue-bound far below XLA's gather.

Kernels (all VMEM-resident, chained via data dependence, seg-differenced):
  K1 gather-only     out = slab[idx]  (u32 lanes, (S,128))
  K2 gather+digram   K1 + 5-plane u32 match, inclusive-mask popcount,
                     milestone one-hot — the full pair-step compute,
                     writing only (S, 8) u32 lanes back
Grid: S in {2048, 8192} rows x 128 u32 lanes (1-4 MiB slabs).

Reference points measured in the SAME process with XLA:
  X1 fast-regime gather   (S, 128) u32 table (<= 64 MiB operand)
  X2 wall-regime gather   (9.1M, 128) u32 table (4.65 GiB)

Decision rule: build the fused production kernel only if K1 clears
~200 M rows/s (2x the mono wall) — below that the fused kernel cannot
beat routed-XLA-gather + full-batch compute even with zero
materialization traffic (arithmetic in the results file).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8
LANES = 128  # 512 B pair row as u32 lanes
N_PLANES = 5
MS_BASE = 80  # milestone lanes [80, 96) in the u32 view
N_WORDS = 16


def log(m):
    print(f"[pallasgather] {m}", file=sys.stderr, flush=True)


def time_rate(fn, n_rows, reps=REPS):
    def run(seg):
        return int(np.asarray(fn(seg)))

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
        return n_rows * SEG_HI / float(np.median(hi_t))
    return n_rows * (SEG_HI - SEG_LO) / dt


# ---------------------------------------------------------------------------
# K1: gather-only kernel
# ---------------------------------------------------------------------------

def _k1_kernel(x_ref, idx_ref, out_ref):
    idx = idx_ref[:, :]  # (S, 128) i32 (pre-broadcast outside)
    out_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx, axis=0)


def _k1_call(x, idxb):
    s = x.shape[0]
    return pl.pallas_call(
        _k1_kernel,
        out_shape=jax.ShapeDtypeStruct((s, LANES), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idxb)


def k1_chain(x, idx0, seg):
    s = x.shape[0]

    def body(i, idx):
        idxb = jnp.broadcast_to(idx[:, None], (s, LANES))
        rows = _k1_call(x, idxb)
        return ((rows[:, 0] + rows[:, 37]) % jnp.uint32(s)).astype(jnp.int32)

    idx = lax.fori_loop(0, seg, body, idx0)
    return jnp.sum(idx)


# ---------------------------------------------------------------------------
# K2: gather + full digram pair-step compute
# ---------------------------------------------------------------------------

def _k2_kernel(x_ref, idx_ref, v_ref, loc_ref, out_ref):
    s = x_ref.shape[0]
    idx = idx_ref[:, :]
    rows32 = jnp.take_along_axis(x_ref[:, :], idx, axis=0)
    v = v_ref[:, :]  # (S, 1) i32 word values
    # match over 4 value planes + dirty-plane OR (ngram._pair_match_u32)
    diff = None
    for i in range(N_PLANES - 1):
        m = jnp.uint32(0) - ((v >> i) & 1).astype(jnp.uint32)
        xoi = rows32[:, i * 16 : (i + 1) * 16] ^ m
        diff = xoi if diff is None else (diff | xoi)
    match = ~(diff | rows32[:, (N_PLANES - 1) * 16 : N_PLANES * 16])
    # inclusive masks for local_s and local_e (ngram._pair_mask_u32)
    lanes = lax.broadcasted_iota(jnp.int32, (s, 16), 1)
    occ = []
    for col in range(2):
        local = loc_ref[:, col : col + 1]
        lane_idx = local >> 5
        bits = (local & 31).astype(jnp.uint32)
        low = (jnp.uint32(2) << bits) - jnp.uint32(1)
        mask = jnp.where(
            lanes < lane_idx,
            jnp.uint32(0xFFFFFFFF),
            jnp.where(lanes == lane_idx, low, jnp.uint32(0)),
        )
        occ.append(
            jnp.sum(
                lax.population_count(match & mask), axis=1, dtype=jnp.int32
            )
        )
    # milestone one-hot over lanes [MS_BASE, MS_BASE + 16)
    ms = jnp.zeros((s,), dtype=jnp.uint32)
    for j in range(N_WORDS):
        ms = ms + jnp.where(
            v[:, 0] == j, rows32[:, MS_BASE + j], jnp.uint32(0)
        )
    out = jnp.zeros((s, 8), jnp.uint32)
    out = out.at[:, 0].set(ms + occ[0].astype(jnp.uint32))
    out = out.at[:, 1].set(ms + occ[1].astype(jnp.uint32))
    out_ref[:, :] = out


def _k2_call(x, idxb, v, loc):
    s = x.shape[0]
    return pl.pallas_call(
        _k2_kernel,
        out_shape=jax.ShapeDtypeStruct((s, 8), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idxb, v, loc)


def k2_chain(x, idx0, v0, loc, seg):
    s = x.shape[0]

    def body(i, carry):
        idx, v = carry
        idxb = jnp.broadcast_to(idx[:, None], (s, LANES))
        out = _k2_call(x, idxb, v, loc)
        nidx = ((out[:, 0] + out[:, 1]) % jnp.uint32(s)).astype(jnp.int32)
        nv = ((out[:, 1] >> jnp.uint32(3)) % jnp.uint32(16)).astype(
            jnp.int32
        )[:, None]
        return nidx, nv

    idx, v = lax.fori_loop(0, seg, body, (idx0, v0))
    return jnp.sum(idx) + jnp.sum(v)


# ---------------------------------------------------------------------------
# XLA reference gathers (same chaining)
# ---------------------------------------------------------------------------

def xla_chain(x, idx0, seg):
    s = x.shape[0]

    def body(i, idx):
        rows = x[idx]
        return ((rows[:, 0] + rows[:, 37]) % jnp.uint32(s)).astype(jnp.int32)

    idx = lax.fori_loop(0, seg, body, idx0)
    return jnp.sum(idx)


def main():
    rng = np.random.default_rng(11)
    res = {}
    for s in (2048, 8192):
        x = jax.block_until_ready(
            jax.jit(
                lambda k, ss=s: jax.random.bits(
                    k, (ss, LANES), dtype=jnp.uint32
                )
            )(jax.random.PRNGKey(s))
        )
        idx0 = jax.block_until_ready(
            jnp.asarray(rng.integers(0, s, size=s, dtype=np.int32))
        )
        v0 = jax.block_until_ready(
            jnp.asarray(rng.integers(0, 16, size=(s, 1), dtype=np.int32))
        )
        loc = jax.block_until_ready(
            jnp.asarray(rng.integers(0, 512, size=(s, 2), dtype=np.int32))
        )
        k1 = jax.jit(k1_chain, static_argnums=2)
        k2 = jax.jit(k2_chain, static_argnums=4)
        x1 = jax.jit(xla_chain, static_argnums=2)
        r = {}
        try:
            r["k1_gather_Mrows"] = round(
                time_rate(lambda g: k1(x, idx0, g), s) / 1e6, 1
            )
        except Exception as exc:  # lowering may refuse; that IS a result
            r["k1_error"] = repr(exc)[:300]
        if "k1_gather_Mrows" in r:
            try:
                r["k2_fused_Mrows"] = round(
                    time_rate(lambda g: k2(x, idx0, v0, loc, g), s) / 1e6, 1
                )
            except Exception as exc:
                r["k2_error"] = repr(exc)[:300]
        r["xla_small_Mrows"] = round(
            time_rate(lambda g: x1(x, idx0, g), s) / 1e6, 1
        )
        res[f"S{s}"] = r
        log(f"S{s}: {r}")
        del x
    # wall-regime XLA reference: 4.65 GiB u32-lane table
    nb = 9_100_000
    big = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (nb, LANES), dtype=jnp.uint32))(
            jax.random.PRNGKey(1)
        )
    )
    bidx = jax.block_until_ready(
        jnp.asarray(rng.integers(0, nb, size=1 << 20, dtype=np.int32))
    )

    def big_chain(x, idx0, seg):
        def body(i, idx):
            rows = x[idx]
            return ((rows[:, 0] + rows[:, 37]) % jnp.uint32(nb)).astype(
                jnp.int32
            )

        return jnp.sum(lax.fori_loop(0, seg, body, idx0))

    bj = jax.jit(big_chain, static_argnums=2)
    res["xla_wall_Mrows"] = round(
        time_rate(lambda g: bj(big, bidx, g), 1 << 20) / 1e6, 1
    )
    log(f"xla wall: {res['xla_wall_Mrows']}")
    print(json.dumps({"exp": "pallas_gather", "res": res}))


if __name__ == "__main__":
    main()
