"""Why is the routed gather ~2x in isolated A/Bs but ~1x in the bench?

bench_hg38_r4_fix: the cap-starvation fix removed the 3.7-4.6x
regression, but the routed backtrace now merely MATCHES mono
(locate_first 1.348 vs 1.35 s) instead of the 2.28x/1.9x the isolated
kernels measured (ab_r4_routed_kernels, ab_r4_ballast). Remaining
differences between those A/Bs and production, tested here one at a
time on the SAME process:

  T1 table provenance: ballast tables were GENERATED on device
     (jax.random.bits); production's dev.packed is HOST-UPLOADED
     (jnp.asarray of a numpy array). If XLA lays out uploaded arrays
     differently (tiling/padding), slab slices may lose their fast
     form.
  T2 done-row distribution: with ratio=8, ~2/3 of rows are done after
     the first fused-8 program; under the sentinel-key fix they all
     clamp to block n_rows-1 — the last slab's window gathers ~660K
     DUPLICATES of one row and every other slab's run shrinks. The
     ballast walk had ratio=2^31-1 (no done rows ever). Duplicate-
     heavy windows may serialize the slab gather.
  T3 ratio-8 masking itself (the where's + sentinel key compute).

Kernels: the bench's walk/walk_routed (bare-rate, seg-differenced), a
ratio-8 masked mono walk, and a ratio-8 sentinel routed walk fed the
SAME evolving done distribution production sees (walk positions, done
mask grows per step).
"""

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

from avxwindowfmindex_tpu.ops import route as route_ops

NB = 12_109_376  # hg38 narrow geometry
RB = 128
B = 1 << 20
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8


def log(m):
    print(f"[tablesrc] {m}", file=sys.stderr, flush=True)


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


def walk_mono(table, idx, seg):
    nb = jnp.uint32(table.shape[0])
    for _ in range(seg):
        rows = table[idx]
        nxt = (
            idx.astype(jnp.uint32) * jnp.uint32(1103515245)
            + jnp.sum(rows.astype(jnp.uint32), axis=1)
            + jnp.uint32(12345)
        )
        idx = (nxt % nb).astype(jnp.int32)
    return jnp.sum(idx)


def walk_routed(table, idx, seg, plan):
    nb = jnp.uint32(table.shape[0])
    for _ in range(seg):
        si, _ = lax.sort((idx, idx), num_keys=1, is_stable=False)
        rows, _cov = route_ops.routed_gather(table, si, plan)
        nxt = (
            si.astype(jnp.uint32) * jnp.uint32(1103515245)
            + jnp.sum(rows.astype(jnp.uint32), axis=1)
            + jnp.uint32(12345)
        )
        idx = (nxt % nb).astype(jnp.int32)
    return jnp.sum(idx)


def walk_routed_done(table, pidx, done0, seg, plan):
    """Routed walk with a production-like done distribution: done rows
    keep their (sentinel) clamp to the last block; the done set GROWS
    each step like a ratio-8 walk (1/8 of survivors complete)."""
    nb = jnp.uint32(table.shape[0])
    done = done0
    idx = pidx
    for s in range(seg):
        key = jnp.where(done, jnp.int32(0x7FFFFFFF), idx)
        key, idx2 = lax.sort((key, idx), num_keys=1, is_stable=False)
        blk = jnp.minimum(key, jnp.int32(table.shape[0] - 1))
        rows, _cov = route_ops.routed_gather(table, blk, plan)
        nxt = (
            idx2.astype(jnp.uint32) * jnp.uint32(1103515245)
            + jnp.sum(rows.astype(jnp.uint32), axis=1)
            + jnp.uint32(12345)
        )
        idx = (nxt % nb).astype(jnp.int32)
        # ~1/8 of the still-walking rows complete each step (which rows
        # go done is irrelevant to gather cost, only the count is)
        done = done | ((nxt % jnp.uint32(8)) == jnp.uint32(s % 8))
    return jnp.sum(idx) + jnp.sum(done)


def main():
    plan = route_ops.plan_for(NB, RB, B)
    assert plan is not None
    log(f"plan: {plan}")
    rng = np.random.default_rng(3)
    idx0_np = rng.integers(0, NB, size=B, dtype=np.int32)
    res = {}

    mono_jit = jax.jit(walk_mono, static_argnums=2)
    routed_jit = jax.jit(walk_routed, static_argnums=(2, 3))
    routed_done_jit = jax.jit(walk_routed_done, static_argnums=(3, 4))

    for src in ("generated", "uploaded"):
        if src == "generated":
            table = jax.block_until_ready(
                jax.jit(
                    lambda k: jax.random.bits(k, (NB, RB), dtype=jnp.uint8)
                )(jax.random.PRNGKey(5))
            )
        else:
            host = rng.integers(0, 256, size=(NB, RB), dtype=np.uint8)
            table = jax.block_until_ready(jnp.asarray(host))
            del host
        idx0 = jax.block_until_ready(jnp.asarray(idx0_np))
        r = {}
        r["mono"] = round(
            time_rate(lambda s: mono_jit(table, idx0, s), B) / 1e6, 1
        )
        r["routed"] = round(
            time_rate(lambda s: routed_jit(table, idx0, s, plan), B) / 1e6,
            1,
        )
        # production-like done distribution (2/3 done at steady state)
        done0 = jax.block_until_ready(
            jnp.asarray(rng.random(B) < (2.0 / 3.0))
        )
        r["routed_done23"] = round(
            time_rate(
                lambda s: routed_done_jit(table, idx0, done0, s, plan), B
            )
            / 1e6,
            1,
        )
        res[src] = r
        log(f"{src}: {r}")
        del table
    print(json.dumps({"exp": "tablesrc", "res": res}))


if __name__ == "__main__":
    main()
