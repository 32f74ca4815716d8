"""Does slab routing pay at 256 B rows? (the untested middle)

The auto policy routes rows <= 128 B (2.28x measured) and refuses
384 B (exact wash — materialization cancels the slab saving). The
256 B pair-row tables (nt single-step count, locate_first's range
phase fallback, amino compact rows) sit untested in between. Synthetic
tables are representative (ab_r4_tablesrc: provenance and done-rows
don't move the rates); hg38 pair geometry = 12.1M x 256 B = 3.1 GiB.

Kernels mirror ab_r4_tablesrc's walk/walk_routed at RB=256, B in
{1M, 4M}. Decision rule: flip AWFM_ROUTE_MAX_ROW_BYTES to 256 only if
routed wins >= 1.2x at BOTH batch sizes (the win must survive the
integration tax measured at ~1/3 of calib rates, ab_r5_locdecomp).
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

NB = 12_109_376
RB = 256
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8


def log(m):
    print(f"[route256] {m}", file=sys.stderr, flush=True)


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


def main():
    rng = np.random.default_rng(3)
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, RB), dtype=jnp.uint8))(
            jax.random.PRNGKey(5)
        )
    )
    mono_jit = jax.jit(walk_mono, static_argnums=2)
    routed_jit = jax.jit(walk_routed, static_argnums=(2, 3))
    res = {}
    for b in (1 << 20, 1 << 22):
        os.environ["AWFM_ROUTE_MAX_ROW_BYTES"] = "256"
        plan = route_ops.plan_for(NB, RB, b)
        os.environ.pop("AWFM_ROUTE_MAX_ROW_BYTES", None)
        assert plan is not None
        idx0 = jax.block_until_ready(
            jnp.asarray(rng.integers(0, NB, size=b, dtype=np.int32))
        )
        rm = time_rate(lambda s: mono_jit(table, idx0, s), b)
        rr = time_rate(lambda s: routed_jit(table, idx0, s, plan), b)
        res[f"B{b>>20}M"] = {
            "mono_Mrows": round(rm / 1e6, 1),
            "routed_Mrows": round(rr / 1e6, 1),
            "ratio": round(rr / rm, 2),
        }
        log(f"B{b>>20}M: {res[f'B{b>>20}M']}")
    print(json.dumps({"exp": "route256", "res": res}))


if __name__ == "__main__":
    main()
