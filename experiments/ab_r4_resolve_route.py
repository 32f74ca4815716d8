"""Does slab routing pay for the SA-resolve gather (4 B u32 rows)?

The locate tail ends with hits = SA[p/ratio] + off — ONE independent
u32 gather per hit from the sampled (1.55 GiB at hg38 r8) or dense
(3.10 GiB at r4) suffix-array table. Both sit past the 128 MiB gather
wall, so the mono gather pays the ~9.6 ns/row issue rate like any other
big-table gather (ab_r4_gathercliff). But the 128-B-row break-even
policy (AWFM_ROUTE_MIN_RATIO=5000) was calibrated where slab streaming
amortizes over 32x more bytes gathered per row; at 4 B rows the
fixed costs (two sorts, searchsorted, streaming the whole table once
per call) eat a much larger share of the saving. Predicted break-even
from the measured constants: ~1M rows on the 3.1 GiB table — this
script measures instead of trusting that arithmetic.

Variants (chained data-dependently, lo/hi segment differencing):
  M0  mono: h = tab[mix(h)]                       (the production form)
  R1  routed, production-shaped: unstable multi-operand sort by index
      (carrying the chain value as payload), searchsorted run starts,
      scan over K 48 MiB dynamic_slice slabs, then a second sort to
      restore caller order.
Grid: table in {1.55 GiB (hg38 r8), 3.10 GiB (hg38 r4 dense)},
      B in {1M, 4M}. Checksum parity R1 == M0 asserted per config.

Decision rule: integrate routing into _resolve_samples only where R1
wins >= 1.3x at a batch the bench actually runs (chunked locate tails
resolve ~1M hits per 1M-query chunk, ~4.2M at CHUNK_Q=4M).
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

REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8
GIB = 1 << 30
SLAB_BYTES = 48 << 20
SR = SLAB_BYTES // 4  # u32 entries per slab


def log(m):
    print(f"[resolveroute] {m}", file=sys.stderr, flush=True)


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
        dt = float(np.median(hi_t))
        return n_rows * SEG_HI / dt
    return n_rows * (SEG_HI - SEG_LO) / dt


def _mix(h, nrows):
    return ((h * jnp.uint32(2654435761)) % jnp.uint32(nrows)).astype(
        jnp.uint32
    )


def mono_chain(tab, idx0, seg):
    def body(i, h):
        return tab[_mix(h, tab.shape[0]).astype(jnp.int32)]

    return jnp.sum(lax.fori_loop(0, seg, body, idx0).astype(jnp.uint64))


def routed_chain(tab, idx0, seg, cap):
    n = tab.shape[0]
    k = -(-n // SR)
    bounds = jnp.arange(1, k, dtype=jnp.int32) * jnp.int32(SR)

    def step(h):
        idx = _mix(h, n)
        orig = jnp.arange(idx.shape[0], dtype=jnp.uint32)
        si, so = lax.sort((idx, orig), num_keys=1, is_stable=False)
        starts = jnp.searchsorted(si, bounds.astype(si.dtype)).astype(
            jnp.int32
        )
        starts_full = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                starts,
                jnp.full((1,), si.shape[0], jnp.int32),
            ]
        )
        sp_pad = jnp.concatenate(
            [si, jnp.full((cap,), n - 1, dtype=si.dtype)]
        )
        out = jnp.zeros((si.shape[0] + cap,), jnp.uint32)

        def body(carry, kk):
            s = starts_full[kk]
            base = jnp.minimum(kk * jnp.int32(SR), jnp.int32(n - SR))
            win = lax.dynamic_slice(sp_pad, (s,), (cap,))
            local = jnp.clip(win.astype(jnp.int32) - base, 0, SR - 1)
            slab = lax.dynamic_slice(tab, (base,), (SR,))
            return lax.dynamic_update_slice(carry, slab[local], (s,)), None

        out, _ = lax.scan(body, out, jnp.arange(k, dtype=jnp.int32))
        vals = out[: si.shape[0]]
        # restore caller order: sort by origin carrying the value
        _, restored = lax.sort((so, vals), num_keys=1, is_stable=False)
        return restored

    def body(i, h):
        return step(h)

    return jnp.sum(lax.fori_loop(0, seg, body, idx0).astype(jnp.uint64))


def main():
    results = {}
    key = jax.random.PRNGKey(7)
    for tab_gib, n_rows in [
        ("1.55GiB_r8", (1 << 30) // 4 + 150_000_000),  # 418.4M entries
        ("3.10GiB_r4", 775_000_000),
    ]:
        tab = jax.block_until_ready(
            jax.jit(
                lambda kk, nn=n_rows: jax.random.bits(
                    kk, (nn,), dtype=jnp.uint32
                )
            )(key)
        )
        for b in (1 << 20, 1 << 22):
            idx0 = jax.block_until_ready(
                jax.jit(
                    lambda kk, bb=b: jax.random.bits(
                        kk, (bb,), dtype=jnp.uint32
                    )
                )(jax.random.PRNGKey(b))
            )
            k = -(-n_rows // SR)
            cap = min(b, -(-b * 125 // (100 * k)))
            # tab/idx0 are jit ARGUMENTS, never closures: closed-over
            # device arrays embed as HLO constants and the multi-GB
            # program upload wedges the remote-compile relay (RUNBOOK
            # operational addendum)
            mono_jit = jax.jit(mono_chain, static_argnums=2)
            routed_jit = jax.jit(routed_chain, static_argnums=(2, 3))

            def m0(s):
                return mono_jit(tab, idx0, s)

            def r1(s):
                return routed_jit(tab, idx0, s, cap)
            # checksum parity (chained sums must agree exactly)
            cm = int(np.asarray(m0(3)))
            cr = int(np.asarray(r1(3)))
            assert cm == cr, (tab_gib, b, cm, cr)
            rm = time_rate(m0, b)
            rr = time_rate(r1, b)
            cfg = f"{tab_gib}_B{b>>20}M"
            results[cfg] = {
                "mono_Mrows": round(rm / 1e6, 1),
                "routed_Mrows": round(rr / 1e6, 1),
                "ratio": round(rr / rm, 2),
            }
            log(f"{cfg}: mono {rm/1e6:.1f} routed {rr/1e6:.1f} M rows/s")
        del tab
    print(json.dumps({"exp": "resolve_route", "res": results}))


if __name__ == "__main__":
    main()
