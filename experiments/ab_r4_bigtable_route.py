"""Why does slab routing collapse on the 4.33 GiB digram table?

ab_r4_slabroute F proved routed chained gathers at 143.8 M rows/s on a
2.16 GiB / 384 B-row table; the SAME routed formulation at hg38 digram
geometry (12,109,376 rows = 4.33 GiB — past the 2^32-BYTE boundary)
runs at 32 M rows/s whether the step compute sits inside the scan or
on a materialized buffer (ab_r4_routed_kernels R1). Prime suspect: the
table crossing 4 GiB flips XLA/Mosaic to 64-bit addressing (or kills
the slab's VMEM promotion when the dynamic_slice source needs 64-bit
offsets).

Matrix (bare chained routed gather, 384 B rows, B = 4M, sort included,
mono control per size):

  NB/2 flat      6,054,688 rows = 2.16 GiB   (control: expect ~140)
  NB   flat     12,109,376 rows = 4.33 GiB   (expect ~32 if confirmed)
  NB   reshape  (K, SR, 384) padded table, slab = table_r[k]
  NB   twohalf  two flat < 2.2 GiB arrays, one scan each, windows from
                a single global sort (second searchsorted split)

If flat collapses at NB but reshape/twohalf hold ~140, the production
fix is to keep every routed OPERAND under 4 GiB (pad-and-reshape to
(K, SR, rb), which also drops the searchsorted base arithmetic).
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

B = int(os.environ.get("AWFM_AB_BATCH", 1 << 22))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8
NB = int(os.environ.get("AWFM_AB_NB", 12_109_376))
RB = 384
MIB = 1 << 20
SR = int(os.environ.get("AWFM_AB_SR", (48 * MIB) // RB))  # 48 MiB slabs


def log(m):
    print(f"[bigroute] {m}", file=sys.stderr, flush=True)


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


def _starts(sp, k, b):
    bounds = (jnp.arange(1, k, dtype=jnp.uint32) * jnp.uint32(SR)).astype(
        sp.dtype
    )
    starts = jnp.searchsorted(sp, bounds).astype(jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), starts, jnp.full((1,), b, jnp.int32)]
    )


def _gather_scan_flat(table, sp, starts_full, k, cap, n_rows):
    b = sp.shape[0]
    sp_pad = jnp.concatenate(
        [sp, jnp.full((cap,), n_rows - 1, dtype=sp.dtype)]
    )
    out = jnp.zeros((b + cap,), jnp.uint32)

    def body(carry, kk):
        s = starts_full[kk]
        base = jnp.minimum(kk * jnp.int32(SR), jnp.int32(n_rows - SR))
        win = lax.dynamic_slice(sp_pad, (s,), (cap,))
        local = jnp.clip(win.astype(jnp.int32) - base, 0, SR - 1)
        slab = lax.dynamic_slice(table, (base, 0), (SR, RB))
        h = jnp.sum(slab[local].astype(jnp.uint32), axis=1)
        return lax.dynamic_update_slice(carry, h, (s,)), None

    out, _ = lax.scan(body, out, jnp.arange(k, dtype=jnp.int32))
    return out[:b]


def _gather_scan_reshaped(table_r, sp, starts_full, k, cap, n_rows):
    b = sp.shape[0]
    sp_pad = jnp.concatenate(
        [sp, jnp.full((cap,), n_rows - 1, dtype=sp.dtype)]
    )
    out = jnp.zeros((b + cap,), jnp.uint32)

    def body(carry, kk):
        s = starts_full[kk]
        win = lax.dynamic_slice(sp_pad, (s,), (cap,))
        local = jnp.clip(
            win.astype(jnp.int32) - kk * jnp.int32(SR), 0, SR - 1
        )
        slab = table_r[kk]
        h = jnp.sum(slab[local].astype(jnp.uint32), axis=1)
        return lax.dynamic_update_slice(carry, h, (s,)), None

    out, _ = lax.scan(body, out, jnp.arange(k, dtype=jnp.int32))
    return out[:b]


def _gather_static_unroll(table, sp, starts_full, k, cap, n_rows):
    """Python-unrolled slabs with STATIC slice offsets (lax.slice)."""
    b = sp.shape[0]
    sp_pad = jnp.concatenate(
        [sp, jnp.full((cap,), n_rows - 1, dtype=sp.dtype)]
    )
    out = jnp.zeros((b + cap,), jnp.uint32)
    for kk in range(k):
        base = min(kk * SR, n_rows - SR)
        s = starts_full[kk]
        win = lax.dynamic_slice(sp_pad, (s,), (cap,))
        local = jnp.clip(win.astype(jnp.int32) - base, 0, SR - 1)
        slab = lax.slice(table, (base, 0), (base + SR, RB))
        h = jnp.sum(slab[local].astype(jnp.uint32), axis=1)
        out = lax.dynamic_update_slice(out, h, (s,))
    return out[:b]


def run_case(name, n_rows, mode):
    k = -(-n_rows // SR)
    cap = min(B, int(B * 1.25 / k) + 256)
    pad_rows = k * SR
    gib = n_rows * RB / (1 << 30)
    log(f"{name}: {n_rows} rows = {gib:.2f} GiB, k={k}, cap={cap}, "
        f"mode={mode}")
    key = jax.random.PRNGKey(1)
    if mode in ("reshape_view", "static_unroll"):
        # flat PADDED table (the production integration shape: pad once
        # at load, reshape-as-bitcast inside the routed program)
        table = jax.block_until_ready(
            jax.jit(
                lambda kk: jax.random.bits(kk, (pad_rows, RB),
                                           dtype=jnp.uint8)
            )(key)
        )
    elif mode == "reshape":
        table = jax.block_until_ready(
            jax.jit(
                lambda kk: jax.random.bits(
                    kk, (k, SR, RB), dtype=jnp.uint8
                )
            )(key)
        )
    elif mode == "twohalf":
        kh = k // 2
        t1 = jax.block_until_ready(
            jax.jit(
                lambda kk: jax.random.bits(kk, (kh * SR, RB), dtype=jnp.uint8)
            )(key)
        )
        t2 = jax.block_until_ready(
            jax.jit(
                lambda kk: jax.random.bits(
                    kk, (pad_rows - kh * SR, RB), dtype=jnp.uint8
                )
            )(jax.random.fold_in(key, 1))
        )
        table = (t1, t2)
    else:
        table = jax.block_until_ready(
            jax.jit(
                lambda kk: jax.random.bits(kk, (n_rows, RB), dtype=jnp.uint8)
            )(key)
        )
    rng = np.random.default_rng(7)
    pos0 = jnp.asarray(rng.integers(0, n_rows, size=B, dtype=np.uint32))
    jax.block_until_ready(pos0)

    res = {}
    if mode == "flat":
        @functools.partial(jax.jit, static_argnames=("seg",))
        def mono(t, pos, *, seg):
            acc = jnp.uint32(0)
            for _ in range(seg):
                h = jnp.sum(
                    t[pos.astype(jnp.int32)].astype(jnp.uint32), axis=1
                )
                acc = acc + jnp.sum(h)
                pos = _mix(h + pos, n_rows)
            return acc

        res["mono"] = round(
            time_rate(lambda s: mono(table, pos0, seg=s), B) / 1e6, 1
        )
        log(f"{name} mono: {res['mono']} M rows/s")

    @functools.partial(jax.jit, static_argnames=("seg",))
    def routed(t, pos, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            sp = lax.sort(pos, is_stable=False)
            sf = _starts(sp, k, B)
            if mode == "reshape":
                h = _gather_scan_reshaped(t, sp, sf, k, cap, n_rows)
            elif mode == "reshape_view":
                h = _gather_scan_reshaped(
                    t.reshape(k, SR, RB), sp, sf, k, cap, n_rows
                )
            elif mode == "static_unroll":
                h = _gather_static_unroll(t, sp, sf, k, cap, n_rows)
            elif mode == "twohalf":
                kh = k // 2
                h1 = _gather_scan_flat(t[0], sp, sf[: kh + 1], kh, cap,
                                       kh * SR)
                sp2 = sp - jnp.uint32(kh * SR)  # wraps below kh*SR; local
                # clip masks those rows out and the h1 write wins (h2's
                # windows start at sf[kh] so earlier slots are untouched)
                h2 = _gather_scan_flat(
                    t[1], sp2, sf[kh:] , k - kh, cap, pad_rows - kh * SR
                )
                spl = sf[kh]
                idx = jnp.arange(h1.shape[0], dtype=jnp.int32)
                h = jnp.where(idx < spl, h1, h2)
            else:
                h = _gather_scan_flat(t, sp, sf, k, cap, n_rows)
            acc = acc + jnp.sum(h)
            pos = _mix(h + sp, n_rows)
        return acc

    res["routed"] = round(
        time_rate(lambda s: routed(table, pos0, seg=s), B) / 1e6, 1
    )
    log(f"{name} routed: {res['routed']} M rows/s")
    print(json.dumps({"exp": f"bigroute_{name}", "mode": mode,
                      "rows": n_rows, "gib": round(gib, 2),
                      "rates_Mrows": res}), flush=True)
    del table


def main():
    cases = os.environ.get("AWFM_AB_CASES", "half,flat,reshape,twohalf")
    for c in cases.split(","):
        if c == "half":
            run_case("half_flat", NB // 2, "flat")
        elif c == "flat":
            run_case("full_flat", NB, "flat")
        elif c == "reshape":
            run_case("full_reshape", NB, "reshape")
        elif c == "reshape_view":
            run_case("full_reshape_view", NB, "reshape_view")
        elif c == "static_unroll":
            run_case("full_static_unroll", NB, "static_unroll")
        elif c == "twohalf":
            run_case("full_twohalf", NB, "twohalf")
    log("done")


if __name__ == "__main__":
    main()
