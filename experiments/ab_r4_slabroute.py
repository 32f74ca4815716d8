"""Slab-routed gather: can partition + small-operand gathers beat the wall?

ab_r4_gathercliff established that full-row gathers from tables <= 64 MiB
run ~5.2x faster than from tables >= 128 MiB (498 vs 94.5 M rows/s at
128 B rows), that the cliff is a compile-time operand-size step (the
touched working set is irrelevant), and that the slow regime is a flat
~9.6 ns/row issue-rate wall. ab_r4_residual showed the production step
kernels already run at 75-86% of that wall, and that partitioning 4M
keys costs only a few ms on-device (sort ~4 ms marginal).

So the one remaining route past the wall: sort the batch's row indices,
then gather each contiguous run from a <= 64 MiB slab whose operand
shape puts XLA on the fast path. This script answers, in order:

  S  does a per-slab gather (operand = dynamic_slice / reshaped-row /
     standalone array of one 64 MiB slab) actually hit the fast rate,
     or does XLA fuse the slice back into a big-table gather?
     S0 mono 2 GiB baseline        (~94 expected)
     Sf standalone 64 MiB sanity   (~498 expected)
     S1 scan over K dynamic_slice slabs, pre-sorted idx
     S2 python-unrolled K separate-array slabs, pre-sorted idx
     S3 scan over reshaped (K, SR, rb) table rows, pre-sorted idx
  W  fast-regime rate at digram row width (384 B) — the hg38 range
     phase's rows: 48 MiB and 64 MiB standalone tables.
  F  the full production-shaped routed step at digram geometry
     (2.16 GiB, 384 B rows), chained data-dependently like the real
     extension loop:
     F0 mono chained           F0b mono + sort (isolates sort add-on)
     F1 routed: sort -> searchsorted -> per-slab gather -> stay
        permuted (production can carry origin ids; no unpermute).
     Checksum parity F1 == F0 is asserted (order-insensitive sum).

Timing: lo/hi segment differencing with scalar readbacks (cancels
dispatch + the ~30 ms tunnel sync; see ab_r3_locality.py).
"""

import json
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = int(os.environ.get("AWFM_AB_BATCH", 1 << 22))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8
GIB = 1 << 30
MIB = 1 << 20


def log(m):
    print(f"[slabroute] {m}", file=sys.stderr, flush=True)


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


def make_table(rows, rb, key):
    return jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (rows, rb), dtype=jnp.uint8))(key)
    )


def _mix(h, nrows):
    return ((h * jnp.uint32(2654435761)) % jnp.uint32(nrows)).astype(
        jnp.uint32
    )


# ----- slab gather cores (pre-sorted idx, independent steps) ---------------


def _routed_gather_scan(table, sp, starts_full, K, SR, cap):
    """Gather sorted rows sp via K dynamic-slice slabs; returns (B,) sums
    in sorted order (overhang rows overwritten by the next slab)."""
    rb = table.shape[1]
    b = sp.shape[0]
    sp_pad = jnp.concatenate(
        [sp, jnp.full((cap,), table.shape[0] - 1, dtype=sp.dtype)]
    )
    out = jnp.zeros((b + cap,), jnp.uint32)

    def body(carry, k):
        s = starts_full[k]
        win = lax.dynamic_slice(sp_pad, (s,), (cap,))
        local = jnp.clip(
            win.astype(jnp.int32) - k.astype(jnp.int32) * SR, 0, SR - 1
        )
        slab = lax.dynamic_slice(
            table, (k.astype(jnp.int32) * SR, 0), (SR, rb)
        )
        h = jnp.sum(slab[local].astype(jnp.uint32), axis=1)
        return lax.dynamic_update_slice(carry, h, (s,)), None

    out, _ = lax.scan(body, out, jnp.arange(K, dtype=jnp.int32))
    return out[:b]


def _routed_gather_reshape(table_r, sp, starts_full, K, SR, cap):
    """Same, but slab = table_r[k] on a (K, SR, rb) reshaped table."""
    b = sp.shape[0]
    nrows = K * SR
    sp_pad = jnp.concatenate(
        [sp, jnp.full((cap,), nrows - 1, dtype=sp.dtype)]
    )
    out = jnp.zeros((b + cap,), jnp.uint32)

    def body(carry, k):
        s = starts_full[k]
        win = lax.dynamic_slice(sp_pad, (s,), (cap,))
        local = jnp.clip(
            win.astype(jnp.int32) - k.astype(jnp.int32) * SR, 0, SR - 1
        )
        slab = table_r[k]
        h = jnp.sum(slab[local].astype(jnp.uint32), axis=1)
        return lax.dynamic_update_slice(carry, h, (s,)), None

    out, _ = lax.scan(body, out, jnp.arange(K, dtype=jnp.int32))
    return out[:b]


def _routed_gather_unrolled(tables, sp, starts_full, SR, cap):
    """Same, python-unrolled over a tuple of standalone slab arrays."""
    b = sp.shape[0]
    nrows = len(tables) * SR
    sp_pad = jnp.concatenate(
        [sp, jnp.full((cap,), nrows - 1, dtype=sp.dtype)]
    )
    out = jnp.zeros((b + cap,), jnp.uint32)
    for k, slab in enumerate(tables):
        s = starts_full[k]
        win = lax.dynamic_slice(sp_pad, (s,), (cap,))
        local = jnp.clip(win.astype(jnp.int32) - k * SR, 0, SR - 1)
        h = jnp.sum(slab[local].astype(jnp.uint32), axis=1)
        out = lax.dynamic_update_slice(out, h, (s,))
    return out[:b]


def _starts(sp, K, SR, b):
    bounds = (jnp.arange(1, K, dtype=jnp.uint32) * jnp.uint32(SR)).astype(
        sp.dtype
    )
    starts = jnp.searchsorted(sp, bounds).astype(jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), starts, jnp.full((1,), b, jnp.int32)]
    )


def phase_s():
    rows, rb = 1 << 24, 128  # 2 GiB
    K = 32
    SR = rows // K  # 64 MiB slabs
    cap = int(B / K * 1.05)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(5)
    log(f"phase S: 2 GiB table, K={K} slabs of {SR * rb // MIB} MiB, "
        f"B={B}, cap={cap}")
    table = make_table(rows, rb, key)
    idx_np = np.sort(rng.integers(0, rows - 200, size=B)).astype(np.uint32)
    sp = jax.block_until_ready(jnp.asarray(idx_np))
    res = {}

    @functools.partial(jax.jit, static_argnames=("seg",))
    def mono(t, s_idx, *, seg):
        acc = jnp.uint32(0)
        for s in range(seg):
            shifted = jnp.minimum(
                s_idx + jnp.uint32(7 * s), jnp.uint32(rows - 1)
            ).astype(jnp.int32)
            acc = acc + jnp.sum(t[shifted].astype(jnp.uint32))
        return acc

    res["S0_mono_2g"] = round(
        time_rate(lambda seg: mono(table, sp, seg=seg), B) / 1e6, 1
    )
    log(f"S0 mono 2 GiB: {res['S0_mono_2g']} M rows/s")

    small = make_table(SR, rb, jax.random.fold_in(key, 9))
    sp_small = jax.block_until_ready(
        jnp.asarray(np.sort(rng.integers(0, SR - 200, size=B))
                    .astype(np.uint32))
    )

    @functools.partial(jax.jit, static_argnames=("seg",))
    def mono_small(t, s_idx, *, seg):
        acc = jnp.uint32(0)
        for s in range(seg):
            shifted = jnp.minimum(
                s_idx + jnp.uint32(7 * s), jnp.uint32(SR - 1)
            ).astype(jnp.int32)
            acc = acc + jnp.sum(t[shifted].astype(jnp.uint32))
        return acc

    res["Sf_standalone_64m"] = round(
        time_rate(lambda seg: mono_small(small, sp_small, seg=seg), B) / 1e6,
        1,
    )
    log(f"Sf standalone 64 MiB: {res['Sf_standalone_64m']} M rows/s")
    del small

    def routed_steps(core):
        @functools.partial(jax.jit, static_argnames=("seg",))
        def f(t, s_idx, *, seg):
            acc = jnp.uint32(0)
            for s in range(seg):
                shifted = jnp.minimum(
                    s_idx + jnp.uint32(7 * s), jnp.uint32(rows - 1)
                )
                sf = _starts(shifted, K, SR, B)
                h = core(t, shifted, sf)
                acc = acc + jnp.sum(h)
            return acc

        return f

    s1 = routed_steps(
        lambda t, s_idx, sf: _routed_gather_scan(t, s_idx, sf, K, SR, cap)
    )
    res["S1_scan_dynslice"] = round(
        time_rate(lambda seg: s1(table, sp, seg=seg), B) / 1e6, 1
    )
    log(f"S1 scan dynamic_slice: {res['S1_scan_dynslice']} M rows/s")

    table_r = jax.block_until_ready(table.reshape(K, SR, rb))
    s3 = routed_steps(
        lambda t, s_idx, sf: _routed_gather_reshape(t, s_idx, sf, K, SR, cap)
    )
    res["S3_scan_reshaped"] = round(
        time_rate(lambda seg: s3(table_r, sp, seg=seg), B) / 1e6, 1
    )
    log(f"S3 scan reshaped rows: {res['S3_scan_reshaped']} M rows/s")
    del table_r

    tabs = tuple(
        jax.block_until_ready(jnp.array(table[k * SR : (k + 1) * SR]))
        for k in range(K)
    )
    del table
    s2 = routed_steps(
        lambda t, s_idx, sf: _routed_gather_unrolled(t, s_idx, sf, SR, cap)
    )
    res["S2_unrolled_arrays"] = round(
        time_rate(lambda seg: s2(tabs, sp, seg=seg), B) / 1e6, 1
    )
    log(f"S2 unrolled arrays: {res['S2_unrolled_arrays']} M rows/s")
    del tabs
    print(json.dumps({"exp": "S_slab_gather_2g_128B", "rates_Mrows": res}),
          flush=True)
    return res


def phase_w():
    key = jax.random.PRNGKey(2)
    rng = np.random.default_rng(6)
    res = {}
    for rb, mib in ((384, 48), (384, 64), (128, 64)):
        rows = mib * MIB // rb
        t = make_table(rows, rb, jax.random.fold_in(key, rb + mib))
        sp = jax.block_until_ready(
            jnp.asarray(np.sort(rng.integers(0, rows - 200, size=B))
                        .astype(np.uint32))
        )

        @functools.partial(jax.jit, static_argnames=("seg",))
        def mono_small(tt, s_idx, *, seg, _rows=rows):
            acc = jnp.uint32(0)
            for s in range(seg):
                shifted = jnp.minimum(
                    s_idx + jnp.uint32(7 * s), jnp.uint32(_rows - 1)
                ).astype(jnp.int32)
                acc = acc + jnp.sum(tt[shifted].astype(jnp.uint32))
            return acc

        rate = time_rate(lambda seg: mono_small(t, sp, seg=seg), B)
        res[f"{rb}B_{mib}MiB"] = {
            "Mrows": round(rate / 1e6, 1),
            "GBps": round(rate * rb / 1e9, 1),
        }
        log(f"W {rb} B rows, {mib} MiB: {rate / 1e6:.1f} M rows/s")
        del t
    print(json.dumps({"exp": "W_fastregime_width", "rates": res}), flush=True)
    return res


def phase_f(use_reshape):
    rb = 384
    SR = (48 * MIB) // rb  # 131072 rows -> 48 MiB slabs
    K = 46
    rows = K * SR  # 6.03M rows, 2.16 GiB (hg38 digram geometry is 2x this)
    cap = int(B / K * 1.08)
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(7)
    log(f"phase F: {rows * rb / GIB:.2f} GiB digram-shaped table, K={K} "
        f"slabs of 48 MiB, cap={cap}")
    table = make_table(rows, rb, key)
    pos0 = jax.block_until_ready(
        jnp.asarray(rng.integers(0, rows, size=B, dtype=np.uint32))
    )

    @functools.partial(jax.jit, static_argnames=("seg", "with_sort"))
    def mono_chain(t, pos, *, seg, with_sort):
        acc = jnp.uint32(0)
        for _ in range(seg):
            p = lax.sort(pos) if with_sort else pos
            h = jnp.sum(t[p.astype(jnp.int32)].astype(jnp.uint32), axis=1)
            acc = acc + jnp.sum(h)
            pos = _mix(h + p, rows)
        return acc

    @functools.partial(jax.jit, static_argnames=("seg",))
    def routed_chain(t, pos, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            sp = lax.sort(pos)
            sf = _starts(sp, K, SR, B)
            if use_reshape:
                h = _routed_gather_reshape(t, sp, sf, K, SR, cap)
            else:
                h = _routed_gather_scan(t, sp, sf, K, SR, cap)
            acc = acc + jnp.sum(h)
            pos = _mix(h + sp, rows)
        return acc

    t_arg = table.reshape(K, SR, rb) if use_reshape else table

    # checksum parity (order-insensitive, one step): routed == mono
    c_mono = int(np.asarray(mono_chain(table, pos0, seg=1, with_sort=True)))
    c_rout = int(np.asarray(routed_chain(t_arg, pos0, seg=1)))
    assert c_mono == c_rout, (c_mono, c_rout)
    log(f"F checksum parity ok ({c_mono})")

    res = {}
    res["F0_mono"] = round(
        time_rate(lambda seg: mono_chain(table, pos0, seg=seg,
                                         with_sort=False), B) / 1e6, 1
    )
    log(f"F0 mono chained: {res['F0_mono']} M rows/s")
    res["F0b_mono_sort"] = round(
        time_rate(lambda seg: mono_chain(table, pos0, seg=seg,
                                         with_sort=True), B) / 1e6, 1
    )
    log(f"F0b mono+sort chained: {res['F0b_mono_sort']} M rows/s")
    res["F1_routed"] = round(
        time_rate(lambda seg: routed_chain(t_arg, pos0, seg=seg), B) / 1e6, 1
    )
    log(f"F1 routed chained: {res['F1_routed']} M rows/s")
    print(json.dumps({"exp": "F_routed_digram_2g_384B",
                      "use_reshape": use_reshape, "rates_Mrows": res}),
          flush=True)


def main():
    s = phase_s()
    phase_w()
    # pick the faster slab-core formulation for the full routed step
    use_reshape = s.get("S3_scan_reshaped", 0) >= s.get("S1_scan_dynslice", 0)
    phase_f(use_reshape)
    log("done")


if __name__ == "__main__":
    main()
