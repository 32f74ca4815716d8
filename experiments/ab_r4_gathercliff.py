"""Bisect the big-table gather cliff (VERDICT r3, next-round item #1).

Round-3 facts (ab_r3_locality): full-row gather rate collapses from
486M rows/s (32 MB table, 128 B rows) to 84M rows/s (4 GB table,
256 B rows) INDEPENDENTLY of access order. In bytes/s that is
62 GB/s -> 21 GB/s, both far below the ~819 GB/s v5e HBM roofline.
Nobody bisected where the collapse happens or what drives it. Four
candidate mechanisms, each with a distinguishing signature:

  M1 touched-working-set (TLB reach / DRAM row-buffer hit rate):
     rate depends on the BYTES ACTUALLY TOUCHED, not the allocation.
     -> window sweep on one fixed 8 GB table must reproduce the cliff.
  M2 allocation-size lowering (XLA picks a different gather emission
     above some size, e.g. 2^31-byte offsets): rate steps at a size
     threshold even when the touched window is small.
     -> window sweep stays slow at small windows; size sweep steps.
  M3 bandwidth-per-transaction (rows/s capped by fetch granularity):
     rows/s is flat in row width; bytes/s grows with row width.
     -> width sweep at fixed 4 GB separates rows/s vs bytes/s caps.
  M4 table-count/parallelism (one gather stream underuses HBM):
     two half-width gathers from two tables beat one full-width one.
     -> column-split test at fixed total bytes.

Phases print one JSON line each, so partial runs still yield data.
Timing = lo/hi segment differencing with scalar readbacks (cancels
dispatch + tunnel sync overhead; see ab_r3_locality.py).
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = int(os.environ.get("AWFM_AB_BATCH", 1 << 20))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 4, 20
GIB = 1 << 30
MIB = 1 << 20


def log(m):
    print(f"[gathercliff] {m}", file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("seg",))
def gathers(table, idx, *, seg):
    """seg independent full-row gathers of (idx + const) per step."""
    nb = table.shape[0]
    acc = jnp.uint32(0)
    for s in range(seg):
        shifted = jnp.minimum(idx + jnp.int32(7 * s), jnp.int32(nb - 1))
        rows = table[shifted]
        acc = acc + jnp.sum(rows.astype(jnp.uint32))
    return acc


@functools.partial(jax.jit, static_argnames=("seg",))
def gathers_split(tables, idx, *, seg):
    """Column-split: same idx gathers one row slice from each table."""
    nb = tables[0].shape[0]
    acc = jnp.uint32(0)
    for s in range(seg):
        shifted = jnp.minimum(idx + jnp.int32(7 * s), jnp.int32(nb - 1))
        for t in tables:
            acc = acc + jnp.sum(t[shifted].astype(jnp.uint32))
    return acc


def time_rate(fn, n_rows, reps=REPS):
    """(rows/s) via lo/hi-seg differencing with scalar-readback syncs."""

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
    t = jax.block_until_ready(
        jax.jit(
            lambda k: jax.random.bits(k, (rows, rb), dtype=jnp.uint8),
            static_argnums=(),
        )(key)
    )
    return t


def main():
    rng = np.random.default_rng(42)
    key = jax.random.PRNGKey(0)

    # ---- Phase A: window sweep on ONE fixed 8 GiB table (64Mi x 128B).
    # Same compiled program for every window; only idx values change.
    rows_a, rb_a = 1 << 26, 128
    log(f"phase A: building {rows_a * rb_a / GIB:.0f} GiB table")
    table = make_table(rows_a, rb_a, key)
    res_a = {}
    for wrows in [1 << s for s in range(18, 27)]:  # 32 MiB .. 8 GiB
        idx = jax.block_until_ready(
            jnp.asarray(rng.integers(0, wrows, size=B).astype(np.int32))
        )
        rate = time_rate(lambda seg: gathers(table, idx, seg=seg), B)
        res_a[f"{wrows * rb_a // MIB}MiB"] = round(rate / 1e6, 1)
        log(f"A window {wrows * rb_a // MIB} MiB: {rate / 1e6:.1f} M rows/s")
    print(json.dumps({"exp": "A_window_sweep_8g_128B", "rates_Mrows": res_a}),
          flush=True)
    del table

    # ---- Phase B: table-size sweep at fixed 128 B rows, random idx
    # over the whole table. Detects allocation-size-driven steps.
    res_b = {}
    for srows in [1 << s for s in range(18, 27)]:  # 32 MiB .. 8 GiB
        t = make_table(srows, rb_a, key)
        idx = jax.block_until_ready(
            jnp.asarray(rng.integers(0, srows, size=B).astype(np.int32))
        )
        rate = time_rate(lambda seg: gathers(t, idx, seg=seg), B)
        res_b[f"{srows * rb_a // MIB}MiB"] = round(rate / 1e6, 1)
        log(f"B size {srows * rb_a // MIB} MiB: {rate / 1e6:.1f} M rows/s")
        del t
    print(json.dumps({"exp": "B_size_sweep_128B", "rates_Mrows": res_b}),
          flush=True)

    # ---- Phase C: row-width sweep at fixed 4 GiB total.
    res_c = {}
    for rb in (128, 256, 384, 512, 1024):
        srows = (4 * GIB) // rb
        t = make_table(srows, rb, key)
        idx = jax.block_until_ready(
            jnp.asarray(rng.integers(0, srows, size=B).astype(np.int32))
        )
        rate = time_rate(lambda seg: gathers(t, idx, seg=seg), B)
        res_c[f"{rb}B"] = {
            "Mrows": round(rate / 1e6, 1),
            "GBps": round(rate * rb / 1e9, 1),
        }
        log(f"C width {rb} B: {rate / 1e6:.1f} M rows/s "
            f"({rate * rb / 1e9:.1f} GB/s)")
        del t
    print(json.dumps({"exp": "C_width_sweep_4g", "rates": res_c}), flush=True)

    # ---- Phase D: column-split at fixed 4 GiB / 256 B logical rows.
    # K tables of 256/K-byte rows, same idx into each; a logical row
    # costs K gathers but each table is 4/K GiB.
    srows = (4 * GIB) // 256
    idx = jax.block_until_ready(
        jnp.asarray(rng.integers(0, srows, size=B).astype(np.int32))
    )
    res_d = {}
    t_mono = make_table(srows, 256, key)
    rate = time_rate(lambda seg: gathers(t_mono, idx, seg=seg), B)
    res_d["mono_256B"] = round(rate / 1e6, 1)
    log(f"D mono 256B: {rate / 1e6:.1f} M rows/s")
    del t_mono
    for k in (2, 4):
        tabs = tuple(
            make_table(srows, 256 // k, jax.random.fold_in(key, i))
            for i in range(k)
        )
        rate = time_rate(lambda seg: gathers_split(tabs, idx, seg=seg), B)
        res_d[f"split{k}_{256 // k}B"] = round(rate / 1e6, 1)
        log(f"D split{k} ({256 // k}B each): {rate / 1e6:.1f} M logical rows/s")
        del tabs
    print(json.dumps({"exp": "D_colsplit_4g_256B", "rates_Mrows": res_d}),
          flush=True)
    log("done")


if __name__ == "__main__":
    main()
