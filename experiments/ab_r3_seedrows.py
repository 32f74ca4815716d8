"""Seed-table gather layout A/B (v5e) — no index build needed.

rangedecomp put the k=12 seed lookup at ~10 ms per 1M queries — ~100M
rows/s for (4^k, 2) u32 rows, vs 480M rows/s measured for 128 B rows.
This times three device layouts of the same table at k=12 (134 MB) and
k=14 (2.1 GB):

  narrow   (N, 2) u32 rows, gather + column reads   (current engine)
  rows16   (N/16, 32) u32 rows (128 B), gather + two masked reduces
           (interleaved s,e pairs; lane = idx & 15)
  rows32   (N/32, 64) u32 rows (256 B), same with lane = idx & 31

Feeds each result into the next index (dependent chain) and times with
the lo/hi-seg differencing harness. If rows16 wins, the engine gets a
cached wide view of the seed table.
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = int(os.environ.get("AWFM_AB_BATCH", 1 << 20))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
KS = [int(x) for x in os.environ.get("AWFM_AB_KS", "12,14").split(",")]
SEG_LO, SEG_HI = 2, 10


def log(m):
    print(f"[seedrows] {m}", file=sys.stderr, flush=True)


def make_narrow(tbl, n):
    @functools.partial(jax.jit, static_argnames=("seg",))
    def run(idx, *, seg):
        for _ in range(seg):
            row = tbl[idx]
            feed = row[:, 0] + row[:, 1]
            idx = ((idx.astype(jnp.uint32) * jnp.uint32(2654435761) + feed)
                   % jnp.uint32(n)).astype(jnp.int32)
        return idx

    return run


def make_rows(tbl_wide, n, lanes_pow):
    lanes = 1 << lanes_pow  # kmers per row
    width = 2 * lanes
    iota = jnp.arange(width, dtype=jnp.int32)[None, :]

    @functools.partial(jax.jit, static_argnames=("seg",))
    def run(idx, *, seg):
        for _ in range(seg):
            row = tbl_wide[idx >> lanes_pow]
            lane = (idx & (lanes - 1))[:, None]
            s = jnp.sum(
                jnp.where(iota == lane * 2, row, jnp.uint32(0)),
                axis=1, dtype=jnp.uint32,
            )
            e = jnp.sum(
                jnp.where(iota == lane * 2 + 1, row, jnp.uint32(0)),
                axis=1, dtype=jnp.uint32,
            )
            feed = s + e
            idx = ((idx.astype(jnp.uint32) * jnp.uint32(2654435761) + feed)
                   % jnp.uint32(n)).astype(jnp.int32)
        return idx

    return run


def time_fn(fn, idx0):
    def run(seg):
        _ = int(np.asarray(fn(idx0, seg=seg)[0]))

    run(SEG_LO)
    run(SEG_HI)
    lo_t, hi_t = [], []
    for _ in range(REPS):
        t0 = time.time()
        run(SEG_LO)
        lo_t.append(time.time() - t0)
        t0 = time.time()
        run(SEG_HI)
        hi_t.append(time.time() - t0)
    dt = float(np.median(hi_t)) - float(np.median(lo_t))
    return round(dt / (SEG_HI - SEG_LO) * 1e3, 2)


def main():
    if os.environ.get("AWFM_AB_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(7)
    out = {"exp": "seed_gather_layouts", "batch": B}
    for k in KS:
        n = 4**k
        host = rng.integers(0, 2**31, size=(n, 2), dtype=np.int64).astype(
            np.uint32
        )
        idx0 = jnp.asarray(
            rng.integers(0, n, size=B).astype(np.int32)
        )
        # parity of the select math on a small prefix
        tbl = jnp.asarray(host)
        fn_narrow = make_narrow(tbl, n)
        check = np.asarray(fn_narrow(idx0, seg=SEG_LO))
        res = {}
        res["narrow"] = time_fn(fn_narrow, idx0)
        del tbl, fn_narrow
        for pw in (4, 5):
            wide = jnp.asarray(host.reshape(n >> pw, 2 << pw))
            fn = make_rows(wide, n, pw)
            # identical select math -> identical dependent chain
            np.testing.assert_array_equal(
                np.asarray(fn(idx0, seg=SEG_LO)), check
            )
            res[f"rows{1 << pw}"] = time_fn(fn, idx0)
            del wide, fn
        out[f"k{k}"] = res
        log(f"k={k}: {res}")
    print(json.dumps(out), flush=True)
    log("done")


if __name__ == "__main__":
    main()
