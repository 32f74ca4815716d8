"""Backtrace schedule re-sweep at hg38 4M-chunk production shapes.

The AWFM_BT_* defaults (FIRST_SEG=ratio, LEVEL_SEG=2*ratio, SLACK=8)
won the round-3 sweep at the 64M/1M-chunk protocol — BELOW the gather
cliff and with no routing. At hg38 with 4M chunks the trade moved:
compaction costs 73 ms at the L1 size, each routed step carries a
sort, and the route policy floor (~310K rows) makes LEVEL SIZING
decide whether a level routes at all (L2 at 202K runs mono; a shorter
LEVEL_SEG would keep it at ~342K and routed). This sweeps the
schedule knobs + backtrace fusion on the un-instrumented locate_all
stage (warm artifact, real positions), REPS-median per config.

Also sweeps AWFM_FUSE_BACKTRACE (8 vs 16): at 16-step levels, fuse 16
dispatches one program per level instead of two.
"""

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu import search as se

REPS = int(os.environ.get("AWFM_AB_REPS", 5))
NUM_BASES = 3_100_000_000
KMER_LEN = 25
SEED_K = 13
CACHE = os.environ.get("AWFM_BENCH_CACHE", "/root/bench_cache")


def log(m):
    print(f"[btsched5] {m}", file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    rng = np.random.default_rng(1234)
    seq_arr = rng.choice(np.frombuffer(b"acgt", np.uint8), size=NUM_BASES)
    log(f"sequence regenerated in {time.time()-t0:.1f}s")

    from avxwindowfmindex_tpu.io.artifact import load_artifact

    art = os.path.join(CACHE, f"b{NUM_BASES}_k{SEED_K}_r8_d4.awfmx")
    t0 = time.time()
    index = load_artifact(art)
    log(f"artifact loaded in {time.time()-t0:.1f}s")
    dev = index.to_device()
    import dataclasses as _dc

    dev = _dc.replace(
        dev,
        sampled_sa=jnp.asarray(index.sampled_sa.astype(np.uint32)),
        ratio=8,
    )
    ng_path = os.path.join(CACHE, f"b{NUM_BASES}_ng2_pb1.npz")
    dig = ngram_ops.build_ngram_device(index, 2, cache_path=ng_path)
    log("digram ready")

    from avxwindowfmindex_tpu.models import alphabet as alpha

    b = 1 << 22
    starts = np.random.default_rng(77).integers(
        0, NUM_BASES - KMER_LEN, size=b
    )
    windows = np.lib.stride_tricks.sliding_window_view(seq_arr, KMER_LEN)
    cm = jax.block_until_ready(
        jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    s, e = se._ngram_ranges_steploop(
        dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
    )
    cap = se._round_up(se.total_hits_host(s, e), 65536)
    log(f"capacity {cap}")

    def stage():
        s, e = se._ngram_ranges_steploop(
            dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        hits, _q, _m = se.locate_flat_device(dev, s, e, capacity=cap)
        return float(np.asarray(jnp.sum(hits.astype(jnp.uint32))))

    grid = []
    # (first_seg, level_seg, fuse_bt); default = (8, 16, 8)
    for fs, ls in [(8, 16), (8, 12), (8, 24), (6, 16), (8, 8), (4, 12)]:
        grid.append((fs, ls, 8))
    grid.append((8, 16, 16))
    grid.append((8, 12, 12))

    res = {}
    for fs, ls, fb in grid:
        os.environ["AWFM_BT_FIRST_SEG"] = str(fs)
        os.environ["AWFM_BT_LEVEL_SEG"] = str(ls)
        os.environ["AWFM_FUSE_BACKTRACE"] = str(fb)
        stage()  # compile + warm
        ts = []
        for _ in range(REPS):
            t1 = time.time()
            stage()
            ts.append(time.time() - t1)
        med = float(np.median(ts))
        key = f"first{fs}_level{ls}_fuse{fb}"
        res[key] = round(med, 4)
        log(f"{key}: {med:.4f}s")
    for k in ("AWFM_BT_FIRST_SEG", "AWFM_BT_LEVEL_SEG", "AWFM_FUSE_BACKTRACE"):
        os.environ.pop(k, None)
    print(json.dumps({"exp": "btsched_hg38", "res": res}))


if __name__ == "__main__":
    main()
