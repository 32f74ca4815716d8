"""Where the routed backtrace loses in PRODUCTION (real hg38 index).

bench_hg38_r4 vs the _route0 control isolates a 3.7-4.6x regression to
the routed backtrace; ab_r4_ballast rules OUT HBM co-residency (routed
holds ~2x mono at 1.9 GiB free). What the winning A/B never exercised:
`backtrace_all`'s compaction schedule + final while_loop exactness net,
and REAL walk/position data (sampled index: rows go done; cap-overflow
rows come back covered=False and fall to the net).

Warm-starts the cached hg38 artifact, reproduces the bench's locate
shapes (1M-query chunks, capacity 1114112), and times:

  K  kernel-only on real table + real range-start positions:
     _backtrace_steps_any(n_steps=8) mono vs routed — D2's comparison
     but with production data. If routed already loses here, the
     mechanism is data/table-specific; if it wins, it's the schedule.
  F  full backtrace_all(dev, starts) under
     (a) AWFM_ROUTE=0  (b) auto  (c) auto + CAP_SLACK=400 (overflow
     ~impossible: if (c) recovers, uncovered rows -> while_loop net is
     the mechanism)
  L  full locate_flat_device (enumerate + backtrace + resolve) under
     (a) and (b) — the 6.3 s stage.

All env knobs are resolved in Python before jit dispatch, so toggling
between calls retraces correctly.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu.io.artifact import load_artifact
from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu import search as S

B = 1 << 20
CAPACITY = 1114112  # run #1's per-chunk enumerate capacity
KMER_LEN = 25
SEED_K = 13
REPS = int(os.environ.get("AWFM_AB_REPS", 5))


def log(m):
    print(f"[routeprod] {m}", file=sys.stderr, flush=True)


def timeit(fn, reps=REPS):
    fn()  # compile + warm
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    t0 = time.time()
    index = load_artifact("/root/bench_cache/b3100000000_k13_r8_d4.awfmx")
    log(f"artifact loaded in {time.time()-t0:.1f}s")
    t0 = time.time()
    dev = index.to_device()
    dig = ngram_ops.build_ngram_device(
        index, 2, cache_path="/root/bench_cache/b3100000000_ng2_pb1.npz"
    )
    log(f"device tables up in {time.time()-t0:.1f}s")

    seq_arr = np.frombuffer(index.sequence, dtype=np.uint8)
    rng = np.random.default_rng(99)
    starts_idx = rng.integers(0, len(seq_arr) - KMER_LEN, size=B)
    windows = np.lib.stride_tricks.sliding_window_view(seq_arr, KMER_LEN)
    mat = alpha.NT_ASCII_TO_INDEX[windows[starts_idx]]
    cm = jax.block_until_ready(jnp.asarray(mat))

    s, e = S._ngram_ranges_steploop(
        dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
    )
    valid = s <= e
    pos = jax.block_until_ready(jnp.where(valid, s, jnp.uint32(0)))
    nhit = int(np.asarray(jnp.sum(valid.astype(jnp.uint32))))
    log(f"ranges ready; {nhit}/{B} queries hit")

    res = {}

    # K: kernel-only, real table + real positions
    off0 = jnp.zeros_like(pos)
    for mode, env in (("mono", "0"), ("routed", "auto")):
        os.environ["AWFM_ROUTE"] = env

        def k_fn():
            p, o = S._backtrace_steps_any(
                dev, pos, off0, 8, None, prior_steps=0
            )
            return int(np.asarray(jnp.sum(p) + jnp.sum(o)))

        res[f"K_steps8_{mode}"] = round(timeit(k_fn), 4)
        log(f"K steps8 {mode}: {res[f'K_steps8_{mode}']}s")

    # F: full backtrace_all under three policies
    for name, env in (
        ("route0", {"AWFM_ROUTE": "0"}),
        ("auto", {"AWFM_ROUTE": "auto"}),
        ("auto_slack400", {"AWFM_ROUTE": "auto",
                           "AWFM_ROUTE_CAP_SLACK": "400"}),
    ):
        os.environ.pop("AWFM_ROUTE_CAP_SLACK", None)
        os.environ.update(env)

        def f_fn():
            p, o = S.backtrace_all(dev, pos)
            h = S._resolve_samples(dev, p, o)
            return int(np.asarray(h[0] + h[-1]))

        res[f"F_bt_all_{name}"] = round(timeit(f_fn), 4)
        log(f"F backtrace_all {name}: {res[f'F_bt_all_{name}']}s")
    os.environ.pop("AWFM_ROUTE_CAP_SLACK", None)

    # L: the full locate_all chunk under route0/auto
    for name, env in (("route0", "0"), ("auto", "auto")):
        os.environ["AWFM_ROUTE"] = env

        def l_fn():
            hits, _qid, _mask = S.locate_flat_device(
                dev, s, e, capacity=CAPACITY
            )
            return int(np.asarray(hits[0]))

        res[f"L_locate_flat_{name}"] = round(timeit(l_fn), 4)
        log(f"L locate_flat {name}: {res[f'L_locate_flat_{name}']}s")

    print(json.dumps({"exp": "route_prod_hg38", "res": res}))


if __name__ == "__main__":
    main()
