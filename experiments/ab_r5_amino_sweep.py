"""Amino dispatch/VPU sweep (VERDICT r4 item 8).

Amino tables at the 16M-letter protocol are 32 MB — deep in the FAST
gather regime — so amino's gap to DNA (locate_all 3.12M vs 5.40M) is
dispatch/VPU-bound, an axis no experiment has touched. Grid, one
process, env knobs re-read per call:

  count:        AWFM_FUSE_STEPS in {2, 4, 8, 15}  (15 post-seed steps)
  locate_first: AWFM_FUSE_BACKTRACE in {4, 8, 16}
  both:         AWFM_MS_WSUM in {1, 0} at the best fuse (the wsum
                milestone won +20% on DNA digram rows; the amino
                84 B/21-word section is a different shape)
  locate_all:   best knobs + the round-5 delta enumerate (free)

Protocol: 16M letters, 1M 20-mers, k=5, ratio 8 — amino_r2b/r3 exact,
so results chain onto the round-3 chronology.
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

from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu import search as S

NUM_LETTERS = 16_000_000
Q = 1 << 20
KMER_LEN = 20
SEED_K = 5
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
AA = b"ACDEFGHIKLMNPQRSTVWY"


def log(m):
    print(f"[aasweep] {m}", file=sys.stderr, flush=True)


def timed(fn, reps=REPS):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(float(np.median(ts)), 4)


def main():
    rng = np.random.default_rng(4321)
    seq = rng.choice(np.frombuffer(AA, np.uint8), size=NUM_LETTERS)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.AMINO,
    )
    log("building amino index")
    index = create_index(seq.tobytes(), cfg)
    dev = index.to_device()

    starts = rng.integers(0, NUM_LETTERS - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jax.block_until_ready(
        jnp.asarray(alpha.AA_ASCII_TO_INDEX[windows[starts]])
    )
    lens = np.full(Q, KMER_LEN, dtype=np.int32)
    log("queries ready")

    def count_once():
        s, e = S._ranges_steploop(dev, mat, lens, seeded=True)
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        _ = int(np.asarray(c[0]))

    def locate_first_once():
        s, e = S._ranges_steploop(dev, mat, lens, seeded=True)
        valid = s <= e
        pos = jnp.where(valid, s, jnp.uint32(0))
        p, off = S.backtrace_all(dev, pos)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    res = {"fuse_steps_count_s": {}, "fuse_bt_locate_first_s": {}}
    for fs in (2, 4, 8, 15):
        os.environ["AWFM_FUSE_STEPS"] = str(fs)
        res["fuse_steps_count_s"][fs] = timed(count_once)
        log(f"count fuse_steps={fs}: {res['fuse_steps_count_s'][fs]}")
    best_fs = min(
        res["fuse_steps_count_s"], key=res["fuse_steps_count_s"].get
    )
    os.environ["AWFM_FUSE_STEPS"] = str(best_fs)

    for fb in (4, 8, 16):
        os.environ["AWFM_FUSE_BACKTRACE"] = str(fb)
        res["fuse_bt_locate_first_s"][fb] = timed(locate_first_once)
        log(f"locate_first fuse_bt={fb}: {res['fuse_bt_locate_first_s'][fb]}")
    best_fb = min(
        res["fuse_bt_locate_first_s"], key=res["fuse_bt_locate_first_s"].get
    )
    os.environ["AWFM_FUSE_BACKTRACE"] = str(best_fb)

    # milestone weighted-sum on/off at the best fuse settings
    res["ms_wsum"] = {}
    for ws in ("1", "0"):
        os.environ["AWFM_MS_WSUM"] = ws
        res["ms_wsum"][f"count_ws{ws}"] = timed(count_once)
        res["ms_wsum"][f"first_ws{ws}"] = timed(locate_first_once)
        log(f"ms_wsum={ws}: {res['ms_wsum']}")
    os.environ.pop("AWFM_MS_WSUM", None)

    # locate_all at the best knobs (delta enumerate rides along)
    s, e = S._ranges_steploop(dev, mat, lens, seeded=True)
    cap = S._round_up(S.total_hits_host(s, e), 65536)

    def locate_all_once():
        s, e = S._ranges_steploop(dev, mat, lens, seeded=True)
        hits, _q, _m = S.locate_flat_device(dev, s, e, capacity=cap)
        _ = int(np.asarray(hits[0]))

    res["locate_all_s"] = timed(locate_all_once)
    res["locate_all_qps"] = round(Q / res["locate_all_s"])
    res["best"] = {"fuse_steps": best_fs, "fuse_backtrace": best_fb}
    res["count_qps_best"] = round(Q / res["fuse_steps_count_s"][best_fs])
    res["locate_first_qps_best"] = round(
        Q / res["fuse_bt_locate_first_s"][best_fb]
    )
    log(f"done: {res['best']}")
    print(json.dumps({"exp": "amino_sweep", "res": res}))


if __name__ == "__main__":
    main()
