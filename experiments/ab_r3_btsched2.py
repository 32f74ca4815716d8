"""Backtrace schedule sweep (v5e, 64M bases) — round 3.

btdecomp measured the LF step at ~4 ms per 1M rows, so the USEFUL
backtrace work for 1M ratio-8 locates is ~14 ms (avg 3.5 steps/row) —
yet locate_first - count = ~163 ms. The gap is schedule overhead:
masked steps over done rows, the sized-nonzero compactions (~22 ms per
1M, round-2 measurement), scatters, and while_loop cond evals. This
sweeps the (exactness-preserving) schedule knobs added to
search.backtrace_all:

  base          current defaults (first/level seg = ratio, slack 31,
                nonzero compaction)
  slack8        tighter level sizing (3-sigma-safe at >=4096 rows)
  seg2x         2*ratio steps per compacted level (half the levels)
  first5        compact earlier (5 steps, ~52% survival) — trades
                3 full-batch masked steps for a bigger first level
  cumsum        cumsum+scatter compaction instead of sized nonzero
  tight         slack8 + seg2x + cumsum combined

Each config runs in-process (knobs are read per backtrace_all call;
jitted step programs are shared). Times locate_first on 1M seeded
25-mers with the bench defer protocol; count timed once as the
baseline to subtract. Fold checks must agree across configs.
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
from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu.search import (
    _ngram_ranges_steploop,
    _resolve_samples,
    backtrace_all,
)

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = int(os.environ.get("AWFM_AB_REPS", 5))

# Round 1 of the sweep (ab_r3_btsched2_results.txt): base 0.2616 /
# slack8 0.2417 / seg2x 0.2236 / first5 0.2490 / cumsum 0.2449 /
# tight(slack8+seg2x+cumsum) 0.1924 s. `tight` became the default;
# round 2 refines around it (AWFM_AB_ROUND=2).
ROUND1 = [
    ("base", {"AWFM_BT_SLACK": "31", "AWFM_BT_LEVEL_SEG": "8",
              "AWFM_BT_COMPACT": "nonzero"}),
    ("slack8", {"AWFM_BT_SLACK": "8", "AWFM_BT_LEVEL_SEG": "8",
                "AWFM_BT_COMPACT": "nonzero"}),
    ("seg2x", {"AWFM_BT_SLACK": "31", "AWFM_BT_LEVEL_SEG": "16",
               "AWFM_BT_COMPACT": "nonzero"}),
    ("first5", {"AWFM_BT_SLACK": "31", "AWFM_BT_LEVEL_SEG": "8",
                "AWFM_BT_COMPACT": "nonzero", "AWFM_BT_FIRST_SEG": "5"}),
    ("cumsum", {"AWFM_BT_SLACK": "31", "AWFM_BT_LEVEL_SEG": "8"}),
    ("tight", {}),
]
ROUND2 = [
    ("tight", {}),  # the new default: slack 8, level seg 2*ratio, cumsum
    ("seg24", {"AWFM_BT_LEVEL_SEG": "24"}),
    ("slack4", {"AWFM_BT_SLACK": "4"}),
    ("min16k", {"AWFM_BT_MIN_LEVEL": "16384"}),
    ("min16k_seg24", {"AWFM_BT_MIN_LEVEL": "16384",
                      "AWFM_BT_LEVEL_SEG": "24"}),
    ("first16", {"AWFM_BT_FIRST_SEG": "16"}),
]
CONFIGS = ROUND2 if os.environ.get("AWFM_AB_ROUND") == "2" else ROUND1
KNOBS = ["AWFM_BT_SLACK", "AWFM_BT_LEVEL_SEG", "AWFM_BT_FIRST_SEG",
         "AWFM_BT_COMPACT", "AWFM_BT_MIN_LEVEL"]


def log(m):
    print(f"[btsched2] {m}", file=sys.stderr, flush=True)


def main():
    if os.environ.get("AWFM_AB_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(1234)
    seq = rng.choice(np.frombuffer(b"acgt", np.uint8), size=NUM_BASES)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.DNA,
    )
    log("building index")
    index = create_index(seq.tobytes(), cfg)
    dev = index.to_device()
    dig = ngram_ops.build_ngram_device(index, 2)

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jnp.asarray(
        np.ascontiguousarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    jax.block_until_ready(mat)

    def finish(total, pend):
        vals = np.asarray(
            jnp.concatenate(
                [total[None]] + [c[None].astype(jnp.uint32) for c, _ in pend]
            )
        )
        assert len(vals) == 1 or not vals[1:].any()
        return int(vals[0])

    def ranges():
        pend = []
        s, e = _ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K, defer=pend
        )
        return s, e, pend

    def run_count():
        s, e, pend = ranges()
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        return finish(c[0], pend)

    def run_locate_first():
        s, e, pend = ranges()
        valid = s <= e
        pos = jnp.where(valid, s, jnp.uint32(0))
        p, off = backtrace_all(dev, pos)
        hits = _resolve_samples(dev, p, off)
        return finish(jnp.where(valid, hits, jnp.uint32(0))[0], pend)

    out = {"exp": "btsched2", "check_count": run_count()}
    # time count once: the locate figures below share this range phase
    run_count()
    ct = []
    for _ in range(REPS):
        t0 = time.time()
        run_count()
        ct.append(time.time() - t0)
    out["count"] = round(float(np.median(ct)), 4)

    checks = {}
    for tag, flags in CONFIGS:
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(flags)
        checks[tag] = run_locate_first()  # also warms this schedule
        times = []
        for _ in range(REPS):
            t0 = time.time()
            run_locate_first()
            times.append(time.time() - t0)
        out[tag] = round(float(np.median(times)), 4)
        out[f"{tag}_times"] = [round(t, 4) for t in times]
        log(f"{tag}: {out[tag]} s")
    for k in KNOBS:
        os.environ.pop(k, None)
    assert len(set(checks.values())) == 1, checks
    out["check_locate"] = checks[CONFIGS[0][0]]
    print(json.dumps(out), flush=True)
    log("done")


if __name__ == "__main__":
    main()
