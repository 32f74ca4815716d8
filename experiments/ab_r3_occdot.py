"""MXU occurrence-reduce A/B (AWFM_OCC_DOT) — end-to-end on v5e.

The TPU-optimized HLO of a digram pair step is one dominant VPU fusion
(estimated 18M cycles ~ the whole measured step) whose lane reductions
convert every u8 popcount byte to s32. AWFM_OCC_DOT=1 routes the
in-window popcount sums through int8 matmuls on the MXU instead
((B, 2W) popcount bytes x a block-ones matrix, f32-free, exact since
popcounts <= 8), in the digram pair step, the single-letter pair step,
and _count_rows (the LF backtrace).

Protocol identical to ab_r3_mswsum.py: one subprocess per setting,
digram count + locate_first, 1M 25-mers, seed k=12, 5 reps.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = int(os.environ.get("AWFM_AB_REPS", 5))


def child():
    import jax

    if os.environ.get("AWFM_AB_CPU") == "1":  # smoke-test path
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from avxwindowfmindex_tpu import (
        AlphabetType,
        IndexConfiguration,
        create_index,
    )
    from avxwindowfmindex_tpu.models import alphabet as alpha
    from avxwindowfmindex_tpu.ops import ngram as ngram_ops
    from avxwindowfmindex_tpu.search import (
        _ngram_ranges_steploop,
        _resolve_samples,
        backtrace_all,
    )

    tag = os.environ["AWFM_AB_TAG"]
    rng = np.random.default_rng(1234)
    seq = rng.choice(np.frombuffer(b"acgt", np.uint8), size=NUM_BASES)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.DNA,
    )
    print(f"[mswsum:{tag}] building index", file=sys.stderr, flush=True)
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

    def run_count():
        pend = []
        s, e = _ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K, defer=pend
        )
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        return finish(c[0], pend)

    def run_locate_first():
        pend = []
        s, e = _ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K, defer=pend
        )
        valid = s <= e
        pos = jnp.where(valid, s, jnp.uint32(0))
        p, off = backtrace_all(dev, pos)
        hits = _resolve_samples(dev, p, off)
        return finish(jnp.where(valid, hits, jnp.uint32(0))[0], pend)

    out = {"tag": tag, "check_count": run_count(),
           "check_locate": run_locate_first()}
    for name, fn in (("count", run_count), ("locate_first", run_locate_first)):
        fn()  # warm
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        out[name] = round(float(np.median(times)), 4)
        out[f"{name}_times"] = [round(t, 4) for t in times]
    print(json.dumps(out), flush=True)


CONFIGS = [
    ("vpu", {}),
    ("dot", {"AWFM_OCC_DOT": "1"}),
]


def main():
    results = {}
    for tag, flags in CONFIGS:
        env = dict(os.environ)
        env.update(flags)
        env["AWFM_AB_TAG"] = tag
        env["AWFM_AB_CHILD"] = "1"
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=2400,
        )
        sys.stderr.write(p.stderr[-2000:])
        assert p.returncode == 0, p.stderr[-4000:]
        res = json.loads(p.stdout.strip().split("\n")[-1])
        results[res.pop("tag")] = res
    # all paths must produce identical fold checks
    for tag, _ in CONFIGS[1:]:
        assert results["vpu"]["check_count"] == results[tag]["check_count"]
        assert results["vpu"]["check_locate"] == results[tag]["check_locate"]
    print(json.dumps({"exp": "occ_dot", **results}), flush=True)


if __name__ == "__main__":
    if os.environ.get("AWFM_AB_CHILD") == "1":
        child()
    else:
        main()
