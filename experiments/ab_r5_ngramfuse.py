"""AWFM_FUSE_NGRAM re-sweep at hg38 (gather-bound regime).

The fuse=1 default (one digram step per dispatched program) won at the
64M protocol where tables sit in the fast gather regime and XLA's
codegen for deeper fused programs pessimized compute
(experiments/ab_r2_config). At hg38 the range phase is gather-bound
(41.7M rows/s vs the 74.5M bare gather, ab_r5_locdecomp) and carries
38% of locate_all — if fusing steps lets XLA overlap/fuse better when
gathers dominate, both digram count and every locate stage gain.

Sweep: AWFM_FUSE_NGRAM in {1, 2, 3, 6} on the digram ranges phase
(4M 25-mers, seed k=13 -> 6 digram steps), REPS-median, warm artifact.
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

from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu import search as se

REPS = int(os.environ.get("AWFM_AB_REPS", 5))
NUM_BASES = 3_100_000_000
KMER_LEN = 25
SEED_K = 13
CACHE = os.environ.get("AWFM_BENCH_CACHE", "/root/bench_cache")


def log(m):
    print(f"[ngramfuse] {m}", file=sys.stderr, flush=True)


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
    dig = ngram_ops.build_ngram_device(
        index, 2, cache_path=os.path.join(CACHE, f"b{NUM_BASES}_ng2_pb1.npz")
    )
    log("digram ready")

    from avxwindowfmindex_tpu.models import alphabet as alpha

    b = 1 << 20  # the count protocol's measured-optimal dispatch chunk
    starts = np.random.default_rng(77).integers(
        0, NUM_BASES - KMER_LEN, size=b
    )
    windows = np.lib.stride_tricks.sliding_window_view(seq_arr, KMER_LEN)
    cm = jax.block_until_ready(
        jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )

    def ranges_once():
        s, e = se._ngram_ranges_steploop(
            dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        return float(np.asarray(jnp.sum(s) + jnp.sum(e)))

    res = {}
    checks = {}
    for fuse in (1, 2, 3, 6):
        os.environ["AWFM_FUSE_NGRAM"] = str(fuse)
        checks[fuse] = ranges_once()  # compile + warm; checksum parity
        ts = []
        for _ in range(REPS):
            t1 = time.time()
            ranges_once()
            ts.append(time.time() - t1)
        res[f"fuse{fuse}_s"] = round(float(np.median(ts)), 4)
        log(f"fuse{fuse}: {res[f'fuse{fuse}_s']}s")
    os.environ.pop("AWFM_FUSE_NGRAM", None)
    assert len(set(checks.values())) == 1, f"checksum divergence: {checks}"
    res["parity"] = "ok"
    print(json.dumps({"exp": "ngramfuse_hg38", "res": res}))


if __name__ == "__main__":
    main()
