"""Trigram (n=3) vs digram (n=2) revisited at the tuned seed k (v5e).

Round 1 measured trigram LOSING (1.92M vs 3.01M count q/s) — but that
was seed k=12 (13 extension letters), per-block 512 B rows, TWO-gather
steps, and the pre-wsum milestone kernels. The landscape changed:
pair rows make every step one gather, k=13/14 shortens the extension,
and the measured gather rate falls slowly with row size (single 128 B
480M rows/s, pair 256 B 286M, ngram-pair 384 B 243M — bench_r3_final
calibration). At k=13 a 25-mer is 4 trigram pair-steps (768 B rows)
vs 6 digram pair-steps (384 B): if the per-row rate at 768 B holds
near ~180M rows/s, 4 gathers beat 6.

Runs both engines in ONE process on the same k=13 index (table
537 MB), digram count vs trigram count, fold checks equal. Optionally
AWFM_SEED_K=14 for the 3-step+2-single split.
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
from avxwindowfmindex_tpu.search import _ngram_ranges_steploop

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
Q = 1 << 20
KMER_LEN = 25
SEED_K = int(os.environ.get("AWFM_SEED_K", 13))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))


def log(m):
    print(f"[trigram] {m}", file=sys.stderr, flush=True)


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
    log(f"building index (k={SEED_K})")
    index = create_index(seq.tobytes(), cfg)
    dev = index.to_device()
    log("building n-gram tables")
    ng2 = ngram_ops.build_ngram_device(index, 2)
    ng3 = ngram_ops.build_ngram_device(index, 3)

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jnp.asarray(
        np.ascontiguousarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    jax.block_until_ready(mat)

    def run_count(ng):
        pend = []
        s, e = _ngram_ranges_steploop(
            dev, ng, mat, kmer_len=KMER_LEN, seed_k=SEED_K, defer=pend
        )
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        vals = np.asarray(
            jnp.concatenate(
                [c[:1]] + [p[None].astype(jnp.uint32) for p, _ in pend]
            )
        )
        assert len(vals) == 1 or not vals[1:].any()
        return int(vals[0])

    out = {"exp": "trigram_vs_digram", "seed_k": SEED_K,
           "check2": run_count(ng2), "check3": run_count(ng3)}
    assert out["check2"] == out["check3"], out
    for tag, ng in (("digram", ng2), ("trigram", ng3)):
        run_count(ng)  # warm
        times = []
        for _ in range(REPS):
            t0 = time.time()
            run_count(ng)
            times.append(time.time() - t0)
        out[tag] = round(float(np.median(times)), 4)
        out[f"{tag}_times"] = [round(t, 4) for t in times]
        log(f"{tag}: {out[tag]} s")
    print(json.dumps(out), flush=True)
    log("done")


if __name__ == "__main__":
    main()
