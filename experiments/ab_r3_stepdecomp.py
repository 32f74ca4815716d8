"""Where does the digram step's time go? (v5e, 64M bases)

Round-3 calibration showed every engine kernel running 3-5x below the
measured pure-gather rate of its own table (BENCH_r03 fractions
0.18-0.30) — so at cache-friendly index scale the bottleneck is NOT
HBM row fetches. This decomposes one digram pair step
(ops/ngram.ngram_backward_step_pair, ~17.8 ms per 1M rows) into
cumulative stages, each timed with lo/hi-seg differencing (cancels
dispatch+sync overhead):

  W0  gather + row-sum                       (the calibration walk)
  W1  + 5-plane code-equality match (XOR/OR)
  W2  + one masked popcount reduce
  W3  + second masked popcount reduce
  W4  + 16-way milestone one-hot select
  W5  full step (adds Cn select + window/flag logic)
  W5t full step with milestone+Cn selects done as a 4-level binary
      tree instead of 16-way one-hot sweeps (select-cost probe)

Each stage feeds its result into the next index (dependent chain, like
the calibration) so nothing is dead-code-eliminated.
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
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu.ops.ngram import (
    _PAIR_IOTA,
    _geometry_pair,
    _pair_mask,
    _pair_match,
)

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
B = int(os.environ.get("AWFM_AB_BATCH", 1 << 20))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 10


def log(m):
    print(f"[stepdecomp] {m}", file=sys.stderr, flush=True)


def make_stage(ng, stage):
    n_words, _, n_planes, ms_offset, _ = _geometry_pair(ng.n)
    nb = ng.packed.shape[0]

    @functools.partial(jax.jit, static_argnames=("seg",))
    def run(idx, v, local, *, seg):
        for _ in range(seg):
            rows = ng.packed[idx]
            if stage == "W0":
                feed = jnp.sum(rows.astype(jnp.uint32), axis=1)
            else:
                match = _pair_match(ng, rows, v)
                if stage == "W1":
                    feed = jnp.sum(match.astype(jnp.uint32), axis=1)
                else:
                    occ_s = jnp.sum(
                        lax.population_count(match & _pair_mask(local)),
                        axis=1, dtype=jnp.int32,
                    ).astype(jnp.uint32)
                    if stage == "W2":
                        feed = occ_s
                    else:
                        occ_e = jnp.sum(
                            lax.population_count(
                                match & _pair_mask(local + 3)
                            ),
                            axis=1, dtype=jnp.int32,
                        ).astype(jnp.uint32)
                        if stage == "W3":
                            feed = occ_s + occ_e
                        else:
                            ms_all = lax.bitcast_convert_type(
                                rows[
                                    :, ms_offset : ms_offset + n_words * 4
                                ].reshape(-1, n_words, 4),
                                jnp.uint32,
                            )
                            if stage in ("W4", "W5"):
                                ms = jnp.zeros(v.shape, dtype=jnp.uint32)
                                for j in range(n_words):
                                    ms = ms + jnp.where(
                                        v == j, ms_all[:, j], jnp.uint32(0)
                                    )
                            else:  # W5t: binary select tree over bits of v
                                cur = ms_all
                                for bit in range(4):
                                    half = cur.shape[1] // 2
                                    sel = ((v >> bit) & 1) == 1
                                    cur = jnp.where(
                                        sel[:, None],
                                        cur[:, 1::2],
                                        cur[:, 0::2],
                                    )
                                ms = cur[:, 0]
                            if stage == "W4":
                                feed = ms + occ_s
                            else:  # W5 / W5t: + Cn select + step logic
                                if stage == "W5":
                                    cn = jnp.zeros(v.shape, dtype=jnp.uint32)
                                    for j in range(n_words):
                                        cn = cn + jnp.where(
                                            v == j, ng.cn[j], jnp.uint32(0)
                                        )
                                else:
                                    cur = ng.cn[None, :] * jnp.ones(
                                        (v.shape[0], 1), dtype=jnp.uint32
                                    )
                                    for bit in range(4):
                                        sel = ((v >> bit) & 1) == 1
                                        cur = jnp.where(
                                            sel[:, None],
                                            cur[:, 1::2],
                                            cur[:, 0::2],
                                        )
                                    cn = cur[:, 0]
                                new_s = cn + ms + occ_s
                                new_e = cn + ms + occ_e - jnp.uint32(1)
                                keep = new_s <= new_e
                                feed = jnp.where(keep, new_s, new_e)
            idx = (
                (idx.astype(jnp.uint32) * jnp.uint32(1103515245) + feed)
                % jnp.uint32(nb)
            ).astype(jnp.int32)
            v = (v + jnp.int32(1)) % jnp.int32(16)
        return idx

    return run


def main():
    rng = np.random.default_rng(1234)
    seq = rng.choice(np.frombuffer(b"acgt", np.uint8), size=NUM_BASES)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=12,
        alphabet_type=AlphabetType.DNA,
    )
    log("building index")
    index = create_index(seq.tobytes(), cfg)
    dig = ngram_ops.build_ngram_device(index, 2)
    nb = dig.packed.shape[0]

    idx0 = jnp.asarray(rng.integers(0, nb, size=B).astype(np.int32))
    v0 = jnp.asarray(rng.integers(0, 16, size=B).astype(np.int32))
    local0 = jnp.asarray(rng.integers(0, 500, size=B).astype(np.int32))
    jax.block_until_ready(local0)

    out = {"exp": "digram_step_decomposition", "batch": B}
    for stage in ("W0", "W1", "W2", "W3", "W4", "W5", "W5t"):
        fn = make_stage(dig, stage)

        def run(seg):
            _ = int(np.asarray(fn(idx0, v0, local0, seg=seg)[0]))

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
        per_step_ms = dt / (SEG_HI - SEG_LO) * 1e3
        out[stage] = round(per_step_ms, 2)
        log(f"{stage}: {per_step_ms:.2f} ms/step per {B} rows")
    print(json.dumps(out), flush=True)
    log("done")


if __name__ == "__main__":
    main()
