"""Where does the backtrace LF step's time go? (v5e, 64M bases)

ab_r3_mswsum showed the milestone weighted-sum rewrite buying +19% on
digram count but only ~3% on locate_first — the locate tail is the LF
backtrace (search.letter_and_lf_at: gather + letter reconstruction +
occ count + prefix-sum select). This decomposes one LF step into
cumulative stages with the stepdecomp lo/hi-seg differencing harness
(cancels dispatch+sync overhead):

  L0   gather + row-sum                         (calibration walk)
  L1   + letter reconstruction (letter_at_rows: one-hot byte mask,
        n_planes popcount reduces, v2i arithmetic inverse map)
  L2   + occ match/mask/popcount (no milestone)
  L3   + milestone, classic bitcast one-hot
  L3w  + milestone, weighted-byte-sum (AWFM_MS_WSUM form)
  L4   full LF (adds prefix-sum select + sentinel/done mask logic),
        wsum milestone

Each stage feeds its result into the next position (dependent chain)
so nothing is dead-code-eliminated.
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
from avxwindowfmindex_tpu.ops import rank as rank_ops
from avxwindowfmindex_tpu.ops.rank import (
    POSITIONS_PER_BLOCK,
    _inclusive_mask,
    _match_bytes,
    _milestone_wsum,
    _milestones_u32,
    _prefix_sum_select,
    letter_at_rows,
)

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
B = int(os.environ.get("AWFM_AB_BATCH", 1 << 20))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 10


def log(m):
    print(f"[btdecomp] {m}", file=sys.stderr, flush=True)


def make_stage(dev, stage, n):
    card = dev.cardinality

    @functools.partial(jax.jit, static_argnames=("seg",))
    def run(p, *, seg):
        for _ in range(seg):
            blk = (p // POSITIONS_PER_BLOCK).astype(jnp.int32)
            local = (p % POSITIONS_PER_BLOCK).astype(jnp.int32)
            rows = dev.packed[blk]
            if stage == "L0":
                feed = jnp.sum(rows.astype(jnp.uint32), axis=1)
            else:
                lett = letter_at_rows(dev, rows, local)
                if stage == "L1":
                    feed = lett.astype(jnp.uint32)
                else:
                    lclip = jnp.minimum(lett, card)
                    match = _match_bytes(dev, rows, lclip)
                    cnt = jnp.sum(
                        lax.population_count(match & _inclusive_mask(local)),
                        axis=1, dtype=jnp.int32,
                    ).astype(jnp.uint32)
                    if stage == "L2":
                        feed = cnt
                    else:
                        if stage == "L3":
                            ms_all = _milestones_u32(dev, rows)
                            ms = jnp.zeros(lclip.shape, dtype=jnp.uint32)
                            for j in range(card + 1):
                                ms = ms + jnp.where(
                                    lclip == j, ms_all[:, j], jnp.uint32(0)
                                )
                        else:  # L3w / L4
                            off = dev.milestone_offset
                            ms = _milestone_wsum(
                                rows[:, off : off + (card + 1) * 4],
                                lclip, card + 1,
                            )
                        occ = ms + cnt
                        if stage in ("L3", "L3w"):
                            feed = occ
                        else:  # L4: full LF step incl. done-mask logic
                            is_sent = lett == dev.sentinel
                            lf = (
                                _prefix_sum_select(dev, lclip)
                                + occ - jnp.uint32(1)
                            )
                            lf = jnp.where(is_sent, jnp.uint32(0), lf)
                            done = (p % jnp.uint32(8)) == 0
                            feed = jnp.where(done, p, lf)
            p = (
                p * jnp.uint32(1103515245) + feed
            ) % jnp.uint32(n)
        return p

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
    dev = index.to_device()
    n = index.bwt_length

    p0 = jnp.asarray(rng.integers(0, n, size=B).astype(np.uint32))
    jax.block_until_ready(p0)

    out = {"exp": "backtrace_lf_decomposition", "batch": B}
    for stage in ("L0", "L1", "L2", "L3", "L3w", "L4"):
        fn = make_stage(dev, stage, n)

        def run(seg):
            _ = int(np.asarray(fn(p0, seg=seg)[0]))

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
