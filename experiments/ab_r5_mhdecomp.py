"""Multihit decomposition at hg38 (VERDICT r4 item 4).

multihit runs at 0.35-0.38 of its routed gather ceiling while
locate_all runs at 0.49; the round-5 locate decomposition showed the
"missing" time is composite structure (enumerate, compaction, tail,
per-phase dispatch) that the roofline's rows-at-calib-rates model does
not see. This script checks whether multihit has the SAME profile or a
real integration bug, and whether a bigger query batch (more hits per
dispatch) buys the routed regime more:

  - decompose the stage (ranges / enumerate / per-level backtrace /
    tail / resolve) at the protocol's 131072 14-mers (~1.6M hits);
  - repeat at 4x queries (524288 -> ~6.6M hits): L0 then walks at the
    measured-best 4M+ routed regime and every fixed cost amortizes.

Also validates the off_bits slice hypothesis from VERDICT: at hg38
shapes bits(1.7M)+off_bits(4) = 25 <= 32, so the max-slice path never
engages — it cannot be the multihit damper here.
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

from avxwindowfmindex_tpu.ops import route as route_ops
from avxwindowfmindex_tpu import search as se

REPS = int(os.environ.get("AWFM_AB_REPS", 5))
DECOMP_REPS = int(os.environ.get("AWFM_AB_DECOMP_REPS", 3))
NUM_BASES = 3_100_000_000
MH_LEN = 14
SEED_K = 13
CACHE = os.environ.get("AWFM_BENCH_CACHE", "/root/bench_cache")


def log(m):
    print(f"[mhdecomp] {m}", file=sys.stderr, flush=True)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.uint32))))


def timed(label, fn, reps, rec):
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        sync(out)
        ts.append(time.time() - t0)
    med = float(np.median(ts))
    rec.append({"phase": label, "s": round(med, 4)})
    log(f"  {label}: {med:.4f}s")
    return out


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

    from avxwindowfmindex_tpu.models import alphabet as alpha

    windows = np.lib.stride_tricks.sliding_window_view(seq_arr, MH_LEN)
    results = {}
    mh_rng = np.random.default_rng(99)
    for mh_q in (1 << 17, 1 << 19):
        starts = mh_rng.integers(0, NUM_BASES - MH_LEN, size=mh_q)
        mat = jax.block_until_ready(
            jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
        )
        lens = np.full(mh_q, MH_LEN, dtype=np.int32)
        s, e = se._ranges_steploop(dev, mat, lens, seeded=True)
        total = se.total_hits_host(s, e)
        cap = se._round_up(total, 65536)
        log(f"mh_q {mh_q}: {total} hits, capacity {cap}")

        def stage():
            s, e = se._ranges_steploop(dev, mat, lens, seeded=True)
            hits, _q, _m = se.locate_flat_device(dev, s, e, capacity=cap)
            return hits

        sync(stage())
        ts = []
        for _ in range(REPS):
            t1 = time.time()
            sync(stage())
            ts.append(time.time() - t1)
        stage_s = float(np.median(ts))
        log(f"mh_q {mh_q}: stage {stage_s:.4f}s")

        rec = []
        ranges = timed(
            "ranges",
            lambda: se._ranges_steploop(dev, mat, lens, seeded=True),
            DECOMP_REPS,
            rec,
        )
        s, e = ranges
        pqm = timed(
            "enumerate",
            lambda: se.enumerate_range_positions(s, e, capacity=cap),
            DECOMP_REPS,
            rec,
        )
        pos = pqm[0]
        b = pos.shape[0]
        first_seg, level_seg, slack, min_level, compact_mode = (
            se._bt_schedule(dev.ratio)
        )
        gather_undone = (
            se._gather_undone
            if compact_mode == "nonzero"
            else se._gather_undone_cumsum
        )
        zeros = jnp.zeros_like(pos)
        plan0 = route_ops.plan_for(
            dev.packed.shape[0], dev.packed.shape[1], b
        )
        p, off = timed(
            f"L0[{b}x{first_seg}]{'R' if plan0 else 'M'}",
            lambda: se._backtrace_steps_any(
                dev, pos, zeros, first_seg, None, prior_steps=0
            ),
            DECOMP_REPS,
            rec,
        )
        surv_first = (1.0 - 1.0 / dev.ratio) ** first_seg
        surv_level = (1.0 - 1.0 / dev.ratio) ** level_seg
        levels = []
        cur_p, cur_off = p, off
        m = se._round_up(int(b * surv_first * (100 + slack) / 100), 256)
        steps_so_far = first_seg
        li = 0
        while m >= min_level and m < cur_p.shape[0]:
            li += 1
            idx_sub = timed(
                f"L{li}.compact[{m}]",
                lambda m=m, cp=cur_p, co=cur_off: gather_undone(
                    dev, cp, co, m=m
                ),
                DECOMP_REPS,
                rec,
            )
            idx, sub_p, sub_off = idx_sub
            plan = route_ops.plan_for(
                dev.packed.shape[0], dev.packed.shape[1], m
            )
            sub = timed(
                f"L{li}.steps[{m}x{level_seg}]{'R' if plan else 'M'}",
                lambda sp=sub_p, so=sub_off, ss=steps_so_far: (
                    se._backtrace_steps_any(
                        dev, sp, so, level_seg, None, prior_steps=ss
                    )
                ),
                DECOMP_REPS,
                rec,
            )
            steps_so_far += level_seg
            levels.append((idx, cur_p, cur_off))
            cur_p, cur_off = sub
            m = se._round_up(int(m * surv_level * (100 + slack) / 100), 256)
        cur = timed(
            f"tail.straggler[{cur_p.shape[0]}]",
            lambda cp=cur_p, co=cur_off: se._backtrace_to_sampled_carry(
                dev, cp, co
            ),
            DECOMP_REPS,
            rec,
        )
        inner_p, inner_off = cur

        def scatter_net():
            cp, co = inner_p, inner_off
            for idx, par_p, par_off in reversed(levels):
                cp, co = se._scatter_back(par_p, par_off, idx, cp, co)
            if levels:
                cp, co = se._backtrace_to_sampled_carry(dev, cp, co)
            return cp, co

        cur_p, cur_off = timed(
            "tail.scatter+net", scatter_net, DECOMP_REPS, rec
        )
        timed(
            "resolve",
            lambda: se._resolve_samples(dev, cur_p, cur_off),
            DECOMP_REPS,
            rec,
        )
        results[f"q{mh_q}"] = {
            "stage_s": round(stage_s, 4),
            "total_hits": total,
            "capacity": cap,
            "qps": round(mh_q / stage_s),
            "hits_per_sec": round(total / stage_s),
            "phases": rec,
            "sum_s": round(sum(p["s"] for p in rec), 4),
        }
    print(json.dumps({"exp": "mhdecomp", "res": results}))


if __name__ == "__main__":
    main()
