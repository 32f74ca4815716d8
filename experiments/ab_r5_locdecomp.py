"""Account for the routed-integration gap: decompose hg38 locate_all.

VERDICT r4 weak #1: the routed backtrace LF wins 2.28x in isolation but
locate_all sits at ~0.49 of its composite gather ceiling, and nobody has
measured where the other half goes. This script loads the REAL hg38
artifact (the bench's own warm cache) and times every sub-phase of the
locate_all stage with explicit scalar-readback syncs:

  ranges     the digram backward search (unrouted; 384 B rows)
  enumerate  range expansion into the flat (capacity,) hit buffer
  L0         first backtrace pass: full batch x first_seg LF steps
             (pack + routed/mono steps + restore, each timed)
  L1..Ln     compaction levels: gather_undone + level_seg steps, with
             the level SIZE and whether the route policy engaged
  tail       straggler while_loop + scatter-backs + exactness net
  resolve    sampled-SA gather + mod (the phase ab_r4_resolve_route
             measured: mono ~75 M rows/s on GiB tables)

Readback caveat: each timed unit ends in a ~30 ms tunnel sync the
sync-free production driver does not pay, so the decomposed sum runs
OVER the un-instrumented stage; both are reported (`stage_s` vs
`sum_s`) and shares are computed against the decomposed sum.

Grid: CHUNK in {1M, 4M} x policy in {auto, route0, aggressive}
(aggressive: AWFM_ROUTE_MIN_BATCH=4096, AWFM_ROUTE_MIN_RATIO=10^9 so
every compaction level >= 4096 rows routes). Stage medians for all six;
full decomposition for 4M/{auto,aggressive} and 1M/auto.

Decision inputs this produces (VERDICT r4 next #1):
  - per-level routed-vs-mono time at production shapes;
  - the route-ineligible share (levels below the policy floor);
  - whether enumerate / resolve / sorts hide the missing time.
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
from avxwindowfmindex_tpu.ops import route as route_ops
from avxwindowfmindex_tpu import search as se

REPS = int(os.environ.get("AWFM_AB_REPS", 5))
DECOMP_REPS = int(os.environ.get("AWFM_AB_DECOMP_REPS", 3))
NUM_BASES = 3_100_000_000
KMER_LEN = 25
SEED_K = 13
CACHE = os.environ.get("AWFM_BENCH_CACHE", "/root/bench_cache")

POLICIES = {
    "auto": {},
    "route0": {"AWFM_ROUTE": "0"},
    "aggressive": {
        "AWFM_ROUTE_MIN_BATCH": "4096",
        "AWFM_ROUTE_MIN_RATIO": "1000000000",
    },
}
_POLICY_KEYS = sorted({k for v in POLICIES.values() for k in v})


def log(m):
    print(f"[locdecomp] {m}", file=sys.stderr, flush=True)


def set_policy(name):
    for k in _POLICY_KEYS:
        os.environ.pop(k, None)
    os.environ.update(POLICIES[name])


def sync(x):
    """Force completion with a scalar readback (block_until_ready only
    acks enqueue through the tunnel)."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.uint32))))


def timed(label, fn, reps, rec):
    out = fn()
    sync(out)  # warm-up / compile
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

    # protocol dev: config-ratio (8) samples, like the bench headline
    dev = _dc.replace(
        dev,
        sampled_sa=jnp.asarray(index.sampled_sa.astype(np.uint32)),
        ratio=8,
    )
    ng_path = os.path.join(CACHE, f"b{NUM_BASES}_ng2_pb1.npz")
    t0 = time.time()
    dig = ngram_ops.build_ngram_device(index, 2, cache_path=ng_path)
    log(f"digram loaded in {time.time()-t0:.1f}s")

    results = {"meta": {"reps": REPS, "decomp_reps": DECOMP_REPS}}

    for chunk_q in (1 << 20, 1 << 22):
        starts = np.random.default_rng(77).integers(
            0, NUM_BASES - KMER_LEN, size=chunk_q
        )
        windows = np.lib.stride_tricks.sliding_window_view(
            seq_arr, KMER_LEN
        )
        from avxwindowfmindex_tpu.models import alphabet as alpha

        cm = jax.block_until_ready(
            jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
        )

        # capacity exactly like bench.py: true hits rounded to 64K
        s, e = se._ngram_ranges_steploop(
            dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        cap = se._round_up(se.total_hits_host(s, e), 65536)
        log(f"chunk {chunk_q>>20}M: capacity {cap}")

        for policy in ("auto", "route0", "aggressive"):
            set_policy(policy)
            tag = f"c{chunk_q>>20}M_{policy}"

            # --- un-instrumented stage (bench-equivalent, one sync) ---
            def stage():
                s, e = se._ngram_ranges_steploop(
                    dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
                )
                hits, _qid, _m = se.locate_flat_device(
                    dev, s, e, capacity=cap
                )
                return hits

            sync(stage())
            ts = []
            for _ in range(REPS):
                t1 = time.time()
                sync(stage())
                ts.append(time.time() - t1)
            stage_s = float(np.median(ts))
            log(f"{tag}: stage {stage_s:.4f}s")
            entry = {"stage_s": round(stage_s, 4), "capacity": cap}

            # --- decomposition (skip route0/1M-aggressive: redundant) --
            if not (
                policy == "route0"
                or (policy == "aggressive" and chunk_q == 1 << 20)
            ):
                entry["phases"] = decompose(dev, dig, cm, cap)
                entry["sum_s"] = round(
                    sum(p["s"] for p in entry["phases"]), 4
                )
            results[tag] = entry

    set_policy("auto")
    print(json.dumps({"exp": "locdecomp", "res": results}))


def decompose(dev, dig, cm, cap):
    rec = []
    ranges = timed(
        "ranges",
        lambda: se._ngram_ranges_steploop(
            dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
        ),
        DECOMP_REPS,
        rec,
    )
    s, e = ranges
    pos_qid_mask = timed(
        "enumerate",
        lambda: se.enumerate_range_positions(s, e, capacity=cap),
        DECOMP_REPS,
        rec,
    )
    pos = pos_qid_mask[0]

    # ---- backtrace_all unrolled with per-level timing ----
    b = pos.shape[0]
    first_seg, level_seg, slack, min_level, compact_mode = se._bt_schedule(
        dev.ratio
    )
    gather_undone = (
        se._gather_undone
        if compact_mode == "nonzero"
        else se._gather_undone_cumsum
    )
    zeros = jnp.zeros_like(pos)
    plan0 = route_ops.plan_for(dev.packed.shape[0], dev.packed.shape[1], b)
    rec.append(
        {
            "phase": "L0.plan",
            "s": 0.0,
            "rows": b,
            "steps": first_seg,
            "routed": plan0 is not None,
        }
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
    return rec


if __name__ == "__main__":
    main()
