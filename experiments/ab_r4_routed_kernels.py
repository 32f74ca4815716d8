"""A/B the PRODUCTION routed kernels at hg38 geometry (synthetic tables).

ab_r4_slabroute proved the routing mechanism on bare gathers; three
integration attempts then measured LOSSES whose autopsies (recorded in
this results file + docs/PERFORMANCE.md) shaped the v3 production
design this script now measures:

  v1  per-step restore + five-operand STABLE sorts: 38.7 vs mono 50.5
      (stable sorts ~6 ms and 2x/step; R0 shows unstable 3-op = 2.4 ms)
  v2a compute-in-scan routed_compute: 32.0 (per-window compute ~3x the
      full-batch rate)
  v2b gather-only + per-step (B,) u8 word gather + lax.cond overflow
      fallback: 31.9 (R4 ladder: word gather ~35 ms, cond ~10 ms,
      materialize ~20 ms)
  v3  gather-only routed_gather -> (rows, covered); words packed into
      ONE u32 sort payload for ALL steps; cond replaced by per-row
      covered flags absorbed by the existing exact redo nets

  R0 sort-arity ladder: lax.sort cost vs operand count & stability
  R1 digram pair step:  ngram_backward_step_pair vs _routed (4.33 GiB
     pair table), chained data-dependently
  R2 backtrace segment: _backtrace_steps_fused vs _routed (1.44 GiB),
     ratio pinned huge so every step stays active (pure kernel rate),
     at the compaction-level batch sizes (4M, 1.4M, 512K)

Timing: lo/hi segment differencing with scalar readbacks (cancels
dispatch + the ~30 ms tunnel sync and any per-call pack/restore).
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

from avxwindowfmindex_tpu.models.config import AlphabetType
from avxwindowfmindex_tpu.models.index import DeviceIndex, device_code_masks
from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.ops import ngram as ng_ops
from avxwindowfmindex_tpu.ops import route as route_ops
from avxwindowfmindex_tpu import search as S

B = int(os.environ.get("AWFM_AB_BATCH", 1 << 22))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8
NB = int(os.environ.get("AWFM_AB_NB", 12_109_376))  # hg38 block count


def log(m):
    print(f"[routedk] {m}", file=sys.stderr, flush=True)


def time_rate(fn, n_rows, reps=REPS):
    def run(seg):
        _ = int(np.asarray(fn(seg)))

    run(SEG_LO)
    run(SEG_HI)
    lo_t, hi_t = [], []
    for _ in range(reps):
        t0 = time.time()
        run(SEG_LO)
        lo_t.append(time.time() - t0)
        t0 = time.time()
        run(SEG_HI)
        hi_t.append(time.time() - t0)
    dt = float(np.median(hi_t)) - float(np.median(lo_t))
    if dt <= 0:
        dt = float(np.median(hi_t))
        return n_rows * SEG_HI / dt
    return n_rows * (SEG_HI - SEG_LO) / dt


def _mix(h, n):
    return ((h * jnp.uint32(2654435761)) % jnp.uint32(n)).astype(jnp.uint32)


def r0_sorts():
    rng = np.random.default_rng(1)
    res = {}
    for b in (B, B // 8):
        key0 = jnp.asarray(rng.integers(0, 1 << 31, size=b, dtype=np.uint32))
        pays = [
            jnp.asarray(rng.integers(0, 1 << 31, size=b, dtype=np.uint32))
            for _ in range(4)
        ]
        jax.block_until_ready((key0, pays))
        for arity in (1, 2, 3, 5):
            for stable in (False, True):
                @functools.partial(jax.jit, static_argnames=("seg",))
                def f(k0, ps, *, seg, _a=arity, _s=stable):
                    k = k0
                    acc = jnp.uint32(0)
                    for _ in range(seg):
                        ops = lax.sort(
                            (k, *ps[: _a - 1]), num_keys=1, is_stable=_s
                        )
                        k = ops[0]
                        acc = acc + k[0] + k[-1]
                        k = _mix(k + acc, 1 << 31)
                    return acc

                rate = time_rate(lambda s: f(key0, pays, seg=s), b)
                ms = b / rate * 1e3
                res[f"B{b}_a{arity}_{'st' if stable else 'un'}"] = round(
                    ms, 2
                )
                log(f"R0 b={b} arity={arity} stable={stable}: "
                    f"{ms:.2f} ms/sort")
    print(json.dumps({"exp": "R0_sort_ladder_ms", "ms_per_sort": res}),
          flush=True)


def r1_digram():
    key = jax.random.PRNGKey(3)
    _, _, _, _, prb = ng_ops._geometry_pair(2)
    log(f"building synthetic digram table ({NB} x {prb} B)")
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, prb), dtype=jnp.uint8))(key)
    )
    ng = ng_ops.NgramIndex(
        packed=table, cn=jnp.zeros((16,), jnp.uint32), n=2, biased=True
    )
    rng = np.random.default_rng(9)
    lim = NB * 256 - 600
    pos0 = jnp.asarray(rng.integers(1, lim, size=B, dtype=np.uint32))
    # SEG_HI words of 4 bits each pack one u32 exactly (production
    # carries every step's word as a sort payload — v3 design)
    wpk0 = jnp.asarray(
        rng.integers(0, 1 << 32, size=B, dtype=np.uint32)
    )
    jax.block_until_ready((pos0, wpk0))
    plan = route_ops.plan_for(NB, prb, B)
    log(f"plan: {plan}")

    @functools.partial(jax.jit, static_argnames=("seg",))
    def mono(ngx, pos, wpk, *, seg):
        acc = jnp.uint32(0)
        for s in range(seg):
            v = ((wpk >> jnp.uint32(4 * s)) & jnp.uint32(15)).astype(
                jnp.int32
            )
            letters = [(v >> 2) & 3, v & 3]
            start = pos
            end = pos + jnp.uint32(300)
            bad = jnp.zeros(pos.shape, dtype=bool)
            ns, ne, bad = ng_ops.ngram_backward_step_pair(
                ngx, start, end, letters, bad
            )
            h = ns + ne + bad.astype(jnp.uint32)
            acc = acc + jnp.sum(h)
            pos = jnp.maximum(_mix(h + ns - ne, lim), jnp.uint32(1))
        return acc

    @functools.partial(jax.jit, static_argnames=("seg",))
    def routed(ngx, pos, wpk, *, seg):
        # state stays permuted across steps, exactly like the steploop
        acc = jnp.uint32(0)
        orig = jnp.arange(pos.shape[0], dtype=jnp.uint32)
        for s in range(seg):
            start = pos
            end = pos + jnp.uint32(300)
            bad = jnp.zeros(pos.shape, dtype=bool)
            ns, ne, bad, orig, wpk = ng_ops.ngram_backward_step_pair_routed(
                ngx, start, end, bad, orig, wpk, s, plan
            )
            h = ns + ne + bad.astype(jnp.uint32)
            acc = acc + jnp.sum(h)  # order-insensitive
            pos = jnp.maximum(_mix(h + ns - ne, lim), jnp.uint32(1))
        return acc

    # chained parity is order-sensitive through _mix(h + pos): pin it by
    # making the next pos depend only on this row's values (h, ns, ne all
    # travel together); one-step sums must agree exactly
    a = int(np.asarray(mono(ng, pos0, wpk0, seg=1)))
    b = int(np.asarray(routed(ng, pos0, wpk0, seg=1)))
    assert a == b, (a, b)
    log("R1 parity ok")
    res = {}
    res["mono"] = round(
        time_rate(lambda s: mono(ng, pos0, wpk0, seg=s), B) / 1e6, 1
    )
    log(f"R1 mono {res['mono']} M rows/s")
    res["routed"] = round(
        time_rate(lambda s: routed(ng, pos0, wpk0, seg=s), B) / 1e6, 1
    )
    log(f"R1 routed {res['routed']} M rows/s")
    print(json.dumps({"exp": "R1_digram_step_hg38_v3", "rates_Mrows": res}),
          flush=True)
    del table, ng


def _mk_dev(nb):
    key = jax.random.PRNGKey(4)
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (nb, 128), dtype=jnp.uint8))(key)
    )
    return DeviceIndex(
        packed=table,
        packed_pair=None,
        prefix_sums=jnp.zeros((6,), jnp.uint32),
        seed_table=None,
        sampled_sa=None,
        code_masks=jnp.asarray(device_code_masks(AlphabetType.DNA)),
        vec_to_index=jnp.asarray(
            np.asarray(alpha.vector_to_index_lut(AlphabetType.DNA))
        ),
        bwt_length=nb * 256,
        ratio=2147483647,  # nothing is ever "sampled": pure kernel rate
        kmer_length_in_seed_table=13,
        alphabet=AlphabetType.DNA,
    )


def r2_backtrace():
    log(f"building synthetic single table ({NB} x 128 B)")
    dev = _mk_dev(NB)
    rng = np.random.default_rng(11)
    off_bits = 8  # static budget >= SEG_HI steps
    res = {}
    # arrays MUST be jit arguments, not closure captures: closed-over
    # device arrays embed as HLO literal constants, and a 32 MB program
    # upload wedges the remote-compile relay (~6 KB/s; two runs died
    # exactly there before this was diagnosed)
    @functools.partial(jax.jit, static_argnames=("seg",))
    def mono_f(dv, pos, off, *, seg):
        p, o = S._backtrace_steps_fused(dv, pos, off, seg=seg)
        return jnp.sum(p) + jnp.sum(o)

    @functools.partial(jax.jit, static_argnames=("seg", "plan"))
    def routed_f(dv, pos, off, *, seg, plan):
        p, pk = S._bt_routed_pack(pos, off, off_bits=off_bits)
        p, pk = S._backtrace_steps_fused_routed(dv, p, pk, seg=seg,
                                                plan=plan)
        p, o = S._bt_routed_restore(p, pk, off_bits=off_bits)
        return jnp.sum(p) + jnp.sum(o)

    for b in (B, B // 3, B // 8):
        pos0 = jnp.asarray(rng.integers(1, NB * 256 - 1, size=b,
                                        dtype=np.uint32))
        off0 = jnp.zeros_like(pos0)
        jax.block_until_ready((pos0, off0))
        plan = route_ops.plan_for(NB, 128, b)

        rate_m = time_rate(lambda s: mono_f(dev, pos0, off0, seg=s), b)
        key = f"B{b}"
        res[key] = {"mono": round(rate_m / 1e6, 1), "plan": bool(plan)}
        log(f"R2 {key} mono {res[key]['mono']} M rows/s (plan={bool(plan)})")
        if plan is not None:
            # NO bit-parity assert here: the synthetic dev's garbage
            # prefix sums make LF walk out of range, where mono clamps
            # but routed rows legitimately lag as covered=False (the
            # production net finishes them). Real-index parity is
            # pinned by tests/test_route.py. Timing is unaffected —
            # every step still sorts + gathers every window.
            res[key]["routed"] = round(
                time_rate(lambda s: routed_f(dev, pos0, off0, seg=s,
                                             plan=plan), b) / 1e6, 1)
            log(f"R2 {key} routed {res[key]['routed']} M rows/s")
    print(json.dumps({"exp": "R2_backtrace_lf_hg38", "rates_Mrows": res}),
          flush=True)


def main():
    phases = os.environ.get("AWFM_AB_PHASES", "012")
    if "0" in phases:
        r0_sorts()
    if "1" in phases:
        r1_digram()
    if "2" in phases:
        r2_backtrace()
    log("done")


if __name__ == "__main__":
    main()
