"""Why does the routed backtrace win isolated A/Bs but lose production?

bench_hg38_r4 (routed defaults): locate stages 3.7-4x SLOWER than r3's
mono numbers, while count/digram (unrouted) match r3 exactly. The
routed-kernels A/B that set the defaults (ab_r4_routed_kernels R2:
2.28x at 4M, 1.29-1.45x at level sizes) ran with ONLY the 1.44 GiB
synthetic table resident; production locate_all at hg38 has ~14.5 GiB
resident (packed 1.55 + pair 3.1 + ngram 4.65 + seed 0.54 + sa 1.55 +
dense sa 3.1) leaving ~1 GiB free. Hypothesis: HBM occupancy changes
XLA's lowering/allocator behavior for the routed scan (whose scratch —
(B+cap) x 128 B out buffer, sort temps, slab slices — is far larger
than the mono gather's).

Grid: ballast in {0, 4, 8, 11, 12.5} GiB alongside the 1.55 GiB table;
B in {1M (production chunk), 4M} where scratch fits:
  mono     _backtrace_steps_fused            (the r3 production form)
  routed   pack -> _backtrace_steps_fused_routed -> restore
  routed4  same, applied over 4 sequential B/4 sub-slices (smaller
           scratch; tests whether shrinking working buffers restores
           the win under pressure)

Decision: whatever this shows becomes the routing policy — an HBM-aware
gate (route only when free HBM is ample), a sliced production path, or
a recorded revert to mono defaults at genome scale.
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu import search as S
from avxwindowfmindex_tpu.models.config import AlphabetType
from avxwindowfmindex_tpu.models.index import DeviceIndex, device_code_masks
from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.ops import route as route_ops

NB = 12_109_376  # hg38 narrow geometry: 12.1M x 128 B = 1.55 GiB
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 2, 8
GIB = 1 << 30


def log(m):
    print(f"[ballast] {m}", file=sys.stderr, flush=True)


def time_rate(fn, n_rows, reps=REPS):
    def run(seg):
        return int(np.asarray(fn(seg)))

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


def _mk_dev():
    key = jax.random.PRNGKey(4)
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, 128), dtype=jnp.uint8))(key)
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
        bwt_length=NB * 256,
        ratio=2147483647,  # nothing ever samples: pure kernel rate
        kmer_length_in_seed_table=13,
        alphabet=AlphabetType.DNA,
    )


OFF_BITS = 8  # static budget >= SEG_HI steps


@functools.partial(jax.jit, static_argnames=("seg",))
def mono_f(dv, pos, off, *, seg):
    p, o = S._backtrace_steps_fused(dv, pos, off, seg=seg)
    return jnp.sum(p) + jnp.sum(o)


@functools.partial(jax.jit, static_argnames=("seg", "plan"))
def routed_f(dv, pos, off, *, seg, plan):
    p, pk = S._bt_routed_pack(pos, off, off_bits=OFF_BITS)
    p, pk = S._backtrace_steps_fused_routed(dv, p, pk, seg=seg, plan=plan)
    p, o = S._bt_routed_restore(p, pk, off_bits=OFF_BITS)
    return jnp.sum(p) + jnp.sum(o)


def main():
    dev = _mk_dev()
    rng = np.random.default_rng(11)
    results = {}
    ballast = None
    for ballast_gib in (0, 4, 8, 11, 12.5):
        del ballast
        ballast = None
        if ballast_gib:
            ballast = jax.block_until_ready(
                jnp.zeros((int(ballast_gib * GIB),), jnp.uint8)
            )
        free_gib = 16 - 1.55 - ballast_gib
        for b in (1 << 20, 1 << 22):
            # 4M scratch (~700 MB peak) does not fit the tightest rungs
            if b == 1 << 22 and ballast_gib >= 11:
                continue
            pos0 = jnp.asarray(
                rng.integers(1, NB * 256 - 1, size=b, dtype=np.uint32)
            )
            off0 = jnp.zeros_like(pos0)
            jax.block_until_ready((pos0, off0))
            plan = route_ops.plan_for(NB, 128, b)
            assert plan is not None
            key = f"ballast{ballast_gib}GiB_B{b>>20}M"
            r = {}
            r["mono"] = round(
                time_rate(lambda s: mono_f(dev, pos0, off0, seg=s), b) / 1e6,
                1,
            )
            r["routed"] = round(
                time_rate(
                    lambda s: routed_f(dev, pos0, off0, seg=s, plan=plan), b
                )
                / 1e6,
                1,
            )
            sb = b // 4
            splan = route_ops.plan_for(NB, 128, sb)
            if splan is not None:

                def routed4(s):
                    tot = jnp.uint64(0)
                    for i in range(4):
                        tot = tot + routed_f(
                            dev,
                            pos0[i * sb : (i + 1) * sb],
                            off0[i * sb : (i + 1) * sb],
                            seg=s,
                            plan=splan,
                        )
                    return tot

                r["routed4"] = round(time_rate(routed4, b) / 1e6, 1)
            results[key] = r
            log(f"{key} (free~{free_gib:.1f}GiB): {r}")
    print(json.dumps({"exp": "ballast_backtrace", "rates_Mrows": results}))


if __name__ == "__main__":
    main()
