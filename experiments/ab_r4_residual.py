"""Decompose the gather-ceiling residual at hg38 scale (VERDICT r3 #3),
and close the slab-routing question from the gather-cliff bisect (#1).

ab_r4_gathercliff established: big-table (>~128 MiB) row gathers run at
a flat, order- and working-set-independent ~9.6 ns/row + ~11 ps/byte;
column splits and second streams serialize. The one routing idea left
is sort/partition + per-slab VMEM-resident gathers, whose cost floor is
the partition itself — so Phase P1 measures XLA's sort/argsort/scatter
rates at the production batch sizes. If partitioning 1M u32 keys costs
more than the ~7 ms/step a slab gather could save, routing is dead.

Phases P2/P3 build the residual ladder ON SYNTHETIC TABLES with the
REAL kernel functions at hg38 geometry (12.1M blocks), isolating where
locate_all's missing 35-47% of the gather ceiling goes
(bench_hg38_r3.json: count_ngram 0.636, locate_all 0.586 of ceiling):

  P2 digram step ladder (384 B pair rows, the range phase):
     L0 bare gather + row-sum        -> the gather wall itself
     L1 + match + 2x mask/popcount   -> occurrence VPU cost
     L2 + milestone wsum             -> milestone select cost (default)
     L2b + milestone bitcast select  -> the non-wsum alternative
     L3 full ngram_backward_step_pair -> where-merges/flags/step glue
  P3 backtrace LF ladder (128 B single rows, the locate tail):
     L0 bare gather + row-sum
     L1 full letter_and_lf_at        -> letter decode + rank + LF glue

Every ladder step keeps a data dependency between consecutive gathers
(pos' = mix(row hash)) so XLA cannot overlap what production cannot.
Rates are rows/s via lo/hi segment differencing (scalar readbacks).
"""

import dataclasses
import json
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu.models.config import AlphabetType
from avxwindowfmindex_tpu.models.index import DeviceIndex
from avxwindowfmindex_tpu.ops import ngram as ng_ops
from avxwindowfmindex_tpu.ops import rank as rank_ops

B = int(os.environ.get("AWFM_AB_BATCH", 1 << 20))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 4, 16
NB = 12_109_376  # hg38 block count: ceil(3.1e9+1 / 256)


def log(m):
    print(f"[residual] {m}", file=sys.stderr, flush=True)


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


def _mix(h, nb):
    """Data-dependent next positions: uniform-ish in [0, nb)."""
    return ((h * jnp.uint32(2654435761)) % jnp.uint32(nb)).astype(jnp.uint32)


# ---------------- P1: partition primitives --------------------------------


def p1_partition():
    out = {}
    for b in (1 << 20, 1 << 22):
        keys = jnp.asarray(
            np.random.default_rng(7).integers(0, NB, size=b, dtype=np.uint32)
        )
        vals = jnp.asarray(
            np.random.default_rng(8).integers(0, 1 << 30, size=b,
                                              dtype=np.uint32)
        )
        jax.block_until_ready((keys, vals))

        @jax.jit
        def f_sort(k):
            return jnp.sum(lax.sort(k))

        @jax.jit
        def f_argsort(k):
            return jnp.sum(jnp.argsort(k).astype(jnp.uint32))

        @jax.jit
        def f_scatter(k, v):
            idx = (k % jnp.uint32(b)).astype(jnp.int32)
            return jnp.sum(jnp.zeros((b,), jnp.uint32).at[idx].set(v))

        @jax.jit
        def f_hist(k):
            # 128-slab counting histogram via one-hot matmul-free sum
            slab = (k // jnp.uint32((NB + 127) // 128)).astype(jnp.int32)
            return jnp.sum(
                jnp.zeros((128,), jnp.uint32).at[slab].add(jnp.uint32(1))
            )

        res = {}
        for name, fn, args in (
            ("sort", f_sort, (keys,)),
            ("argsort", f_argsort, (keys,)),
            ("scatter_set", f_scatter, (keys, vals)),
            ("hist128_scatter_add", f_hist, (keys,)),
        ):
            _ = int(np.asarray(fn(*args)))  # compile+warm
            ts = []
            for _i in range(REPS):
                t0 = time.time()
                _ = int(np.asarray(fn(*args)))
                ts.append(time.time() - t0)
            sec = float(np.median(ts))
            res[name] = {"ms": round(sec * 1e3, 2),
                         "Melems_per_s": round(b / sec / 1e6, 1)}
            log(f"P1 b={b}: {name} {sec * 1e3:.2f} ms")
        out[f"B{b}"] = res
    print(json.dumps({"exp": "P1_partition_primitives", "res": out}),
          flush=True)


# ---------------- P2: digram step ladder -----------------------------------


def p2_digram_ladder():
    key = jax.random.PRNGKey(3)
    _, _, _, _, prb = ng_ops._geometry_pair(2)
    log(f"building synthetic digram table ({NB} x {prb} B = "
        f"{NB * prb / 2**30:.2f} GiB)")
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, prb), dtype=jnp.uint8))(key)
    )
    ng = ng_ops.NgramIndex(
        packed=table, cn=jnp.zeros((16,), jnp.uint32), n=2, biased=True
    )
    rng = np.random.default_rng(9)
    pos0 = jnp.asarray(rng.integers(0, NB * 256 - 600, size=B,
                                    dtype=np.uint32))
    v0 = jnp.asarray(rng.integers(0, 16, size=B, dtype=np.int32))
    jax.block_until_ready((pos0, v0))

    @functools.partial(jax.jit, static_argnames=("seg",))
    def l0(ngx, pos, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            blk = (pos >> jnp.uint32(8)).astype(jnp.int32)
            rows = ngx.packed[blk]
            h = jnp.sum(rows.astype(jnp.uint32), axis=1)
            acc = acc + jnp.sum(h)
            pos = _mix(h + pos, NB * 256 - 600)
        return acc

    @functools.partial(jax.jit, static_argnames=("seg", "with_ms", "wsum"))
    def l12(ngx, pos, v, *, seg, with_ms, wsum):
        acc = jnp.uint32(0)
        for _ in range(seg):
            blk = (pos >> jnp.uint32(8)).astype(jnp.int32)
            local_s = (pos & jnp.uint32(0xFF)).astype(jnp.int32)
            local_e = local_s + jnp.int32(300)
            rows = ngx.packed[blk]
            match = ng_ops._pair_match(ngx, rows, v)
            occ_s = jnp.sum(
                lax.population_count(match & ng_ops._pair_mask(local_s)),
                axis=1, dtype=jnp.int32)
            occ_e = jnp.sum(
                lax.population_count(match & ng_ops._pair_mask(local_e)),
                axis=1, dtype=jnp.int32)
            h = (occ_s + occ_e).astype(jnp.uint32)
            if with_ms:
                n_words, _, _, ms_off, _ = ng_ops._geometry_pair(ngx.n)
                sect = rows[:, ms_off : ms_off + n_words * 4]
                if wsum:
                    h = h + ng_ops._milestone_wsum(sect, v, n_words)
                else:
                    ms_all = lax.bitcast_convert_type(
                        sect.reshape(-1, n_words, 4), jnp.uint32)
                    ms = jnp.zeros(v.shape, dtype=jnp.uint32)
                    for j in range(n_words):
                        ms = ms + jnp.where(v == j, ms_all[:, j],
                                            jnp.uint32(0))
                    h = h + ms
            acc = acc + jnp.sum(h)
            pos = _mix(h + pos, NB * 256 - 600)
        return acc

    @functools.partial(jax.jit, static_argnames=("seg",))
    def l3(ngx, pos, v, *, seg):
        acc = jnp.uint32(0)
        letters = [(v >> 2) & 3, v & 3]
        for _ in range(seg):
            start = pos
            end = pos + jnp.uint32(300)
            bad = jnp.zeros(pos.shape, dtype=bool)
            ns, ne, bad = ng_ops.ngram_backward_step_pair(
                ngx, start, end, letters, bad)
            h = ns + ne + bad.astype(jnp.uint32)
            acc = acc + jnp.sum(h)
            pos = _mix(h + pos, NB * 256 - 600)
        return acc

    res = {}
    res["L0_bare_gather"] = round(
        time_rate(lambda seg: l0(ng, pos0, seg=seg), B) / 1e6, 1)
    log(f"P2 L0 {res['L0_bare_gather']} M rows/s")
    res["L1_match_popcount"] = round(
        time_rate(lambda seg: l12(ng, pos0, v0, seg=seg, with_ms=False,
                                  wsum=False), B) / 1e6, 1)
    log(f"P2 L1 {res['L1_match_popcount']} M rows/s")
    res["L2_ms_wsum"] = round(
        time_rate(lambda seg: l12(ng, pos0, v0, seg=seg, with_ms=True,
                                  wsum=True), B) / 1e6, 1)
    log(f"P2 L2 {res['L2_ms_wsum']} M rows/s")
    res["L2b_ms_bitcast"] = round(
        time_rate(lambda seg: l12(ng, pos0, v0, seg=seg, with_ms=True,
                                  wsum=False), B) / 1e6, 1)
    log(f"P2 L2b {res['L2b_ms_bitcast']} M rows/s")
    res["L3_full_step"] = round(
        time_rate(lambda seg: l3(ng, pos0, v0, seg=seg), B) / 1e6, 1)
    log(f"P2 L3 {res['L3_full_step']} M rows/s")
    print(json.dumps({"exp": "P2_digram_ladder_hg38_synth",
                      "rates_Mrows": res}), flush=True)
    del table, ng


# ---------------- P3: backtrace LF ladder -----------------------------------


def p3_lf_ladder():
    key = jax.random.PRNGKey(4)
    rb = 128
    log(f"building synthetic single table ({NB} x {rb} B = "
        f"{NB * rb / 2**30:.2f} GiB)")
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.bits(k, (NB, rb), dtype=jnp.uint8))(key)
    )
    from avxwindowfmindex_tpu.models import alphabet as alpha
    from avxwindowfmindex_tpu.models.index import (
        device_code_masks,
    )

    dev = DeviceIndex(
        packed=table,
        packed_pair=None,
        prefix_sums=jnp.zeros((6,), jnp.uint32),
        seed_table=None,
        sampled_sa=None,
        code_masks=jnp.asarray(device_code_masks(AlphabetType.DNA)),
        vec_to_index=jnp.asarray(
            np.asarray(alpha.vector_to_index_lut(AlphabetType.DNA))),
        bwt_length=NB * 256,
        ratio=8,
        kmer_length_in_seed_table=13,
        alphabet=AlphabetType.DNA,
    )
    rng = np.random.default_rng(11)
    pos0 = jnp.asarray(rng.integers(0, NB * 256 - 1, size=B, dtype=np.uint32))
    jax.block_until_ready(pos0)

    @functools.partial(jax.jit, static_argnames=("seg",))
    def l0(dv, pos, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            blk = (pos // 256).astype(jnp.int32)
            rows = dv.packed[blk]
            h = jnp.sum(rows.astype(jnp.uint32), axis=1)
            acc = acc + jnp.sum(h)
            pos = _mix(h + pos, NB * 256 - 1)
        return acc

    @functools.partial(jax.jit, static_argnames=("seg",))
    def l1(dv, pos, *, seg):
        acc = jnp.uint32(0)
        for _ in range(seg):
            lett, lf = rank_ops.letter_and_lf_at(dv, pos)
            h = lf + lett.astype(jnp.uint32)
            acc = acc + jnp.sum(h)
            pos = _mix(h + pos, NB * 256 - 1)
        return acc

    res = {}
    res["L0_bare_gather"] = round(
        time_rate(lambda seg: l0(dev, pos0, seg=seg), B) / 1e6, 1)
    log(f"P3 L0 {res['L0_bare_gather']} M rows/s")
    res["L1_full_lf"] = round(
        time_rate(lambda seg: l1(dev, pos0, seg=seg), B) / 1e6, 1)
    log(f"P3 L1 {res['L1_full_lf']} M rows/s")
    print(json.dumps({"exp": "P3_lf_ladder_hg38_synth", "rates_Mrows": res}),
          flush=True)


def main():
    p1_partition()
    p2_digram_ladder()
    p3_lf_ladder()
    log("done")


if __name__ == "__main__":
    main()
