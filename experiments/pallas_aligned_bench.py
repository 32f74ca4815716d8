"""Pallas DMA gather with tile-aligned (nb, 8, 128) u8 rows (1 KB/fetch)."""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
B = 1 << 19
ITERS = 6
REPS = 5
TABLE_BYTES = 1 << 30

def log(m): print(f"[exp] {m}", file=sys.stderr, flush=True)
def report(name, sec):
    print(json.dumps({"exp": name, "sec_per_iter": round(sec/ITERS, 6),
                      "Mfetch_s": round(B/(sec/ITERS)/1e6, 2)}), flush=True)

def timeit(fn, *args):
    fn_j = jax.jit(fn)
    r = fn_j(*args); _ = int(np.asarray(r))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        for _ in range(ITERS): r = fn_j(*args)
        _ = int(np.asarray(r)); ts.append(time.time()-t0)
    return float(np.median(ts))

def main():
    rng = np.random.default_rng(7)
    nb = TABLE_BYTES // 1024
    table = jnp.asarray(rng.integers(0, 256, size=(nb, 8, 128), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, nb, size=B, dtype=np.int32))

    for K, CHUNK in ((8, 512), (16, 512), (32, 1024)):
        def kernel(idx_ref, table_ref, out_ref):
            step = pl.program_id(0)
            def body(scratch, sems):
                def dma(slot, i):
                    return pltpu.make_async_copy(
                        table_ref.at[idx_ref[i]], scratch.at[slot], sems.at[slot])
                for s in range(K):
                    dma(s, s).start()
                def loop(i, acc):
                    slot = lax.rem(i, K)
                    pltpu.make_async_copy(
                        table_ref.at[idx_ref[i]], scratch.at[slot], sems.at[slot]).wait()
                    acc = acc + jnp.sum(scratch[slot][:1].astype(jnp.int32))
                    @pl.when(i + K < CHUNK)
                    def _():
                        dma(slot, i + K).start()
                    return acc
                acc = lax.fori_loop(0, CHUNK, loop, jnp.int32(0))
                @pl.when(step == 0)
                def _():
                    out_ref[0, 0] = jnp.int32(0)
                out_ref[0, 0] += acc
            pl.run_scoped(body, scratch=pltpu.VMEM((K, 8, 128), jnp.uint8),
                          sems=pltpu.SemaphoreType.DMA((K,)))
        steps = B // CHUNK
        def run(tb, ix):
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=0, grid=(steps,),
                    in_specs=[pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(ix, tb)
            return out[0, 0]
        try:
            t = timeit(run, table, idx)
            report(f"pallas_aligned_1KB_K{K}_C{CHUNK}", t)
        except Exception as e:
            log(f"K{K} failed: {type(e).__name__}: {e}")
    # XLA reference on identical layout
    t = timeit(lambda tb, ix: jnp.sum(tb[ix][:, :1].astype(jnp.uint32)), table, idx)
    report("xla_1KB_1row", t)
    log("done")

main()
