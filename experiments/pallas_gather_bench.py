"""Round-2 microbenchmark, part 2: Pallas multi-outstanding-DMA gather
vs the XLA row-gather ceiling, plus big-row (768/1024 B) gather rates
for a possible trigram-pair layout.

Run detached on the real TPU (see CLAUDE.md tunnel rules).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 1 << 19
ITERS = 6
REPS = 5
TABLE_BYTES = 1 << 30


def log(msg):
    print(f"[exp] {msg}", file=sys.stderr, flush=True)


def report(name, seconds):
    print(
        json.dumps(
            {
                "exp": name,
                "sec_per_iter": round(seconds / ITERS, 6),
                "Mfetch_s": round(B / (seconds / ITERS) / 1e6, 2),
            }
        ),
        flush=True,
    )


def timeit(fn, *args):
    fn_j = jax.jit(fn)
    r = fn_j(*args)
    _ = int(np.asarray(r))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        for _ in range(ITERS):
            r = fn_j(*args)
        _ = int(np.asarray(r))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def checksum(x):
    return jnp.sum(x.astype(jnp.uint32) & jnp.uint32(0xFF))


def main():
    rng = np.random.default_rng(7)

    # big-row 1-gather rates (trigram-pair candidate layouts)
    for row_bytes in (768, 1024):
        nb = TABLE_BYTES // row_bytes
        table = jnp.asarray(
            rng.integers(0, 256, size=(nb, row_bytes), dtype=np.uint8)
        )
        idx = jnp.asarray(rng.integers(0, nb, size=B, dtype=np.int32))
        t = timeit(lambda tb, ix: checksum(tb[ix]), table, idx)
        report(f"u8x{row_bytes}_1row", t)
        del table, idx

    for row_bytes, K, CHUNK in (
        (128, 8, 512),
        (128, 16, 512),
        (512, 8, 512),
        (512, 16, 512),
    ):
        nb = TABLE_BYTES // row_bytes
        table = jnp.asarray(
            rng.integers(0, 256, size=(nb, row_bytes), dtype=np.uint8)
        )
        idx_np = rng.integers(0, nb, size=B, dtype=np.int32)
        idx = jnp.asarray(idx_np)

        def kernel(idx_ref, table_ref, out_ref):
            step = pl.program_id(0)

            def body(scratch, sems):
                def dma(slot, i):
                    return pltpu.make_async_copy(
                        table_ref.at[pl.ds(idx_ref[i], 1), :],
                        scratch.at[slot],
                        sems.at[slot],
                    )

                for s in range(K):
                    dma(s, s).start()

                def loop(i, acc):
                    slot = lax.rem(i, K)
                    pltpu.make_async_copy(
                        table_ref.at[pl.ds(idx_ref[i], 1), :],
                        scratch.at[slot],
                        sems.at[slot],
                    ).wait()
                    acc = acc + jnp.sum(scratch[slot].astype(jnp.int32))

                    @pl.when(i + K < CHUNK)
                    def _():
                        dma(slot, i + K).start()

                    return acc

                acc = lax.fori_loop(0, CHUNK, loop, jnp.int32(0))

                @pl.when(step == 0)
                def _():
                    out_ref[0, 0] = jnp.int32(0)

                out_ref[0, 0] += acc

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((K, 1, row_bytes), jnp.uint8),
                sems=pltpu.SemaphoreType.DMA((K,)),
            )

        steps = B // CHUNK

        def run(tb, ix):
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=0,
                    grid=(steps,),
                    in_specs=[
                        pl.BlockSpec(
                            (CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM
                        ),
                        pl.BlockSpec(memory_space=pltpu.ANY),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                    ),
                ),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(ix, tb)
            return out[0, 0]

        try:
            t = timeit(run, table, idx)
            report(f"pallas_dma_u8x{row_bytes}_K{K}", t)
        except Exception as e:  # noqa: BLE001
            log(f"pallas u8x{row_bytes} K{K} failed: {type(e).__name__}: {e}")
        del table, idx

    log("done")


if __name__ == "__main__":
    main()
