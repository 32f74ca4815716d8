"""Round-2 microbenchmark: candidate layouts for the one-gather backward step.

Measures, on the real TPU, random-index fetch rates for:
  1. current cost model: 2 separate row gathers (start-1 / end blocks)
  2. windowed gather: lax.gather slice_sizes=(2, lanes) -> blocks [b, b+1]
     in ONE fetch, no memory duplication (u8 and u32 lane variants)
  3. duplicated 512-byte super-rows (2x memory)
  4. Pallas multi-outstanding-DMA gather (K async copies in flight)
  5. 1-row baselines (sanity vs round-1 numbers: u8x128 ~72M rows/s)

Prints one JSON line per experiment. Run detached with a generous
timeout (lease poisoning rules, see CLAUDE.md).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 1 << 19
ITERS = 6
REPS = 5
TABLE_BYTES = 1 << 30  # 1 GiB per table: defeats caches, fits HBM


def log(msg):
    print(f"[exp] {msg}", file=sys.stderr, flush=True)


def report(name, seconds, rows_per_fetch=1):
    fetches = B * ITERS
    print(
        json.dumps(
            {
                "exp": name,
                "sec_per_iter": round(seconds / ITERS, 6),
                "fetches_per_s": round(fetches / seconds / ITERS) * ITERS // ITERS,
                "Mfetch_s": round(B / (seconds / ITERS) / 1e6, 2),
            }
        ),
        flush=True,
    )


def timeit(fn, *args):
    fn_j = jax.jit(fn)
    r = fn_j(*args)
    _ = int(np.asarray(r))  # true sync (tunnel: block_until_ready lies)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        for _ in range(ITERS):
            r = fn_j(*args)
        _ = int(np.asarray(r))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def win_gather(table, idx, w):
    lanes = table.shape[1]
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    return lax.gather(
        table,
        idx[:, None],
        dn,
        slice_sizes=(w, lanes),
        mode=lax.GatherScatterMode.CLIP,
    )


def checksum(x):
    return jnp.sum(x.astype(jnp.uint32) & jnp.uint32(0xFF))


def main():
    rng = np.random.default_rng(7)

    # ---- u8 row tables ----
    for row_bytes in (128, 256, 512):
        nb = TABLE_BYTES // row_bytes
        log(f"building u8 table rows={row_bytes} nb={nb}")
        table = jnp.asarray(
            rng.integers(0, 256, size=(nb + 1, row_bytes), dtype=np.uint8)
        )
        idx = jnp.asarray(rng.integers(0, nb - 1, size=B, dtype=np.int32))

        t = timeit(lambda tb, ix: checksum(tb[ix]), table, idx)
        report(f"u8x{row_bytes}_1row", t)

        t = timeit(
            lambda tb, ix: checksum(tb[ix]) + checksum(tb[ix + 1]), table, idx
        )
        report(f"u8x{row_bytes}_2row", t)

        t = timeit(lambda tb, ix: checksum(win_gather(tb, ix, 2)), table, idx)
        report(f"u8x{row_bytes}_win2", t)

        # u32 lane view of the same bytes
        table32 = jnp.asarray(
            np.asarray(table).reshape(nb + 1, row_bytes // 4, 4).view("<u4")[..., 0]
        )
        t = timeit(lambda tb, ix: checksum(tb[ix]), table32, idx)
        report(f"u32x{row_bytes // 4}_1row", t)
        t = timeit(lambda tb, ix: checksum(win_gather(tb, ix, 2)), table32, idx)
        report(f"u32x{row_bytes // 4}_win2", t)
        del table, table32, idx

    # ---- seed-table-like 2-lane u32 gather ----
    nsk = (1 << 24)
    st = jnp.asarray(rng.integers(0, 2**31, size=(nsk, 2), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, nsk, size=B, dtype=np.int32))
    t = timeit(lambda tb, ix: checksum(tb[ix]), st, idx)
    report("u32x2_seedtable", t)
    del st, idx

    # ---- Pallas multi-outstanding-DMA gather ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        for row_bytes, K, CHUNK in ((128, 8, 512), (512, 8, 512), (128, 16, 512)):
            nb = TABLE_BYTES // row_bytes
            table = jnp.asarray(
                rng.integers(0, 256, size=(nb, row_bytes), dtype=np.uint8)
            )
            idx_np = rng.integers(0, nb, size=B, dtype=np.int32)
            idx = jnp.asarray(idx_np)

            def kernel(idx_ref, table_ref, out_ref):
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
                        acc = acc + jnp.sum(
                            scratch[slot].astype(jnp.int32)
                        )

                        @pl.when(i + K < CHUNK)
                        def _():
                            dma(slot, i + K).start()

                        return acc

                    acc = lax.fori_loop(0, CHUNK, loop, jnp.int32(0))
                    out_ref[0, 0] = acc

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
                                (CHUNK,),
                                lambda i: (i,),
                                memory_space=pltpu.SMEM,
                            ),
                            pl.BlockSpec(memory_space=pltpu.ANY),
                        ],
                        out_specs=pl.BlockSpec(
                            (1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM
                        ),
                    ),
                    out_shape=jax.ShapeDtypeStruct((steps, 1), jnp.int32),
                )(ix, tb)
                return jnp.sum(out)

            try:
                t = timeit(run, table, idx)
                report(f"pallas_dma_u8x{row_bytes}_K{K}", t)
            except Exception as e:  # noqa: BLE001
                log(f"pallas u8x{row_bytes} K{K} failed: {type(e).__name__}: {e}")
            del table, idx
    except Exception as e:  # noqa: BLE001
        log(f"pallas experiments unavailable: {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
