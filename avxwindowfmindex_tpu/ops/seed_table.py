"""Vectorized k-mer seed-table construction.

The reference fills all |A|^k memoized ranges with a depth-first
recursion, one backward step per tree edge (AwFmCreate.c:407-450). The
TPU build performs the identical recurrence breadth-first, batched, and
— critically — as ONE compiled device program: a ``fori_loop`` over
depth operating on a full-size (|A|^k,) range buffer, where entry i at
depth d+1 reads

    source = i mod |A|^d,   letter = (i div |A|^d) mod |A|

matching the reference's ``currentKmerIndex + letter * multiplier``
index arithmetic (AwFmCreate.c:444-445). Entries beyond |A|^(d+1) hold
garbage mid-loop but are recomputed before they are ever read (depth
d+1 only reads entries < |A|^(d+1)); the final leaf values are
bit-identical to the reference DFS, including the non-canonical
(startPtr > endPtr) values stored for absent kmers, because the step is
applied unconditionally, without a validity check.

Single program + single dispatch matters: the build may run through a
remote TPU tunnel where every XLA compile and host sync costs seconds.
The inner work is chunked with ``lax.map`` to bound gather temporaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import rank as rank_ops

_CHUNK = 1 << 19  # ranges stepped per lax.map chunk (bounds temporaries)


@functools.partial(jax.jit, static_argnames=("card", "k", "padded"))
def _build_seed_table_jit(dev, start0, end0, *, card, k, padded):
    """Compute all |A|^k ranges on device in one program.

    start0/end0: (padded,) uint32 with the depth-1 ranges in the first
    |A| slots (table1[i] = [C[i], C[i+1]-1], AwFmCreate.c:410-413).
    """
    idx = jnp.arange(padded, dtype=jnp.int32)

    def depth_body(d, carry):
        start, end = carry
        a_d = jnp.int32(card) ** d
        src = idx % a_d
        lett = (idx // a_d) % jnp.int32(card)
        gs = start[src]
        ge = end[src]

        def chunk_fn(args):
            s_c, e_c, l_c = args
            return rank_ops.backward_step(
                dev, s_c, e_c, l_c, active=None, check_valid=False
            )

        n_chunks = padded // _CHUNK if padded % _CHUNK == 0 else 1
        if n_chunks > 1:
            s2, e2 = jax.lax.map(
                chunk_fn,
                (
                    gs.reshape(n_chunks, _CHUNK),
                    ge.reshape(n_chunks, _CHUNK),
                    lett.reshape(n_chunks, _CHUNK),
                ),
            )
            return s2.reshape(-1), e2.reshape(-1)
        return chunk_fn((gs, ge, lett))

    start, end = jax.lax.fori_loop(1, k, depth_body, (start0, end0))
    return start, end


def build_seed_table_device(dev, cardinality: int, k: int):
    """Compute the (|A|^k, 2) uint32 seed table, kept ON DEVICE.

    The result stays device-resident: a genome-scale table is hundreds
    of MB, and pulling it to the host is pure waste for search (and
    catastrophically slow through a remote TPU tunnel). Host
    materialization for serde is lazy (FmIndex.seed_table_host).
    """
    total = cardinality**k
    if total >= 2**31:
        raise NotImplementedError(
            f"seed table with |A|^k = {total} exceeds the int32 device "
            "index range; use a smaller kmerLengthInSeedTable"
        )
    padded = total
    if total > _CHUNK:
        padded = ((total + _CHUNK - 1) // _CHUNK) * _CHUNK

    ps = np.asarray(dev.prefix_sums, dtype=np.uint64)
    start0 = np.ones(padded, dtype=np.uint32)  # dummy tail: valid position 1
    end0 = np.zeros(padded, dtype=np.uint32)
    start0[:cardinality] = ps[:cardinality].astype(np.uint32)
    end0[:cardinality] = (ps[1 : cardinality + 1] - 1).astype(np.uint32)

    start, end = _build_seed_table_jit(
        dev, jnp.asarray(start0), jnp.asarray(end0), card=cardinality, k=k,
        padded=padded,
    )
    return jnp.stack([start[:total], end[:total]], axis=1)


def build_seed_table(dev, cardinality: int, k: int) -> np.ndarray:
    """Host (|A|^k, 2) uint64 seed table (pulls the device result)."""
    return np.asarray(build_seed_table_device(dev, cardinality, k)).astype(
        np.uint64
    )
