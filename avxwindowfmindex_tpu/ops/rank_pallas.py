"""Pallas TPU kernel for the masked-popcount rank.

The AVX2 masked popcount (AwFmSimdConfig.c:89-114) reborn as a Mosaic
kernel: given the gathered fused block rows, compute

    occ = milestone[letter] + popcount(match(letter) & inclusive_mask)

entirely in VMEM — code-equality match over the bit-planes, the
inclusive position mask, uint8 popcounts, and the milestone one-hot
select fused into one pass over each row tile, writing only the (B,)
occurrence vector back to HBM.

The row GATHER itself intentionally stays in XLA: measured on TPU v5e,
XLA's row gather sustains ~72M 128-lane rows/s while a Pallas per-row
DMA pipeline is issue-bound well below that. This kernel removes the
elementwise intermediates XLA would otherwise materialize around the
gather.

Select with SearchEngine(..., use_pallas_rank=True) /
AWFM_PALLAS_RANK=1; results are bit-identical to ops/rank.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import alphabet as alpha

_TILE = 1024  # rows per grid step; (1024, 128) u8 = 128 KB in VMEM


def _rank_kernel(rows_ref, local_ref, letter_ref, ms_ref, out_ref, *,
                 n_planes, cardinality, code_lut):
    rows = rows_ref[:, :]  # (TILE, 32*n_planes) uint8 plane bytes
    local = local_ref[:, 0]  # (TILE,)
    letter = letter_ref[:, 0]

    # code-equality match over the planes (one-hot code masks)
    diff = None
    for i in range(n_planes):
        m = jnp.zeros(letter.shape, dtype=jnp.uint8)
        for j in range(cardinality + 1):
            if (code_lut[j] >> i) & 1:
                m = m | jnp.where(letter == j, jnp.uint8(0xFF), jnp.uint8(0))
        x = rows[:, i * 32 : (i + 1) * 32] ^ m[:, None]
        diff = x if diff is None else (diff | x)
    match = ~diff

    # inclusive mask: keep bits 0..local (AwFmSimdConfig.c:91 semantics)
    byte_idx = (local >> 3)[:, None]
    bit_idx = (local & 7)[:, None].astype(jnp.uint8)
    low = (jnp.uint8(2) << bit_idx) - jnp.uint8(1)
    b_iota = lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    mask = jnp.where(
        b_iota < byte_idx, jnp.uint8(0xFF),
        jnp.where(b_iota == byte_idx, low, jnp.uint8(0)),
    )

    cnt = jnp.sum(
        lax.population_count(match & mask), axis=1, dtype=jnp.int32
    )

    # milestone one-hot select
    ms = jnp.zeros(letter.shape, dtype=jnp.uint32)
    for j in range(cardinality + 1):
        ms = ms + jnp.where(letter == j, ms_ref[:, j], jnp.uint32(0))
    out_ref[:, 0] = ms + cnt.astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("n_planes", "cardinality", "code_lut", "interpret")
)
def _rank_call(rows, local, letter, milestones, *, n_planes, cardinality,
               code_lut, interpret=False):
    b = rows.shape[0]
    grid = b // _TILE if b % _TILE == 0 else -(-b // _TILE)
    padded = grid * _TILE
    if padded != b:
        rows = jnp.pad(rows, ((0, padded - b), (0, 0)))
        local = jnp.pad(local, (0, padded - b))
        letter = jnp.pad(letter, (0, padded - b))
        milestones = jnp.pad(milestones, ((0, padded - b), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _rank_kernel, n_planes=n_planes, cardinality=cardinality,
            code_lut=code_lut,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (_TILE, n_planes * 32), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_TILE, cardinality + 1), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded, 1), jnp.uint32),
        interpret=interpret,
    )(rows, local[:, None], letter[:, None], milestones)
    return out[:b, 0]


def occurrence(dev, positions, letter_indices, interpret=False):
    """Drop-in replacement for rank.occurrence using the Pallas kernel.

    The gather and the milestone bitcast stay in XLA; the masked
    popcount + selects run in the fused kernel.
    """
    from . import rank as rank_ops

    rows, local = rank_ops._gather_rows(dev, positions)
    n_planes = dev.n_planes
    ms = rank_ops._milestones_u32(dev, rows)
    code_lut = tuple(int(v) for v in alpha.index_to_vector_lut(dev.alphabet))
    return _rank_call(
        rows[:, : n_planes * 32], local, letter_indices, ms,
        n_planes=n_planes, cardinality=dev.cardinality, code_lut=code_lut,
        interpret=interpret,
    )
