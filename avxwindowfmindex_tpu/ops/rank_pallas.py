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

Select by setting the environment variable AWFM_PALLAS_RANK=1 (read at
call time, ops/rank.py:occurrence); results are bit-identical to
ops/rank.py.
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
    # Mosaic constraints: keep every value 2D and compute in 32-bit
    # lanes (1D<->2D reshapes and i1->i8 select relayouts of sub-32-bit
    # vectors are unsupported). Rows are widened to int32 on load; byte
    # complement is `x ^ 255`.
    rows = rows_ref[:, :].astype(jnp.int32)  # (TILE, 32*n_planes) 0..255
    local = local_ref[:, :]  # (TILE, 1) int32
    letter = letter_ref[:, :]  # (TILE, 1) int32

    # letter -> compressed code via one-hot arithmetic (all int32)
    code = jnp.zeros(letter.shape, dtype=jnp.int32)
    for j in range(cardinality + 1):
        code = code + jnp.where(letter == j, jnp.int32(code_lut[j]), 0)

    # code-equality match over the planes
    diff = None
    for i in range(n_planes):
        m = ((code >> i) & 1) * 255  # (TILE, 1): 0x00 or 0xFF
        x = rows[:, i * 32 : (i + 1) * 32] ^ m
        diff = x if diff is None else (diff | x)
    match = diff ^ 255  # per-byte complement

    # inclusive mask: keep bits 0..local (AwFmSimdConfig.c:91 semantics)
    byte_idx = local >> 3
    bit_idx = local & 7
    low = (jnp.int32(2) << bit_idx) - 1
    b_iota = lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    mask = jnp.where(
        b_iota < byte_idx, jnp.int32(255),
        jnp.where(b_iota == byte_idx, low, 0),
    )

    cnt = jnp.sum(
        lax.population_count(match & mask), axis=1, keepdims=True
    )

    # milestone one-hot select
    ms = jnp.zeros(letter.shape, dtype=jnp.uint32)
    for j in range(cardinality + 1):
        ms = ms + jnp.where(letter == j, ms_ref[:, j : j + 1], jnp.uint32(0))
    out_ref[:, :] = ms + cnt.astype(jnp.uint32)


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
