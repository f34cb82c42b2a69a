"""Pallas TPU kernel: the fine-context gather's backward as one-hot × MXU.

The Act3D fine levels gather ``fine_k`` context rows out of each pyramid
level (reference act3d.py:244-254 does this with ``torch.gather``); the
adjoint scatters the (B, K, C) cotangent back into (B, P, C).  Round-1
replaced XLA's kCustom scatter-add with an int32 slot map + dense row
gather (ops/geometry.py), but the dense gather still runs through the
TPU gather unit at ~16 GB/s effective — ~12 ms/step at training scale
(BENCH_NOTES round-2 trace), the largest remaining Act3D hotspot.

This kernel turns the adjoint into MXU work instead.  Because the
indices are unique (top-k output), the adjoint is a permutation matrix
application:

    dx[b, p, :] = Σ_j [idx[b, j] == p] · g[b, j, :]

Per (batch, P-tile) grid step the kernel builds the one-hot block
``M[j, p] = (idx[j] == p)`` (K × Pt) in VMEM with a broadcasted iota
compare (VPU) and contracts it against the cotangent (K × C) on the MXU
with f32 accumulation — numerically *exact* (each output row is a single
0/1-weighted copy; no true accumulation happens).  Nothing of size
(B, P, C) is ever touched twice, and the gather unit is bypassed
entirely.

Selection between this kernel and the jnp slot-map formulation lives in
``ops.geometry.gather_tokens`` (TPU on, CPU/interpret for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["onehot_scatter_rows"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scatter_kernel(idx_ref, g_ref, dx_ref, *, p_tile: int):
    """One (batch, P-tile) step: dx_tile = M(idx) @ g on the MXU.

    The one-hot block is built (Pt, K) — row iota against the (1, K) index
    block, which broadcasts along the row axis without any transpose (the
    (1, K) layout is also what Mosaic's block tiling rules require for the
    index input)."""
    base = pl.program_id(1) * p_tile
    idx = idx_ref[0]  # (1, K) int32
    k = idx.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p_tile, k), 0) + base
    m = (rows == idx).astype(g_ref.dtype)  # (Pt, K) one-hot
    dx = jax.lax.dot_general(
        m, g_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Pt, C)
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_rows", "p_tile", "interpret")
)
def onehot_scatter_rows(
    g: jax.Array,  # (B, K, C) cotangent of the gathered rows
    idx: jax.Array,  # (B, K) int32, unique per row
    out_rows: int,  # P
    p_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Scatter ``g`` rows to ``idx`` positions of a (B, P, C) zero tensor.

    Requires unique indices per batch row (the gather adjoint for top-k
    selections); duplicate indices would sum — identical to scatter-add —
    but the Act3D call sites never produce them.
    """
    b, k, c = g.shape
    p_pad = _round_up(out_rows, p_tile)
    grid = (b, p_pad // p_tile)

    idx_spec = pl.BlockSpec(
        (1, 1, k), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, k, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    dx_spec = pl.BlockSpec(
        (1, p_tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
    )
    dx = pl.pallas_call(
        functools.partial(_scatter_kernel, p_tile=p_tile),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c), g.dtype),
        grid=grid,
        in_specs=[idx_spec, g_spec],
        out_specs=dx_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None, :], g)
    return dx[:, :out_rows]
