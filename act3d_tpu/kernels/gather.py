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

__all__ = [
    "onehot_scatter_rows",
    "onehot_scatter_rows_sorted",
    "onehot_scatter_rows_chunked",
]


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


def _windowed_kernel(s_ref, idx_lo, idx_hi, g_lo, g_hi, dx_ref, *, p_tile):
    """One (batch, P-tile) step over a 2-block j-window: sorted indices mean
    every row landing in this tile sits in [start, start+p_tile) of the
    cotangent, so the contraction runs over 2·kb = 2·p_tile rows instead of
    the full K.  Rows of the window outside the tile's [base, base+Pt)
    range simply produce all-zero one-hot columns."""
    del s_ref  # consumed by the BlockSpec index maps only
    base = pl.program_id(1) * p_tile
    kb = idx_lo.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p_tile, kb), 0) + base
    m_lo = (rows == idx_lo[0]).astype(g_lo.dtype)  # (Pt, kb)
    m_hi = (rows == idx_hi[0]).astype(g_hi.dtype)
    dn = (((1,), (0,)), ((), ()))
    dx = jax.lax.dot_general(
        m_lo, g_lo[0], dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        m_hi, g_hi[0], dn, preferred_element_type=jnp.float32
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_rows", "p_tile", "interpret")
)
def onehot_scatter_rows_sorted(
    g: jax.Array,  # (B, K, C) cotangent of the gathered rows
    idx: jax.Array,  # (B, K) int32, unique AND ascending per row
    out_rows: int,  # P
    p_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``onehot_scatter_rows`` exploiting *sorted* indices (Act3D sorts its
    fine-context top-k picks, models/act3d.py:233).

    A P-tile spans ``p_tile`` consecutive output positions; with unique
    ascending indices at most ``p_tile`` cotangent rows can land in it and
    they are contiguous in j.  Per tile the kernel therefore contracts a
    2·``p_tile``-row window of ``g`` located by a scalar-prefetch
    ``searchsorted`` start instead of the full K rows — K/(2·p_tile)×
    less MXU and one-hot-build work (3× at Act3D's K=3072 fine levels)."""
    b, k, c = g.shape
    kb = p_tile  # j-block: window = 2 blocks >= p_tile possible hits
    if k % kb or k < 2 * kb:
        return onehot_scatter_rows(
            g, idx, out_rows, p_tile=p_tile, interpret=interpret
        )
    p_pad = _round_up(out_rows, p_tile)
    n_tiles = p_pad // p_tile
    grid = (b, n_tiles)

    idx = idx.astype(jnp.int32)
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * p_tile
    # first j with idx[j] >= tile base, in j-block units; the window
    # [s·kb, s·kb + 2·kb) then covers all hits of the tile.  Clamped so
    # the high block stays in range (hits near the K edge still fit:
    # start >= k - 2·kb there).
    starts = jax.vmap(lambda r: jnp.searchsorted(r, bases))(idx)
    s_blk = jnp.clip(starts // kb, 0, k // kb - 2).astype(jnp.int32)

    idx3 = idx[:, None, :]
    idx_lo = pl.BlockSpec(
        (1, 1, kb), lambda bi, i, s: (bi, 0, s[bi, i]),
        memory_space=pltpu.VMEM,
    )
    idx_hi = pl.BlockSpec(
        (1, 1, kb), lambda bi, i, s: (bi, 0, s[bi, i] + 1),
        memory_space=pltpu.VMEM,
    )
    g_lo = pl.BlockSpec(
        (1, kb, c), lambda bi, i, s: (bi, s[bi, i], 0),
        memory_space=pltpu.VMEM,
    )
    g_hi = pl.BlockSpec(
        (1, kb, c), lambda bi, i, s: (bi, s[bi, i] + 1, 0),
        memory_space=pltpu.VMEM,
    )
    dx_spec = pl.BlockSpec(
        (1, p_tile, c), lambda bi, i, s: (bi, i, 0), memory_space=pltpu.VMEM
    )
    dx = pl.pallas_call(
        functools.partial(_windowed_kernel, p_tile=p_tile),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c), g.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[idx_lo, idx_hi, g_lo, g_hi],
            out_specs=dx_spec,
        ),
        interpret=interpret,
    )(s_blk, idx3, idx3, g, g)
    return dx[:, :out_rows]


def _chunked_kernel(s_ref, idxw_ref, g_ref, dx_ref, *, p_tile, kw, n_inner):
    """One (batch, chunk) step: ``n_inner`` P-tiles materialised by an
    in-kernel loop over a VMEM-resident full-K cotangent.  The windowed
    per-grid-step formulation above spends ~3 µs of sequencing overhead
    per 512-row tile (r3 A/B) — here a chunk amortises it over
    ``n_inner`` tiles, and the j-window is a *sublane* dynamic slice of
    the resident g block (no dynamic lane slicing, which Mosaic lacks:
    the per-tile index windows are pre-gathered host-side into
    ``idxw``)."""
    bi = pl.program_id(0)
    t0 = pl.program_id(1) * n_inner

    def body(j, carry):
        i = t0 + j  # global P-tile index
        s0 = s_ref[bi, i] * 128  # window start, 128-aligned elements
        idxw = idxw_ref[0, 0, pl.ds(j, 1), :]  # (1, kw)
        gw = g_ref[0, pl.ds(s0, kw), :]  # (kw, C)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (p_tile, kw), 0)
            + i * p_tile
        )
        m = (rows == idxw).astype(gw.dtype)
        dx = jax.lax.dot_general(
            m, gw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[0, pl.ds(j * p_tile, p_tile), :] = dx.astype(dx_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_inner, body, 0)


@functools.partial(
    jax.jit, static_argnames=("out_rows", "p_tile", "n_chunks", "interpret")
)
def onehot_scatter_rows_chunked(
    g: jax.Array,  # (B, K, C) cotangent of the gathered rows
    idx: jax.Array,  # (B, K) int32, unique AND ascending per row
    out_rows: int,  # P
    p_tile: int = 256,
    n_chunks: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Sorted-index gather adjoint with in-kernel tile looping.

    Same windowed-contraction idea as ``onehot_scatter_rows_sorted`` —
    sorted unique indices mean each ``p_tile``-row output tile receives a
    contiguous <= ``p_tile``-long j-slice — but the grid is only
    (B, n_chunks): the full (K, C) cotangent stays resident in VMEM per
    batch row and an in-kernel ``fori_loop`` walks the tiles, so the
    per-grid-step sequencing overhead is paid ~n_tiles/n_chunks times
    less.  The window is ``p_tile + 128`` rows at a 128-aligned
    searchsorted start (covers the hits of any tile; see the windowed
    kernel proof).
    """
    b, k, c = g.shape
    kw = p_tile + 128
    # p_tile must be a 128-multiple: the window start is 128-aligned and
    # the right-edge clamp below only reaches the last K rows when
    # (k - kw) is itself 128-aligned.
    if k < kw or k % 128 or p_tile % 128:
        return onehot_scatter_rows_sorted(
            g, idx, out_rows, interpret=interpret
        )
    p_pad = _round_up(out_rows, p_tile * n_chunks)
    n_tiles = p_pad // p_tile
    n_inner = n_tiles // n_chunks

    idx = idx.astype(jnp.int32)
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * p_tile
    starts = jax.vmap(lambda r: jnp.searchsorted(r, bases))(idx)
    s128 = jnp.clip(starts // 128, 0, (k - kw) // 128).astype(jnp.int32)

    # pre-gathered per-tile index windows, chunk axis explicit so the
    # (n_inner, kw) block equals the array's trailing dims (Mosaic's
    # tiling rule); only T·kw int32 — a few MB at Act3D scale
    idxw = jax.vmap(
        jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s * 128,), (kw,)),
            in_axes=(None, 0),
        )
    )(idx, s128).reshape(b, n_chunks, n_inner, kw)

    dx = pl.pallas_call(
        functools.partial(
            _chunked_kernel, p_tile=p_tile, kw=kw, n_inner=n_inner
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c), g.dtype),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s128 (B, T)
            pl.BlockSpec(
                (1, 1, n_inner, kw), lambda bi, ci: (bi, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, c), lambda bi, ci: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, p_tile * n_inner, c), lambda bi, ci: (bi, ci, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(s128, idxw, g)
    return dx[:, :out_rows]
