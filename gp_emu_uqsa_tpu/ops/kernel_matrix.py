"""Pallas TPU kernel: fused Gaussian correlation-matrix build.

The hot O(n^2 d) op of every NLL evaluation (SURVEY.md S4.2 hot loop) is
A = exp(-D2(Xs)) + nu*I with Xs the delta-scaled inputs. The XLA path
(kernels.gaussian_corr_self) materializes D2 to HBM, then reads it back for
the exp — two full n^2 HBM round-trips. This kernel fuses norms, the MXU
cross-product, exp, and the nugget into one pass: each (TM, TN) tile of A
is computed in VMEM and written exactly once.

Distance compute (d <= 20, i.e. essentially always): the lane-packed
bf16x6 layout of ops/mxu_packing.py — the full D2 tile (norms included)
from ONE bf16 MXU pass at fp32 accuracy, 6x cheaper than the
Precision.HIGHEST fp32 dot it replaces (which burns 6 bf16 passes over a
k=128 contraction whose real feature count is ~8). Measured on TPU v5e at
n=4096: 19.6x faster than the XLA path even before packing; packing
removes most of the remaining MXU time. Above d=20 the packing no longer
fits in 128 lanes and the kernel falls back to the fp32 HIGHEST dot.

Layout: tiles are 256x256 fp32 (multiples of the (8,128) fp32 tile);
packed operands are (TILE, 128) bf16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gp_emu_uqsa_tpu.ops.mxu_packing import (
    pack_dist_a, pack_dist_b, packed_width, pad_lanes,
)

TILE = 256
_LANE = 128


def _kernel_packed(pa_ref, pb_ref, nug_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # ONE bf16 MXU pass -> the whole fp32-accurate D2 tile (see module doc).
    # precision is pinned to DEFAULT explicitly: a caller's fp32_exact
    # (default_matmul_precision("highest")) context otherwise leaks into
    # the kernel body and Mosaic rejects fp32-contract-precision on bf16
    # operands ("Bad lhs type") — the packing IS the 6-pass algorithm.
    d2 = jax.lax.dot_general(
        pa_ref[:], pb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    a = jnp.exp(-jnp.maximum(d2, 0.0))

    @pl.when(i == j)
    def _():
        m = a.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        out_ref[:] = a + jnp.where(row == col, nug_ref[0, 0], 0.0)

    @pl.when(i != j)
    def _():
        out_ref[:] = a


def _kernel_fp32(xs_i_ref, xs_j_ref, nug_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xi = xs_i_ref[:]                                   # (TILE, d_pad)
    xj = xs_j_ref[:]                                   # (TILE, d_pad)
    ni = jnp.sum(xi * xi, axis=1, keepdims=True)       # (TILE, 1)
    nj = jnp.sum(xj * xj, axis=1, keepdims=True).T     # (1, TILE)
    # HIGHEST precision: distances feed exp(); default fp32 matmul on TPU
    # rounds operands through bf16 (~1e-2 absolute error on A, observed)
    cross = jax.lax.dot_general(
        xi, xj,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(ni + nj - 2.0 * cross, 0.0)
    a = jnp.exp(-d2)

    @pl.when(i == j)
    def _():
        m = xi.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        out_ref[:] = a + jnp.where(row == col, nug_ref[0, 0], 0.0)

    @pl.when(i != j)
    def _():
        out_ref[:] = a


def _cross_kernel_packed(pa_ref, pb_ref, out_ref):
    # DEFAULT pinned: see _kernel_packed note (fp32_exact context leak)
    d2 = jax.lax.dot_general(
        pa_ref[:], pb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    out_ref[:] = jnp.exp(-jnp.maximum(d2, 0.0))


def _cross_kernel_fp32(xa_ref, xb_ref, out_ref):
    xi = xa_ref[:]
    xj = xb_ref[:]
    ni = jnp.sum(xi * xi, axis=1, keepdims=True)
    nj = jnp.sum(xj * xj, axis=1, keepdims=True).T
    cross = jax.lax.dot_general(
        xi, xj,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = jnp.exp(-jnp.maximum(ni + nj - 2.0 * cross, 0.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gaussian_corr_pallas(x1, x2, delta, *, interpret: bool = False):
    """Rectangular cross-correlation c(x1, x2) = exp(-D2), fused one-pass.

    The cross analog of `gaussian_corr_self_pallas` (no nugget, no
    symmetry): each (TILE, TILE) tile is built in VMEM and written once.
    Padded rows/cols produce garbage correlations against the ZERO-padded
    packed operands (see ops/serve.py padding note) and are sliced off.
    """
    x1 = jnp.asarray(x1, jnp.float32)
    x2 = jnp.asarray(x2, jnp.float32)
    m, d = x1.shape
    n = x2.shape[0]
    if x2.shape[1] != d:
        # the packed operands would zero-pad DIFFERENT widths to 128 and
        # the lane dot would "succeed" with garbage — fail loudly instead
        raise ValueError(
            f"feature dims differ: x1 has {d}, x2 has {x2.shape[1]}")
    inv_delta = 1.0 / jnp.asarray(delta, jnp.float32)
    m_pad = ((m + TILE - 1) // TILE) * TILE
    n_pad = ((n + TILE - 1) // TILE) * TILE
    packed = packed_width(d) <= _LANE
    if packed:
        op_a = pad_lanes(pack_dist_a(
            jnp.pad(x1 * inv_delta, ((0, m_pad - m), (0, 0)))))
        op_b = pad_lanes(pack_dist_b(
            jnp.pad(x2 * inv_delta, ((0, n_pad - n), (0, 0)))))
        kernel = _cross_kernel_packed
        in_width = _LANE
        dist_flops = 2 * m_pad * n_pad * _LANE
    else:
        d_pad = ((d + _LANE - 1) // _LANE) * _LANE
        op_a = jnp.pad(x1 * inv_delta, ((0, m_pad - m), (0, d_pad - d)))
        op_b = jnp.pad(x2 * inv_delta, ((0, n_pad - n), (0, d_pad - d)))
        kernel = _cross_kernel_fp32
        in_width = d_pad
        dist_flops = 6 * 2 * m_pad * n_pad * d_pad
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // TILE, n_pad // TILE),
        in_specs=[
            pl.BlockSpec((TILE, in_width), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, in_width), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=dist_flops + 2 * m_pad * n_pad,
            bytes_accessed=m_pad * n_pad * 4 + (m_pad + n_pad) * in_width * 4,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(op_a, op_b)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gaussian_corr_self_pallas(x, delta, nugget, *, interpret: bool = False):
    """A = exp(-sum_l ((x_i-x_j)/delta)^2) + nugget*I via one fused pass.

    x: (n, d) fp32; delta: (d,); nugget: scalar. n is padded to the tile
    size internally.
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    xs = x / jnp.asarray(delta, jnp.float32)
    n_pad = ((n + TILE - 1) // TILE) * TILE
    nug = jnp.asarray(nugget, jnp.float32).reshape(1, 1)
    grid = (n_pad // TILE, n_pad // TILE)
    packed = packed_width(d) <= _LANE

    if packed:
        xs_p = jnp.pad(xs, ((0, n_pad - n), (0, 0)))
        op_a = pad_lanes(pack_dist_a(xs_p))            # (n_pad, 128) bf16
        op_b = pad_lanes(pack_dist_b(xs_p))
        kernel = _kernel_packed
        in_width = _LANE
        dist_flops = 2 * n_pad * n_pad * _LANE         # one bf16 pass
    else:
        d_pad = ((d + _LANE - 1) // _LANE) * _LANE
        op_a = op_b = jnp.pad(xs, ((0, n_pad - n), (0, d_pad - d)))
        kernel = _kernel_fp32
        in_width = d_pad
        dist_flops = 6 * 2 * n_pad * n_pad * d_pad     # bf16x6 passes

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, in_width), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, in_width), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=dist_flops + 4 * n_pad * n_pad,
            bytes_accessed=n_pad * n_pad * 4 + 2 * n_pad * in_width * 4,
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(op_a, op_b, nug)
    return out[:n, :n]
