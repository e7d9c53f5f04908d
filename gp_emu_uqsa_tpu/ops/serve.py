"""Pallas TPU kernel: fused cross-correlation x RHS contraction (serving).

Serving-path hot op (reference `Posterior.mean`, SURVEY.md S4.3): the
posterior mean at m query points is

    mean = H* beta + c*(X*, X) @ e,        c* = exp(-D2(X*, X))

The XLA path materializes the (m, n) cross-correlation block in HBM (one
write) and reads it back for every downstream GEMM (c*@e, c*@A^-1 H, ...).
At serving scale (m = 1e6, n = 16k) that block is 64 GB per round-trip —
pure HBM-bandwidth waste, since each c* tile is cheap to recompute on the
MXU from the (m,d)+(n,d) inputs.

`corr_matvec_pallas` fuses the whole chain: each (TM, TN) correlation tile
is built in VMEM (norms + MXU cross-product + exp) and immediately
contracted against a resident (TN, r) RHS slab, accumulating a (TM, r)
output tile across the n-grid axis. c* never touches HBM. Packing
RHS = [e | A^-1 H] yields the mean and the R-term of the universal-kriging
variance in one pass; packing multi-output e's serves up to 128 outputs at
once.

Grid iteration on TPU is sequential per core, so the j-axis accumulation
into out_ref is race-free (guide: "Grid and Block Specifications").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256
TILE_N = 512
_LANE = 128


def _kernel(xs_ref, xt_ref, rhs_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = xs_ref[:]                                      # (TM, d_pad)
    xj = xt_ref[:]                                      # (TN, d_pad)
    ni = jnp.sum(xi * xi, axis=1, keepdims=True)        # (TM, 1)
    nj = jnp.sum(xj * xj, axis=1, keepdims=True).T      # (1, TN)
    # HIGHEST: distances feed exp(); bf16-rounded operands are visible there
    cross = jax.lax.dot_general(
        xi, xj,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(ni + nj - 2.0 * cross, 0.0)
    c = jnp.exp(-d2)                                    # (TM, TN) in VMEM only
    out_ref[:] += jax.lax.dot_general(
        c, rhs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def corr_matvec_pallas(xstar, x, delta, rhs, *, interpret: bool = False):
    """exp(-D2(xstar/delta, x/delta)) @ rhs without materializing the block.

    xstar: (m, d); x: (n, d); delta: (d,); rhs: (n, r) or (n,), r <= 128.
    Returns (m, r) (or (m,) for vector rhs) in fp32. Zero-padded training
    rows are neutralized by zero-padding rhs (their correlation column is
    multiplied by a zero RHS row).
    """
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    xstar = jnp.asarray(xstar, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    rhs = jnp.asarray(rhs, jnp.float32)
    m, d = xstar.shape
    n = x.shape[0]
    r = rhs.shape[1]
    if r > _LANE:
        raise ValueError(f"rhs width {r} > {_LANE}; split into slabs")
    inv_delta = 1.0 / jnp.asarray(delta, jnp.float32)
    xs = xstar * inv_delta
    xt = x * inv_delta

    m_pad = pl.cdiv(m, TILE_M) * TILE_M
    n_pad = pl.cdiv(n, TILE_N) * TILE_N
    d_pad = pl.cdiv(d, _LANE) * _LANE
    xs = jnp.pad(xs, ((0, m_pad - m), (0, d_pad - d)))
    xt = jnp.pad(xt, ((0, n_pad - n), (0, d_pad - d)))
    rhs = jnp.pad(rhs, ((0, n_pad - n), (0, _LANE - r)))

    grid = (m_pad // TILE_M, n_pad // TILE_N)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, _LANE), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, _LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, _LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * (d_pad + _LANE) + 4 * m_pad * n_pad,
            bytes_accessed=(m_pad * d_pad + n_pad * d_pad + n_pad * _LANE
                            + m_pad * _LANE) * 4,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(xs, xt, rhs)
    out = out[:m, :r]
    return out[:, 0] if squeeze else out


def serve_mean_pallas(pred, x, xstar, hstar, *, interpret: bool = False):
    """Posterior mean at xstar via the fused kernel (mean-only serving).

    `pred` is a gp.Predictor; equivalent to gp.predict_fast(...)[0] but with
    no (m, n) HBM intermediate. Suitable for the 1M-point mean-serving path.
    """
    ce = corr_matvec_pallas(
        xstar, x, jnp.exp(pred.params.log_delta), pred.e, interpret=interpret
    )
    return jnp.asarray(hstar, jnp.float32) @ pred.beta.astype(jnp.float32) + ce
