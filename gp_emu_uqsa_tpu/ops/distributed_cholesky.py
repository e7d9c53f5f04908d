"""Distributed blocked Cholesky over a device mesh (row-sharded).

SURVEY.md S9.4 hard part: factorize the n x n training correlation matrix
when it is sharded over a mesh axis (n = 16k+ across a pod slice).

Algorithm: right-looking panel factorization with panel width B, written as
global-array code with sharding constraints — GSPMD turns it into SPMD with
exactly one all-gather of the (n, B) panel per step riding ICI:

  for k in 0..n/B-1:
    Lkk   = chol(A[kB:(k+1)B, kB:(k+1)B])      (B x B, replicated)
    Lcol  = A[:, kB:(k+1)B] Lkk^-T              (row-local TRSM per shard)
    A    -= mask_trailing(Lcol Lcol^T)          (row-local GEMM after the
                                                 all-gather of Lcol)

The trailing update is computed full-width and column-masked (static
shapes for jit); that costs 3x the minimal FLOPs but every FLOP is a
full-speed MXU GEMM and the schedule has no dynamic shapes — on TPU this
beats exact-FLOP scalar-ish schedules by a wide margin. Rows above the
panel are zeroed, so the masked update leaves finished columns untouched
and the accumulated result IS the lower-triangular factor.

Numerics: fp32 with per-panel jitterless chol; feed well-conditioned
(nugget-bearing) matrices or pre-add jitter via ops.cholesky primitives.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@partial(jax.jit, static_argnames=("block", "axis_name"), donate_argnums=(0,))
def _dist_chol_impl(a, *, block: int, axis_name: str | None):
    n = a.shape[0]
    nb = n // block
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(k, a):
        off = k * block
        akk = lax.dynamic_slice(a, (off, off), (block, block))
        lkk = lax.linalg.cholesky(akk, symmetrize_input=False)
        panel = lax.dynamic_slice(a, (0, off), (n, block))
        # X Lkk^T = panel  =>  X = panel Lkk^-T   (row-local per shard)
        lcol = lax.linalg.triangular_solve(
            lkk, panel, left_side=False, lower=True, transpose_a=True
        )
        lcol = jnp.where(rows >= off, lcol, 0.0)
        a = lax.dynamic_update_slice(a, lcol, (0, off))
        update = lax.dot_general(
            lcol, lcol,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=a.dtype,
        )
        trailing = cols >= off + block
        a = a - jnp.where(trailing, update, 0.0)
        return a

    a = lax.fori_loop(0, nb, body, a)
    # zero the strict upper triangle (right-looking leaves stale values there)
    return jnp.where(cols <= rows, a, 0.0)


@partial(jax.jit, static_argnames=("block", "trans"))
def _dist_tri_solve_impl(l, b, *, block: int, trans: bool = False):
    """Blocked substitution L x = b (or L^T x = b) with row-sharded L.

    Per step: gather one (B, n) row (or (n, B) column) slice of L, one
    GEMM against the solved part, one local B x B TRSM. Total comm n^2/B
    rows; compute O(n^2 k), all GEMM-shaped.
    """
    n = l.shape[0]
    nb = n // block
    x = jnp.zeros_like(b)

    def body_fwd(k, x):
        off = k * block
        rows = lax.dynamic_slice(l, (off, 0), (block, n))
        partial_sum = rows @ x                    # solved prefix only:
        bk = lax.dynamic_slice(b, (off, 0), (block, b.shape[1]))
        lkk = lax.dynamic_slice(l, (off, off), (block, block))
        # (entries of x at/after off are still zero, and rows' diag block
        #  multiplies those zeros)
        xk = lax.linalg.triangular_solve(
            lkk, bk - partial_sum, left_side=True, lower=True
        )
        return lax.dynamic_update_slice(x, xk, (off, 0))

    def body_bwd(kk, x):
        k = nb - 1 - kk
        off = k * block
        cols = lax.dynamic_slice(l, (0, off), (n, block))   # (L^T) row slice
        partial_sum = cols.T @ x                  # solved suffix only
        bk = lax.dynamic_slice(b, (off, 0), (block, b.shape[1]))
        lkk = lax.dynamic_slice(l, (off, off), (block, block))
        xk = lax.linalg.triangular_solve(
            lkk, bk - partial_sum, left_side=True, lower=True,
            transpose_a=True,
        )
        return lax.dynamic_update_slice(x, xk, (off, 0))

    return lax.fori_loop(0, nb, body_bwd if trans else body_fwd, x)


def distributed_tri_solve(l, b, mesh: Mesh | None = None, *, axis: str = "mr",
                          block: int = 512, trans: bool = False):
    """Solve L x = b (or L^T x = b); L lower, row-sharded over `axis`."""
    l = jnp.asarray(l)
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    n = l.shape[0]
    n_pad = ((n + block - 1) // block) * block
    if n_pad != n:
        big_l = jnp.zeros((n_pad, n_pad), l.dtype)
        big_l = big_l.at[:n, :n].set(l)
        big_l = big_l.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        l = big_l
        b = jnp.pad(b, ((0, n_pad - n), (0, 0)))
    if mesh is not None:
        l = jax.device_put(l, NamedSharding(mesh, P(axis, None)))
        b = jax.device_put(b, NamedSharding(mesh, P(axis, None)))
    x = _dist_tri_solve_impl(l, b, block=block, trans=trans)
    x = x[:n]
    return x[:, 0] if squeeze else x


def distributed_cholesky(
    a,
    mesh: Mesh | None = None,
    *,
    axis: str = "mr",
    block: int = 512,
):
    """Lower Cholesky factor of `a`, row-sharded over mesh axis `axis`.

    `a` is padded internally to a multiple of `block` (identity tail).
    With mesh=None runs the same algorithm single-device.
    """
    a = jnp.asarray(a)
    n = a.shape[0]
    n_pad = ((n + block - 1) // block) * block
    if n_pad != n:
        big = jnp.zeros((n_pad, n_pad), a.dtype)
        big = big.at[:n, :n].set(a)
        big = big.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        a = big
    if mesh is not None:
        a = jax.device_put(a, NamedSharding(mesh, P(axis, None)))
    l = _dist_chol_impl(a, block=block, axis_name=axis if mesh else None)
    return l[:n, :n]
