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
