"""Row-sharded training-matrix construction for large-n fits.

BASELINE config 5 first half: build A = c(X, X) + nu I with the n x n
matrix sharded over mesh axis `mr` (rows). X itself is (n, d) — tiny — and
replicates; each shard computes only its row block, so no chip materializes
the full matrix. Output feeds ops.distributed_cholesky directly (same
layout).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gp_emu_uqsa_tpu.kernels import GPParams, gaussian_corr
from gp_emu_uqsa_tpu.parallel.predict import pad_to_multiple


def build_corr_sharded(
    x,
    params: GPParams,
    mesh: Mesh,
    *,
    axis: str = "mr",
):
    """A = c(X, X) + nugget*I, laid out P(axis, None) over the mesh.

    Returns the sharded (n_pad, n_pad) array and the original n (padding
    rows/cols carry an identity tail, so a Cholesky of the padded matrix
    restricts to the factor of the true block).
    """
    p = mesh.shape[axis]
    x = jnp.asarray(x)
    n = x.shape[0]
    x_p, _ = pad_to_multiple(x, p)
    n_pad = x_p.shape[0]

    def local(x_rows, x_full):
        me = jax.lax.axis_index(axis).astype(jnp.int32)
        blk = x_rows.shape[0]
        a_rows = gaussian_corr(x_rows, x_full, params)
        row0 = me * blk
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        on_diag = rows == cols
        valid = jnp.logical_and(rows < n, cols < n)
        a_rows = jnp.where(valid, a_rows, 0.0)            # zero padding block
        a_rows = jnp.where(
            jnp.logical_and(on_diag, valid), a_rows + params.nugget, a_rows
        )
        a_rows = jnp.where(                                # identity tail
            jnp.logical_and(on_diag, jnp.logical_not(valid)), 1.0, a_rows
        )
        return a_rows

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )
    a = fn(
        jax.device_put(x_p, NamedSharding(mesh, P(axis))),
        jax.device_put(x_p, NamedSharding(mesh, P())),
    )
    return a, n
