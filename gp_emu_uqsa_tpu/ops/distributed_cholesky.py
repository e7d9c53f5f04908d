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

from functools import lru_cache, partial

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
            precision=lax.Precision.HIGHEST,
        )
        trailing = cols >= off + block
        a = a - jnp.where(trailing, update, 0.0)
        return a

    a = lax.fori_loop(0, nb, body, a)
    # zero the strict upper triangle (right-looking leaves stale values there)
    return jnp.where(cols <= rows, a, 0.0)


def _tri_solve_loop(l, b, *, block: int, trans: bool = False,
                    col_sharding=None):
    """Blocked substitution L x = b (or L^T x = b) with row-sharded L.

    Per step: one (B, n) row (or (n, B) column) slice of L, one GEMM
    against the solved part, one local B x B TRSM. Unjitted body — call
    `distributed_tri_solve` (standalone) or embed in a larger jitted
    program (`predictor_large`'s W build).

    col_sharding: optional NamedSharding(mesh, P(None, axis)) hint for
    the forward step's row slice. MEASURED INEFFECTIVE (round-5 HLO
    probe): with or without the hint, GSPMD compiles this formulation
    with one all-gather of the FULL (n, n) factor before the loop — the
    loop-varying dynamic-slice on the sharded row axis is not
    partitionable, so the solver replicates `l`. The real fix is
    `tri_solve_shard_map` below (factor stays local, ~2nk-word
    collectives), which `distributed_tri_solve` prefers whenever the
    block/shard alignment allows; this GSPMD body remains the
    single-device and unaligned fallback.
    """
    n = l.shape[0]
    nb = n // block
    x = jnp.zeros_like(b)

    def body_fwd(k, x):
        off = k * block
        rows = lax.dynamic_slice(l, (off, 0), (block, n))
        if col_sharding is not None:
            rows = lax.with_sharding_constraint(rows, col_sharding)
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


@partial(jax.jit, static_argnames=("block", "trans", "col_sharding"))
def _dist_tri_solve_impl(l, b, *, block: int, trans: bool = False,
                         col_sharding=None):
    return _tri_solve_loop(l, b, block=block, trans=trans,
                           col_sharding=col_sharding)


def _tri_solve_shard_map_local(l_loc, b_loc, *, axis: str, block: int,
                               rows_per: int, trans: bool):
    """Per-device body of the manual distributed substitution (see
    tri_solve_shard_map). l_loc (n/P, n) = my row block of L (FULL
    columns); b_loc (n/P, k) = my rows of the RHS."""
    me = jax.lax.axis_index(axis)
    n = l_loc.shape[1]
    nb = n // block
    kk = b_loc.shape[1]
    eye = jnp.eye(block, dtype=l_loc.dtype)

    def solve_block(off, loc_off, owner, rhs_blk, transpose):
        """TRSM of the diagonal block on the owner; identity elsewhere
        (non-owner lanes compute on in-bounds garbage that the psum mask
        discards — the identity keeps it finite)."""
        lkk = jax.lax.dynamic_slice(l_loc, (loc_off, off), (block, block))
        lkk = jnp.where(me == owner, lkk, eye)
        xk = jax.lax.linalg.triangular_solve(
            lkk, rhs_blk, left_side=True, lower=True, transpose_a=transpose)
        # one-to-all broadcast of the solved block: psum of the masked
        # value — B*k words per step, the step's ONLY collective
        return jax.lax.psum(jnp.where(me == owner, xk, 0.0), axis)

    if not trans:
        # forward L x = b: running accumulator acc[r] = sum_solved
        # L[row r, solved] @ x_solved, updated from MY OWN column slice
        # of the broadcast block — no L or x movement at all
        def body(k, carry):
            x_loc, acc = carry
            off = k * block
            owner = off // rows_per
            loc_off = off - owner * rows_per
            bk = jax.lax.dynamic_slice(b_loc, (loc_off, 0), (block, kk))
            ak = jax.lax.dynamic_slice(acc, (loc_off, 0), (block, kk))
            xk = solve_block(off, loc_off, owner, bk - ak, False)
            col = jax.lax.dynamic_slice(l_loc, (0, off), (rows_per, block))
            acc = acc + col @ xk
            x_new = jax.lax.dynamic_update_slice(x_loc, xk, (loc_off, 0))
            x_loc = jnp.where(me == owner, x_new, x_loc)
            return x_loc, acc

        x_loc, _ = jax.lax.fori_loop(
            0, nb, body, (jnp.zeros_like(b_loc), jnp.zeros_like(b_loc)))
        return x_loc

    # backward L^T x = b: per step each device contributes its local rows'
    # partial (L[:, off:off+B]^T x)_local; the psum assembles the full sum
    # (solved rows only are nonzero in x_loc), B*k words each way
    def body(i, x_loc):
        k = nb - 1 - i
        off = k * block
        owner = off // rows_per
        loc_off = off - owner * rows_per
        colT = jax.lax.dynamic_slice(l_loc, (0, off), (rows_per, block))
        partial_loc = colT.T @ x_loc                       # (B, kk)
        s = jax.lax.psum(partial_loc, axis)
        bk = jax.lax.dynamic_slice(b_loc, (loc_off, 0), (block, kk))
        xk = solve_block(off, loc_off, owner, bk - s, True)
        x_new = jax.lax.dynamic_update_slice(x_loc, xk, (loc_off, 0))
        return jnp.where(me == owner, x_new, x_loc)

    return jax.lax.fori_loop(0, nb, body, jnp.zeros_like(b_loc))


def tri_solve_shard_map(l, b, mesh: Mesh, *, axis: str = "mr",
                        block: int = 512, trans: bool = False):
    """Manual shard_map blocked substitution: L stays (n/P, n) PER DEVICE.

    Round-5 finding (tools/collective_analysis.py + HLO probe): under the
    GSPMD formulation the loop-varying dynamic-slice on the sharded row
    axis is not partitionable, so XLA silently ALL-GATHERS the full
    (n, n) factor before the loop — n^2 words of traffic per solve and,
    worse, an (n, n) replicated buffer per device, defeating the
    row-sharded memory story at exactly the n that needs it. This manual
    version keeps every L operand local and moves only the solved (B, k)
    block per step through one psum (+ one more for the backward partial
    sums): total collective volume ~2 n k words, and per-device memory
    n^2/P + nk.

    Requires n % (block * P) == 0 with block <= n/P (callers fall back to
    the GSPMD path otherwise).
    """
    p = mesh.shape[axis]
    l = jnp.asarray(l)
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    n = l.shape[0]
    rows_per = n // p
    if n % p or rows_per % block or block > rows_per:
        raise ValueError(
            f"tri_solve_shard_map needs block | n/P (n={n}, P={p}, "
            f"block={block}); use distributed_tri_solve's GSPMD path")
    fn = _shard_map_solver(mesh, axis, block, rows_per, trans)
    x = fn(jax.device_put(l, NamedSharding(mesh, P(axis, None))),
           jax.device_put(b, NamedSharding(mesh, P(axis, None))))
    return x[:, 0] if squeeze else x


@lru_cache(maxsize=64)
def _shard_map_solver(mesh, axis, block, rows_per, trans):
    """One cached jitted shard_map program per (mesh, layout) — a fresh
    jax.jit wrapper per call would retrace/recompile every solve
    (code-review r5 finding #2; the repo's module-scope-jit convention)."""
    local = partial(_tri_solve_shard_map_local, axis=axis, block=block,
                    rows_per=rows_per, trans=trans)
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def distributed_tri_solve(l, b, mesh: Mesh | None = None, *, axis: str = "mr",
                          block: int = 512, trans: bool = False):
    """Solve L x = b (or L^T x = b); L lower, row-sharded over `axis`.

    With a mesh and compatible alignment this dispatches to the manual
    shard_map substitution (tri_solve_shard_map — L stays local per
    device, ~2nk words of collectives); otherwise the GSPMD global-array
    formulation (which XLA compiles with a full-factor all-gather — see
    tri_solve_shard_map's docstring for the measured finding).
    """
    l = jnp.asarray(l)
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    n = l.shape[0]
    if mesh is not None:
        p = mesh.shape[axis]
        if n % p == 0 and (n // p) % block == 0 and block <= n // p:
            x = tri_solve_shard_map(l, b, mesh, axis=axis, block=block,
                                    trans=trans)
            return x[:, 0] if squeeze else x
    n_pad = ((n + block - 1) // block) * block
    if n_pad != n:
        big_l = jnp.zeros((n_pad, n_pad), l.dtype)
        big_l = big_l.at[:n, :n].set(l)
        big_l = big_l.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        l = big_l
        b = jnp.pad(b, ((0, n_pad - n), (0, 0)))
    col_sharding = None
    if mesh is not None:
        l = jax.device_put(l, NamedSharding(mesh, P(axis, None)))
        b = jax.device_put(b, NamedSharding(mesh, P(axis, None)))
        col_sharding = NamedSharding(mesh, P(None, axis))
    x = _dist_tri_solve_impl(l, b, block=block, trans=trans,
                             col_sharding=col_sharding)
    x = x[:n]
    return x[:, 0] if squeeze else x


def _rec_chol(a, shard, leaf: int):
    """Recursive split on a row-sharded global array (see wrapper below)."""
    n = a.shape[0]
    if n <= leaf:
        # leaf factorization is replicated: 2.8 GFLOP at leaf=2048 —
        # negligible vs the trailing GEMMs it unlocks
        return lax.linalg.cholesky(a, symmetrize_input=False)
    half = n // 2
    a11 = a[:half, :half]
    a21 = shard(a[half:, :half])
    a22 = shard(a[half:, half:])
    l11 = _rec_chol(a11, shard, leaf)
    # row-local TRSM: each shard of a21 solves against the (gathered) l11
    l21 = shard(lax.linalg.triangular_solve(
        l11, a21, left_side=False, lower=True, transpose_a=True
    ))
    update = lax.dot_general(
        l21, l21,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=lax.Precision.HIGHEST,
    )
    l22 = _rec_chol(shard(a22 - update), shard, leaf)
    zeros = jnp.zeros((half, n - half), a.dtype)
    return jnp.concatenate(
        [jnp.concatenate([l11, zeros], axis=1),
         jnp.concatenate([l21, l22], axis=1)],
        axis=0,
    )


def distributed_cholesky_recursive(
    a,
    mesh: Mesh | None = None,
    *,
    axis: str = "mr",
    leaf: int = 2048,
):
    """Recursive distributed Cholesky: ~1.5x minimal FLOPs (vs ~3x for the
    masked panel scheme) — every FLOP a large MXU GEMM/TRSM.

        chol([[A11, .], [A21, A22]]):
          L11 = rec(A11)                      (left recursion)
          L21 = A21 L11^-T                    (row-local TRSM; L11 gathered)
          L22 = rec(A22 - L21 L21^T)          (one all-gather of L21/level)

    Comm: one all-gather per recursion node, total ~n^2/2 words over ICI.
    The recursion unrolls at trace time (log2(n/leaf) levels, static
    shapes); sharding constraints keep every >leaf intermediate row-sharded
    so GSPMD's SPMD partitioning matches the 1D panel scheme's layout.
    `a` is padded to a power-of-two multiple of `leaf` (identity tail).
    """
    a = jnp.asarray(a)
    n = a.shape[0]
    target = leaf
    while target < n:
        target *= 2
    if target != n:
        big = jnp.zeros((target, target), a.dtype)
        big = big.at[:n, :n].set(a)
        big = big.at[jnp.arange(n, target), jnp.arange(n, target)].set(1.0)
        a = big
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis, None))
        a = jax.device_put(a, sharding)

        def shard(x):
            if x.shape[0] % mesh.shape[axis] == 0:
                return lax.with_sharding_constraint(x, sharding)
            return x
    else:
        def shard(x):
            return x

    l = jax.jit(partial(_rec_chol, shard=shard, leaf=leaf))(a)
    return l[:n, :n]


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
