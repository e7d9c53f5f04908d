"""2D block-cyclic distributed Cholesky (ScaLAPACK pdpotrf-shaped, TPU-native).

SURVEY.md S9.4 names this the hard part of the large-n path: factorize the
n x n correlation matrix over a TWO-dimensional device mesh so that both
memory and communication scale with the mesh, not just its rows.

Layout: the matrix is tiled into B x B blocks; block (i, j) lives on device
(i mod P_r, j mod P_c) of a (P_r, P_c) mesh — the classic block-cyclic
distribution, which keeps every device busy in every step of the
factorization (a plain 2D-tiled layout would idle the top-left devices as
the panel sweeps down). JAX shardings tile contiguously, so the wrapper
permutes block rows/cols into owner-major order first; inside shard_map each
device holds a dense (G/P_r, G/P_c, B, B) stack of its blocks.

Per step k (right-looking, explicit collectives over named axes):
  1. owner of (k,k) factorizes the B x B diagonal block; masked-psum
     broadcast of A_kk over BOTH axes (B^2 words), chol replicated.
  2. owner COLUMN does the batched panel TRSM L_ik = A_ik L_kk^-T
     (row blocks i >= k, one batched MXU TRSM per device).
  3. masked-psum of the panel along `mc` (each device row's blocks,
     G/P_r * B^2 words) then along `mr` scattered to global positions
     (G * B^2 words) — after which every device holds the full (n, B)
     panel, exactly what its trailing GEMM needs.
  4. trailing update: one batched GEMM per device over its whole local
     block stack, column-masked to j > k (static shapes; masked FLOPs are
     full-speed MXU work, the same trade as ops.distributed_cholesky).

Communication per step is O(n*B) words independent of P, i.e. O(n^2) total
— the same as the 1D row-sharded schemes — but per-device MEMORY is n^2/P
(vs n^2/P_r for 1D) and the panel TRSM parallelizes over P_r instead of
being serialized on one block column, which is what lets the factorization
ride a pod-slice mesh shaped (rows, cols) instead of a single ring.

Numerics: same contract as ops.distributed_cholesky — feed a
nugget-bearing SPD matrix; fp32 on TPU, fp64 under the CPU test mesh.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cyclic_order(g: int, p: int) -> np.ndarray:
    """Block indices reordered owner-major: [0, p, 2p, ..., 1, 1+p, ...]."""
    return np.arange(g).reshape(-1, p).T.reshape(-1)


def _kernel(local, *, g: int, block: int, p_r: int, p_c: int,
            ar: str, ac: str):
    """shard_map body. local: (1, G/P_r, 1, G/P_c, B, B) owner-major blocks."""
    g_lr = g // p_r
    g_lc = g // p_c
    loc = local[0, :, 0]                      # (Glr, Glc, B, B)
    my_r = lax.axis_index(ar).astype(jnp.int32)
    my_c = lax.axis_index(ac).astype(jnp.int32)
    gi = my_r + p_r * jnp.arange(g_lr, dtype=jnp.int32)   # my global rows
    gj = my_c + p_c * jnp.arange(g_lc, dtype=jnp.int32)   # my global cols

    def step(k, loc):
        owner_r = k % p_r
        owner_c = k % p_c
        li = k // p_r
        lj = k // p_c
        # 1. diagonal block: masked-psum broadcast, replicated chol
        akk = lax.dynamic_slice(
            loc, (li, lj, 0, 0), (1, 1, block, block))[0, 0]
        akk = jnp.where(
            jnp.logical_and(my_r == owner_r, my_c == owner_c), akk, 0.0)
        akk = lax.psum(akk, (ar, ac))
        lkk = lax.linalg.cholesky(akk, symmetrize_input=False)
        # 2. panel TRSM on the owner column (batched over local row blocks)
        acol = lax.dynamic_slice(
            loc, (0, lj, 0, 0), (g_lr, 1, block, block))[:, 0]
        lcol = lax.linalg.triangular_solve(
            jnp.broadcast_to(lkk, acol.shape), acol,
            left_side=False, lower=True, transpose_a=True)
        keep = jnp.logical_and(gi >= k, my_c == owner_c)[:, None, None]
        lcol = jnp.where(keep, lcol, 0.0)
        newcol = jnp.where(my_c == owner_c, lcol, acol)
        loc = lax.dynamic_update_slice(loc, newcol[:, None], (0, lj, 0, 0))
        # 3. panel exchange: along mc (my row-set blocks, (G/P_r) B^2
        # words), then along mr ONLY the blocks this device's columns
        # need ((G/P_c) B^2 words) — the trailing update on device
        # (r, c) consumes prow (its rows, local after the ac psum) and
        # pcol (panel blocks at ITS column indices gj). The round-4
        # version psum'd the FULL (G, B, B) panel along mr (n B words
        # per step -> 2 n^2 per device total); exchanging just the gj
        # blocks is the ~n^2/sqrt(P) per-device volume that
        # distinguishes the 2D layout from the 1D schemes
        # (tools/collective_analysis.py round-5 finding). All devices
        # in an mr group share gj (it depends on my_c only), and the
        # block at global index t is owned, post-ac-psum, by the row
        # owner my_r == t mod P_r at local slot t // P_r.
        prow = lax.psum(lcol, ac)                          # (Glr, B, B)
        own = (gj % p_r) == my_r                           # (Glc,)
        slot = jnp.clip(gj // p_r, 0, g_lr - 1)
        contrib = jnp.where(own[:, None, None], prow[slot], 0.0)
        pcol = lax.psum(contrib, ar)                       # (Glc, B, B)
        # 4. trailing update, column-masked to j > k (static shapes)
        upd = jnp.einsum("apq,brq->abpr", prow, pcol,
                         preferred_element_type=loc.dtype,
                         precision=lax.Precision.HIGHEST)
        loc = loc - jnp.where((gj > k)[None, :, None, None], upd, 0.0)
        return loc

    loc = lax.fori_loop(0, g, step, loc)
    return loc[None, :, None]


def block_cyclic_cholesky(
    a,
    mesh: Mesh,
    *,
    axes: tuple[str, str] = ("mr", "mc"),
    block: int = 256,
) -> jax.Array:
    """Lower Cholesky factor of SPD `a` on a 2D mesh, block-cyclic layout.

    `a` is padded to a block-grid divisible by both mesh axes (identity
    tail). Returns the (n, n) factor as a global array (row-shard or
    reshard downstream as needed).
    """
    ar, ac = axes
    p_r, p_c = mesh.shape[ar], mesh.shape[ac]
    a = jnp.asarray(a)
    n = a.shape[0]
    lcm = int(np.lcm(p_r, p_c))
    step = block * lcm
    n_pad = ((n + step - 1) // step) * step
    if n_pad != n:
        big = jnp.zeros((n_pad, n_pad), a.dtype)
        big = big.at[:n, :n].set(a)
        big = big.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        a = big
    g = n_pad // block
    ridx = _cyclic_order(g, p_r)
    cidx = _cyclic_order(g, p_c)

    # global -> owner-major block-cyclic layout
    ab = a.reshape(g, block, g, block).transpose(0, 2, 1, 3)
    ab = ab[ridx][:, cidx]
    ab = ab.reshape(p_r, g // p_r, p_c, g // p_c, block, block)
    spec = P(ar, None, ac, None, None, None)
    ab = jax.device_put(ab, NamedSharding(mesh, spec))

    fn = jax.jit(
        jax.shard_map(
            partial(_kernel, g=g, block=block, p_r=p_r, p_c=p_c,
                    ar=ar, ac=ac),
            mesh=mesh,
            in_specs=(spec,),
            out_specs=spec,
            check_vma=False,
        )
    )
    lb = fn(ab)

    # owner-major -> global layout, zero the block upper triangle
    lb = lb.reshape(g, g, block, block)
    inv_r = np.argsort(ridx)
    inv_c = np.argsort(cidx)
    lb = lb[inv_r][:, inv_c]
    l = lb.transpose(0, 2, 1, 3).reshape(n_pad, n_pad)
    l = jnp.tril(l)
    return l[:n, :n]
