"""Optimized (maximin) Latin-hypercube experimental design.

Reference parity: `gp_emu_uqsa/design_inputs/optLatinHyperCube(dim, n, N,
minmax, filename)` (SURVEY.md S3 "Design inputs"): draw N candidate LHCs,
keep the one maximizing the minimum pairwise distance, rescale to the
per-dimension [min, max] ranges, write a whitespace file.

TPU-first redesign: all N candidates are generated and scored in ONE
batched jit program — `jax.vmap` over the candidate axis; the O(N n^2 d)
pairwise-distance scoring runs as batched MXU matmuls instead of the
reference's Python loop over candidates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gp_emu_uqsa_tpu.dataio import save_matrix


@partial(jax.jit, static_argnames=("dim", "n"))
def _candidate_lhc(key, dim: int, n: int) -> jax.Array:
    """One stratified LHC sample in [0,1]^dim: per-dim permuted strata."""
    kp, ku = jax.random.split(key)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(
        jax.random.split(kp, dim)
    ).T                                                     # (n, dim)
    u = jax.random.uniform(ku, (n, dim))
    return (perms + u) / n


@partial(jax.jit, static_argnames=("dim", "n", "n_candidates"))
def _best_lhc(key, dim: int, n: int, n_candidates: int) -> tuple[jax.Array, jax.Array]:
    """Generate n_candidates LHCs, return (best design, its maximin score)."""

    def score(x):
        # squared pairwise distances via the matmul expansion (MXU-friendly)
        sq = jnp.sum(x * x, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
        d2 = d2 + jnp.eye(n) * jnp.inf        # ignore self-distances
        return jnp.min(d2)

    keys = jax.random.split(key, n_candidates)
    designs = jax.vmap(lambda k: _candidate_lhc(k, dim, n))(keys)
    scores = jax.vmap(score)(designs)
    best = jnp.argmax(scores)
    return designs[best], scores[best]


def optLatinHyperCube(
    dim: int,
    n: int,
    N: int,
    minmax,
    filename: str | None = None,
    *,
    seed: int = 0,
):
    """Maximin-optimized LHC design (reference API).

    Args:
      dim: number of inputs.
      n: number of design points.
      N: number of candidate LHCs to draw.
      minmax: per-dim [min, max] list, shape (dim, 2).
      filename: if given, write the whitespace design file.
      seed: RNG seed.

    Returns the (n, dim) design as a NumPy array in raw (unscaled) space.
    """
    design, _ = _best_lhc(jax.random.key(seed), dim, n, N)
    mm = np.asarray(minmax, dtype=np.float64).reshape(dim, 2)
    out = np.asarray(design) * (mm[:, 1] - mm[:, 0]) + mm[:, 0]
    if filename:
        save_matrix(filename, out)
    return out
