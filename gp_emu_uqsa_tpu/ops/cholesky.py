"""Cholesky factorization + triangular solves with a jitter ladder.

The reference (SURVEY.md S4.2) calls numpy.linalg.cholesky /
scipy.linalg.cho_solve in fp64; TPU has no fp64 matmul path, so fp32
factorizations of near-singular correlation matrices (tiny nugget, clustered
inputs) can fail. `cholesky_with_jitter` retries with a geometric jitter
ladder entirely inside jit (lax.while_loop over a scalar jitter level; the
factorization itself is XLA's blocked Cholesky, which maps to MXU GEMMs for
the trailing updates).

Success is detected by the factor containing no NaNs: XLA's cholesky returns
NaNs below the first failing pivot rather than raising.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _chol_rev(l, l_bar):
    """Reverse-mode Cholesky adjoint: cotangent of A given (L, L_bar).

    Transpose of the Cholesky JVP dL = L Phi(L^-1 dA L^-T), Phi = lower
    triangle with halved diagonal (Murray 2016, "Differentiation of the
    Cholesky decomposition"):

        A_bar = L^-T Phi(L^T L_bar) L^-1    (UNsymmetrized — verified
        numerically against lax.linalg.cholesky's own VJP, which leaves
        the symmetrization to the upstream producer of A).
    """
    s = jnp.matmul(l.mT, l_bar, precision=lax.Precision.HIGHEST)
    p = jnp.tril(s) - 0.5 * jnp.diagflat(jnp.diagonal(s))
    t = lax.linalg.triangular_solve(l, p, left_side=True, lower=True,
                                    transpose_a=True)
    return lax.linalg.triangular_solve(l, t, left_side=False, lower=True,
                                       transpose_a=False)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _chol_jitter_impl(a, init, growth, max_tries):
    """Probe + jitter-ladder factorization; (L, jitter_used).

    The ladder carries (jitter, L) through its while_loop, so the
    successful factorization is not thrown away and recomputed (the
    round-2 structure cost one extra full Cholesky — 61 ms at n=16k on
    v5e — on every unhealthy-probe NLL evaluation).

    custom_vjp wraps the WHOLE probe+cond structure: the adjoint is
    computed from the RETURNED (finite) factor via `_chol_rev`, which is
    correct for both branches at the selected (constant) jitter — and,
    critically, keeps autodiff away from the failed NaN probe factor:
    differentiating the naive structure propagates NaN * 0 = NaN
    cotangents out of the UNTAKEN healthy branch (measured: grad was NaN
    whenever the ladder engaged).
    """
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    l0 = lax.linalg.cholesky(a + init * eye, symmetrize_input=False)
    healthy = jnp.logical_not(jnp.any(jnp.isnan(l0)))

    def fallback(_):
        base = jnp.mean(jnp.diagonal(a, axis1=-2, axis2=-1), axis=-1)
        eps = jnp.asarray(
            1e-12 if a.dtype == jnp.float64 else 1e-6, dtype=a.dtype
        )
        # n-scaled first rung: the ladder only runs after the probe
        # failed, and the accumulated rounding of an n-term pivot update
        # is ~n*eps*diag — eps-scaled rungs just climb back up to it
        first = jnp.where(init == 0.0, base * eps * n,
                          init * jnp.asarray(growth, a.dtype))

        def cond(state):
            k, _, l = state
            return jnp.logical_and(k < max_tries, jnp.any(jnp.isnan(l)))

        def attempt(jit_amt):
            return lax.linalg.cholesky(a + jit_amt * eye,
                                       symmetrize_input=False)

        def body(state):
            k, jit_amt, _ = state
            new_jit = jit_amt * jnp.asarray(growth, a.dtype)
            return k + 1, new_jit, attempt(new_jit)

        _, jit_used, l = lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), first, attempt(first)))
        return l, jit_used

    return lax.cond(
        healthy,
        lambda _: (l0, init),
        fallback,
        None,
    )


def _chol_jitter_fwd(a, init, growth, max_tries):
    l, jit_used = _chol_jitter_impl(a, init, growth, max_tries)
    return (l, jit_used), (l, init)


def _chol_jitter_bwd(growth, max_tries, res, cot):
    l, init = res
    l_bar, _ = cot
    return _chol_rev(l, l_bar), jnp.zeros_like(init)


_chol_jitter_impl.defvjp(_chol_jitter_fwd, _chol_jitter_bwd)


@partial(jax.jit, static_argnames=("growth", "max_tries"))
def cholesky_with_jitter(
    a: jax.Array,
    initial_jitter: float | jax.Array = 0.0,
    growth: float = 10.0,
    max_tries: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Lower Cholesky factor of `a` (+ jitter*I as needed).

    Returns (L, jitter_used). If `a` is factorizable as-is (the common case
    when the nugget is healthy) no jitter is added and the matrix is
    factorized exactly ONCE — the ladder search only runs inside a
    lax.cond branch taken on NaN (measured: the old always-search version
    doubled the factorization cost of every healthy gp.fit). When the
    probe fails, the ladder starts at the Higham-style breakdown scale
    n*eps*diag and CARRIES its factor out of the loop, so the typical
    unhealthy case costs 2 factorizations total (probe + first rung)
    instead of round 2's ~7 (probe + 5 eps-scaled rungs + recompute) —
    measured 389 ms -> ~122 ms per factorization-with-ladder at n=16k
    fp32 on v5e. On total failure the factor is NaN and downstream NLL
    evaluations see +inf via nan-guards. Differentiable: d L/d a via the
    manual Cholesky adjoint `_chol_rev` on the returned factor (both
    branches); the jitter level is a constant in autodiff, as before.
    """
    init = jnp.asarray(initial_jitter, dtype=a.dtype)
    return _chol_jitter_impl(a, init, float(growth), max_tries)


def blocked_tri_solve_right(l: jax.Array, b: jax.Array, *,
                            leaf: int = 1024) -> jax.Array:
    """Solve X L^T = B (right-side, transposed, lower L) blocked.

    The right-side analog of `blocked_tri_solve`, used by the blocked
    Cholesky's panel step X = B L^-T. Splitting L as
    [[L11, 0], [L21, L22]] and B's columns as [B1, B2]:

        X1 = B1 L11^-T
        X2 = (B2 - X1 L21^T) L22^-T

    turns all off-diagonal work into fp32-accurate MXU GEMMs; only the
    (m, leaf) leaf solves hit XLA's sequential TRSM lowering.
    """
    n = l.shape[-1]
    if n <= leaf:
        return lax.linalg.triangular_solve(
            l, b, left_side=False, lower=True, transpose_a=True
        )
    half = n // 2
    l11 = l[..., :half, :half]
    l21 = l[..., half:, :half]
    l22 = l[..., half:, half:]
    b1 = b[..., :, :half]
    b2 = b[..., :, half:]
    mm = partial(jnp.matmul, precision=lax.Precision.HIGHEST)
    x1 = blocked_tri_solve_right(l11, b1, leaf=leaf)
    x2 = blocked_tri_solve_right(l22, b2 - mm(x1, l21.mT), leaf=leaf)
    return jnp.concatenate([x1, x2], axis=-1)


def blocked_cholesky(a: jax.Array, leaf: int = 512) -> jax.Array:
    """Recursive blocked lower-Cholesky tuned for the MXU.

    chol([[A11,  .],[A21, A22]]):
        L11 = chol(A11)
        L21 = A21 L11^-T          (blocked right-side TRSM)
        L22 = chol(A22 - L21 L21^T)   (SYRK -> GEMM on the MXU)

    The recursion unrolls at trace time (static shapes, log2(n/leaf)
    levels); the dominant trailing-update SYRK runs as a full-speed fp32
    GEMM, which is where XLA's built-in Cholesky loses time at large n.
    The panel TRSM is blocked too (`blocked_tri_solve_right`): XLA's
    one-shot triangular_solve lowers to a sequential update-slice chain
    on TPU, and at n=16k the (8192, 8192) top-level solve was the single
    largest non-GEMM cost of the factorization. Leaves fall back to
    lax.linalg.cholesky. n must be a power-of-two multiple of leaf or is
    handled by the wrapper below.
    """
    n = a.shape[-1]
    if n <= leaf:
        return lax.linalg.cholesky(a, symmetrize_input=False)
    half = n // 2
    a11 = a[..., :half, :half]
    a21 = a[..., half:, :half]
    a22 = a[..., half:, half:]
    l11 = blocked_cholesky(a11, leaf)
    # L21 = A21 L11^-T  <=>  solve X L11^T = A21
    l21 = blocked_tri_solve_right(l11, a21, leaf=leaf)
    update = lax.dot_general(
        l21, l21,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=a.dtype,
        # HIGHEST: TPU's default f32 dot is a single bf16 pass — an 8-bit
        # mantissa on the trailing update wrecks the factor; bf16x6 keeps
        # fp32 accuracy (the roofline judges against the fp32 roof)
        precision=lax.Precision.HIGHEST,
    )
    l22 = blocked_cholesky(a22 - update, leaf)
    zeros = jnp.zeros_like(a[..., :half, half:])
    return jnp.concatenate(
        [
            jnp.concatenate([l11, zeros], axis=-1),
            jnp.concatenate([l21, l22], axis=-1),
        ],
        axis=-2,
    )


def cholesky_blocked_padded(a: jax.Array, leaf: int = 512) -> jax.Array:
    """blocked_cholesky for arbitrary n: pads to the next power-of-two
    multiple of `leaf` with an identity tail (factor of the padded matrix
    restricts exactly to the factor of `a`)."""
    n = a.shape[-1]
    if n <= leaf:
        return lax.linalg.cholesky(a, symmetrize_input=False)
    target = leaf
    while target < n:
        target *= 2
    if target == n:
        return blocked_cholesky(a, leaf)
    pad = target - n
    eye_tail = jnp.eye(pad, dtype=a.dtype)
    big = jnp.zeros(a.shape[:-2] + (target, target), a.dtype)
    big = big.at[..., :n, :n].set(a)
    big = big.at[..., n:, n:].set(eye_tail)
    return blocked_cholesky(big, leaf)[..., :n, :n]


def tri_solve(l: jax.Array, b: jax.Array, *, trans: bool = False) -> jax.Array:
    """Solve L x = b (or L^T x = b when trans) with L lower-triangular."""
    return lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=trans
    )


def blocked_tri_solve(l: jax.Array, b: jax.Array, *, trans: bool = False,
                      leaf: int = 1024) -> jax.Array:
    """tri_solve via trace-time blocked recursion (GEMM-dominated TRSM).

    XLA:TPU's one-shot triangular_solve with a large RHS (e.g. the
    (16384, 16384) identity in `gp.predictor`) lowers to a
    dynamic-update-slice chain whose temporaries it keeps live — measured
    65 GB of HBM temps at n=16k on v5e (round-2 bench, HBM is 16 GB).
    Splitting L as [[L11, 0], [L21, L22]]:

        X1 = L11^-1 B1
        X2 = L22^-1 (B2 - L21 X1)         (and mirrored for L^T)

    keeps each leaf solve's working set at (leaf, m) and turns the bulk of
    the FLOPs into fp32-accurate MXU GEMMs, like `blocked_cholesky`.
    """
    n = l.shape[-1]
    if n <= leaf:
        return tri_solve(l, b, trans=trans)
    half = n // 2
    l11 = l[..., :half, :half]
    l21 = l[..., half:, :half]
    l22 = l[..., half:, half:]
    b1 = b[..., :half, :]
    b2 = b[..., half:, :]
    mm = partial(jnp.matmul, precision=lax.Precision.HIGHEST)
    if not trans:
        x1 = blocked_tri_solve(l11, b1, trans=False, leaf=leaf)
        x2 = blocked_tri_solve(l22, b2 - mm(l21, x1), trans=False, leaf=leaf)
    else:
        # L^T = [[L11^T, L21^T], [0, L22^T]]
        x2 = blocked_tri_solve(l22, b2, trans=True, leaf=leaf)
        x1 = blocked_tri_solve(l11, b1 - mm(l21.mT, x2), trans=True, leaf=leaf)
    return jnp.concatenate([x1, x2], axis=-2)


def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b (blocked TRSMs at large n, see tri_solve_auto)."""
    if l.shape[-1] > BLOCKED_TRSM_THRESHOLD:
        return blocked_tri_solve(l, blocked_tri_solve(l, b), trans=True)
    return tri_solve(l, tri_solve(l, b), trans=True)


# one-shot TRSM with an (n, n) RHS OOMs XLA:TPU at n=16k (65 GB of
# update-slice temps on a 16 GB chip, measured round-2 bench); above this
# threshold inversions switch to the blocked recursion
BLOCKED_TRSM_THRESHOLD = 4096


def tri_solve_auto(l: jax.Array, b: jax.Array, *,
                   trans: bool = False) -> jax.Array:
    """tri_solve that switches to the blocked recursion at large n.

    XLA:TPU's one-shot TRSM is a sequential update-slice chain even for
    narrow RHS: measured 6.0 ms vs 2.3 ms blocked at n=16384, k=10 (and it
    OOMs outright for wide RHS, see BLOCKED_TRSM_THRESHOLD). All the
    gp-core solves route through here so the large-n paths get the blocked
    form automatically.
    """
    if l.shape[-1] > BLOCKED_TRSM_THRESHOLD:
        return blocked_tri_solve(l, b, trans=trans)
    return tri_solve(l, b, trans=trans)


def tri_inverse(l: jax.Array) -> jax.Array:
    """L^-1 for lower-triangular L, safe at large n on TPU.

    Small n uses XLA's one-shot TRSM; past BLOCKED_TRSM_THRESHOLD the
    blocked recursion keeps the working set bounded and the FLOPs on the
    MXU (see `blocked_tri_solve`). Shared by `gp.predictor` and
    `sensitivity.Sensitivity` so every A^-1 materialization in the
    framework takes the OOM-safe path.
    """
    n = l.shape[-1]
    eye = jnp.eye(n, dtype=l.dtype)
    if n > BLOCKED_TRSM_THRESHOLD:
        return blocked_tri_solve(l, eye)
    return tri_solve(l, eye)


def spd_inverse_from_chol(l: jax.Array) -> jax.Array:
    """(L L^T)^-1 = L^-T L^-1 via `tri_inverse` (OOM-safe at large n)."""
    linv = tri_inverse(l)
    return jnp.matmul(linv.mT, linv, precision=lax.Precision.HIGHEST)


def residual_dtype(dtype) -> jnp.dtype:
    """Extended precision for fp64-work iterative-refinement residuals.

    Wilkinson's condition: IR converges in FORWARD error only when the
    residual r = b - A x is computed at (roughly) twice the working
    precision — in working precision the true residual (size ~eps*|A||x|,
    backward stability makes it small no matter how wrong x is) drowns in
    the GEMM's own accumulation rounding, and the sweep stalls at the
    Skeel limit (measured: a ~1.6x one-off gain, docs/numerics.md).

    fp32 work no longer routes through here: `cho_solve_refined` computes
    fp32 residuals in COMPENSATED fp32 (ops/compensated.py), which needs
    neither jax_enable_x64 nor an fp64 unit — the round-2 silent
    degradation when x64 was off is gone. fp64 work keeps fp64 residuals
    (no wider float exists; fp64 rarely needs IR).
    """
    del dtype
    return jnp.float64


def cho_solve_refined(l: jax.Array, a: jax.Array, b: jax.Array,
                      *, iters: int = 1) -> jax.Array:
    """cho_solve + mixed-precision iterative refinement (fp32-at-scale).

    TPU has no fp64 matmul, so at n >= 8k an fp32 factorization of an
    ill-conditioned kernel matrix (clustered inputs, small nugget) loses
    ~log10(kappa) digits in the solve. Each refinement sweep

        r = b - A x          (residual at ~TWICE working precision)
        x <- x + (L L^T)^{-1} r   (correction reuses the fp32 factor)

    multiplies the solve's forward error by O(kappa * eps_f32) — measured
    1.3e-3 -> 2.6e-6 -> 2.6e-8 at kappa~2.7e5 (docs/numerics.md). For
    fp32 work the residual is computed by the compensated-fp32 Dot2 path
    (ops/compensated.py::residual_compensated) — error-free transforms,
    ~48-bit effective precision, works with or without jax_enable_x64 on
    every backend. fp64 work keeps an fp64 residual GEMM. Either way the
    residual cost is O(n^2 k) against the O(n^3/3) factorization:
    negligible. The residual is rounded back to working precision before
    the solve — only its RELATIVE accuracy matters (classical
    mixed-precision IR). Tolerance budget: docs/numerics.md; tests:
    tests/test_fp32.py::test_refined_solve_error_bound_n4096,
    tests/test_compensated.py (incl. an x64-off subprocess run).
    """
    x = cho_solve(l, b)
    if a.dtype == jnp.float64:
        rt = residual_dtype(a.dtype)
        a_r = a.astype(rt)
        b_r = b.astype(rt)
        for _ in range(iters):
            r = (b_r - jnp.matmul(a_r, x.astype(rt),
                                  precision=lax.Precision.HIGHEST)
                 ).astype(a.dtype)
            x = x + cho_solve(l, r)
        return x
    from gp_emu_uqsa_tpu.ops.compensated import residual_compensated

    for _ in range(iters):
        r = residual_compensated(a, x, b)
        x = x + cho_solve(l, r)
    return x
