"""Independent NumPy/SciPy oracle implementation of the SURVEY.md S7 math.

Deliberately written in the most direct (explicit-inverse) style so it is an
*independent* check on the Cholesky-based JAX implementation, standing in for
the unavailable reference code (SURVEY.md S0). fp64 throughout.
"""
from __future__ import annotations

import numpy as np


def corr(x1, x2, delta):
    d2 = ((x1[:, None, :] - x2[None, :, :]) / delta) ** 2
    return np.exp(-d2.sum(-1))


def corr_self(x, delta, nugget):
    return corr(x, x, delta) + nugget * np.eye(len(x))


def corr_family(x1, x2, delta, family):
    d2 = (((x1[:, None, :] - x2[None, :, :]) / delta) ** 2).sum(-1)
    r = np.sqrt(d2)
    if family == "gaussian":
        return np.exp(-d2)
    if family == "matern52":
        s = np.sqrt(5.0) * r
        return (1.0 + s + s * s / 3.0) * np.exp(-s)
    if family == "matern32":
        s = np.sqrt(3.0) * r
        return (1.0 + s) * np.exp(-s)
    if family == "exponential":
        return np.exp(-r)
    raise ValueError(family)


def gls(a, h, y):
    ainv = np.linalg.inv(a)
    g = h.T @ ainv @ h
    beta = np.linalg.solve(g, h.T @ ainv @ y)
    return ainv, g, beta


def nll_mucm(x, y, h, delta, nugget):
    n, q = h.shape
    a = corr_self(x, delta, nugget)
    ainv, g, beta = gls(a, h, y)
    resid = y @ ainv @ y - (h.T @ ainv @ y) @ np.linalg.solve(g, h.T @ ainv @ y)
    sigma2 = resid / (n - q - 2)
    sign_a, logdet_a = np.linalg.slogdet(a)
    sign_g, logdet_g = np.linalg.slogdet(g)
    assert sign_a > 0 and sign_g > 0
    return 0.5 * (n - q) * np.log(sigma2) + 0.5 * logdet_a + 0.5 * logdet_g, sigma2, beta


def nll_gp4ml(x, y, h, delta, sigma2, nugget):
    n = len(y)
    a = corr_self(x, delta, nugget)
    ainv, g, beta = gls(a, h, y)
    r = y - h @ beta
    resid = r @ ainv @ r
    _, logdet_a = np.linalg.slogdet(a)
    return 0.5 * (resid / sigma2 + n * np.log(sigma2) + logdet_a + n * np.log(2 * np.pi))


def posterior(x, y, h, xs, hs, delta, nugget, sigma2=None, include_nugget=False):
    """Universal-kriging mean and full covariance; sigma2=None => MUCM profile."""
    n, q = h.shape
    a = corr_self(x, delta, nugget)
    ainv, g, beta = gls(a, h, y)
    if sigma2 is None:
        resid = y @ ainv @ y - (h.T @ ainv @ y) @ np.linalg.solve(g, h.T @ ainv @ y)
        sigma2 = resid / (n - q - 2)
    t = corr(xs, x, delta)                      # (m, n)
    e = ainv @ (y - h @ beta)
    mean = hs @ beta + t @ e
    r = hs - t @ ainv @ h                       # (m, q)
    css = corr(xs, xs, delta)
    if include_nugget:
        css = css + nugget * np.eye(len(xs))
    cov = sigma2 * (css - t @ ainv @ t.T + r @ np.linalg.solve(g, r.T))
    return mean, cov, beta, sigma2


# ---------------------------------------------------------------------------
# UQSA oracle: literal MUCM closed-form integrals, explicit O(d n^2) loops
# (VERDICT r4 next-step #8 — the sensitivity subsystem previously had no
# independent numeric oracle). Inputs x_l ~ N(m_l, v_l) independent,
# gaussian kernel c(x,x') = exp(-sum_l (x_l-x'_l)^2/delta_l^2), mean basis
# given as h_cols: a list with None for the constant column and an int
# input-dim for each linear column. Everything fp64, explicit inverses.
#
# Per-dim 1-D Gaussian integrals (products over dims; MUCM formula set):
#   I0_l(x_j)      = E_X[c_l(x_j, X)]
#                  = (1+2 v/d2)^(-1/2) exp(-(x_jl-m)^2/(d2+2v))
#   Q_l(x_j, x_k)  = E_X[c_l(x_j, X) c_l(x_k, X)]
#                  = (1+4 v/d2)^(-1/2) exp(-(x_jl-x_kl)^2/(2 d2)
#                                          - ((x_jl+x_kl)/2-m)^2/(d2/2+2v))
#   E_X[X c_l(x_j, X)] = mu1_l(x_j) I0_l(x_j),
#                        mu1_l = (m d2 + 2 v x_jl)/(d2 + 2 v)
#   E_{X,X'}[c_l(X, X')] = (1+4 v/d2)^(-1/2)            (the U0 factor)
# ---------------------------------------------------------------------------


def _uqsa_pre(x, y, h_cols, delta, nugget, m, v):
    """Shared trained-GP functionals + per-dim integral tables."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    m = np.asarray(m, float)
    v = np.asarray(v, float)
    n, d = x.shape
    q = len(h_cols)
    h = np.ones((n, q))
    for ci, c in enumerate(h_cols):
        if c is not None:
            h[:, ci] = x[:, c]
    a = corr_self(x, delta, nugget)
    ainv, g, beta = gls(a, h, y)
    resid = y @ ainv @ y - (h.T @ ainv @ y) @ np.linalg.solve(g, h.T @ ainv @ y)
    sigma2 = resid / (n - q - 2)
    e = ainv @ (y - h @ beta)
    ginv = np.linalg.inv(g)
    p = ainv @ h                                     # A^-1 H
    d2 = np.asarray(delta, float) ** 2
    i0 = np.zeros((n, d))
    for j in range(n):
        for l in range(d):
            i0[j, l] = (1.0 + 2.0 * v[l] / d2[l]) ** -0.5 * np.exp(
                -(x[j, l] - m[l]) ** 2 / (d2[l] + 2.0 * v[l])
            )
    t_vec = np.prod(i0, axis=1)
    s2 = np.array([(1.0 + 4.0 * v[l] / d2[l]) ** -0.5 for l in range(d)])
    rbar = np.array([1.0 if c is None else m[c] for c in h_cols])
    return dict(x=x, n=n, d=d, q=q, m=m, v=v, d2=d2, beta=beta, e=e,
                sigma2=sigma2, ainv=ainv, ginv=ginv, p=p, i0=i0,
                t_vec=t_vec, s2=s2, rbar=rbar, h_cols=list(h_cols))


def uqsa_uncertainty(x, y, h_cols, delta, nugget, m, v):
    """(E*[E Y], V*[E Y]) by the direct formulas."""
    pre = _uqsa_pre(x, y, h_cols, delta, nugget, m, v)
    m0 = pre["rbar"] @ pre["beta"] + pre["t_vec"] @ pre["e"]
    u0 = np.prod(pre["s2"])
    rt0 = pre["rbar"] - pre["t_vec"] @ pre["p"]
    v0 = pre["sigma2"] * (
        u0 - pre["t_vec"] @ pre["ainv"] @ pre["t_vec"]
        + rt0 @ pre["ginv"] @ rt0
    )
    return m0, v0


def uqsa_sensitivity_variance(x, y, h_cols, delta, nugget, m, v, w):
    """E*(V_w) = E*[Var(E[Y | x_w])] by the literal U/S/Q integral set.

    Identity used (posterior expectation of the law-of-total-variance
    pieces): E*(V_w) = E_{x_w}[m_w^2 + v_w] - (M_0^2 + v*_0), where
    m_w/v_w are the posterior mean/variance of E[Y|x_w] and M_0/v*_0 of
    E[Y]. Every x-expectation is a product of the 1-D integrals above.
    """
    pre = _uqsa_pre(x, y, h_cols, delta, nugget, m, v)
    n, d, q = pre["n"], pre["d"], pre["q"]
    xx, d2, mm, vv = pre["x"], pre["d2"], pre["m"], pre["v"]
    i0, t_vec = pre["i0"], pre["t_vec"]
    w = set(int(i) for i in w)

    # U_w[j,k] = E[ t_j(x) t_k(x') | x_w = x'_w jointly integrated ]
    u_mat = np.ones((n, n))
    for j in range(n):
        for k in range(n):
            for l in range(d):
                if l in w:
                    u_mat[j, k] *= (1.0 + 4.0 * vv[l] / d2[l]) ** -0.5 * np.exp(
                        -(xx[j, l] - xx[k, l]) ** 2 / (2.0 * d2[l])
                        - ((xx[j, l] + xx[k, l]) / 2.0 - mm[l]) ** 2
                        / (d2[l] / 2.0 + 2.0 * vv[l])
                    )
                else:
                    u_mat[j, k] *= i0[j, l] * i0[k, l]

    # S_w[c, j] = E[ h_c(x) t_j(x) ] with x_w shared between h and t
    s_mat = np.zeros((q, n))
    for ci, c in enumerate(pre["h_cols"]):
        for j in range(n):
            if c is None:
                s_mat[ci, j] = t_vec[j]
            elif c in w:
                mu1 = (mm[c] * d2[c] + 2.0 * vv[c] * xx[j, c]) / (
                    d2[c] + 2.0 * vv[c]
                )
                s_mat[ci, j] = mu1 * t_vec[j]
            else:
                s_mat[ci, j] = mm[c] * t_vec[j]

    # Q_w[c, c'] = E[ h_c(x) h_c'(x') ] with x_w shared
    q_mat = np.outer(pre["rbar"], pre["rbar"])
    for ci, c in enumerate(pre["h_cols"]):
        if c is not None and c in w:
            q_mat[ci, ci] += vv[c]

    cbar_w = np.prod([pre["s2"][l] for l in range(d) if l not in w]) \
        if len(w) < d else 1.0

    beta, e = pre["beta"], pre["e"]
    e_m2 = beta @ q_mat @ beta + 2.0 * beta @ (s_mat @ e) + e @ u_mat @ e
    inner = (q_mat - s_mat @ pre["p"] - pre["p"].T @ s_mat.T
             + pre["p"].T @ u_mat @ pre["p"])
    e_v = pre["sigma2"] * (
        cbar_w - np.trace(pre["ainv"] @ u_mat)
        + np.trace(pre["ginv"] @ inner)
    )
    m0, v0 = uqsa_uncertainty(x, y, h_cols, delta, nugget, m, v)
    return (e_m2 + e_v) - (m0 * m0 + v0)


def uqsa_effect_curve(x, y, h_cols, delta, nugget, m, v, w, grid):
    """Posterior (mean, var) of E[Y | x_w] at grid rows (G, |w|)."""
    pre = _uqsa_pre(x, y, h_cols, delta, nugget, m, v)
    n, d = pre["n"], pre["d"]
    xx, d2 = pre["x"], pre["d2"]
    w = [int(i) for i in w]
    grid = np.atleast_2d(np.asarray(grid, float))
    means = np.zeros(len(grid))
    variances = np.zeros(len(grid))
    cbar_w = np.prod([pre["s2"][l] for l in range(d) if l not in w]) \
        if len(w) < d else 1.0
    for gi, gpt in enumerate(grid):
        t_w = np.ones(n)
        for j in range(n):
            for l in range(d):
                if l in w:
                    gl = gpt[w.index(l)]
                    t_w[j] *= np.exp(-(gl - xx[j, l]) ** 2 / d2[l])
                else:
                    t_w[j] *= pre["i0"][j, l]
        r_w = np.zeros(pre["q"])
        for ci, c in enumerate(pre["h_cols"]):
            if c is None:
                r_w[ci] = 1.0
            elif c in w:
                r_w[ci] = gpt[w.index(c)]
            else:
                r_w[ci] = pre["m"][c]
        means[gi] = r_w @ pre["beta"] + t_w @ pre["e"]
        rt = r_w - t_w @ pre["p"]
        variances[gi] = pre["sigma2"] * (
            cbar_w - t_w @ pre["ainv"] @ t_w + rt @ pre["ginv"] @ rt
        )
    return means, variances
