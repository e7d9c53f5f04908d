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
