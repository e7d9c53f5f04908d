"""Sanitizer layer (utils/sanitize.py): checkify diagnosis of bad fits."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.kernels import make_params
from gp_emu_uqsa_tpu.utils.sanitize import checked_fit, debug_nans


def _problem(n=30, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3 * x[:, 0]) + x[:, 1]
    h = basis_matrix(x, linear_basis(d))
    return x, y, h


def test_checked_fit_clean():
    x, y, h = _problem()
    p = make_params([0.6, 1.0], nugget=1e-6, dtype=x.dtype)
    err, state = checked_fit(p, x, y, h)
    assert err.get() is None
    ref = gp.fit(p, x, y, h)
    np.testing.assert_allclose(float(state.nll), float(ref.nll), rtol=1e-12)


def test_checked_fit_reports_nonfinite_inputs():
    x, y, h = _problem()
    xbad = x.at[3, 1].set(jnp.nan)
    p = make_params([0.6, 1.0], nugget=1e-6, dtype=x.dtype)
    err, _ = checked_fit(p, xbad, y, h)
    assert err.get() is not None and "inputs x" in err.get()


def test_checked_fit_reports_bad_kernel_matrix():
    """NaN hyperparameters poison A: the kernel-matrix stage must name
    itself (the jitter ladder can never rescue a NaN matrix), while the
    production path stays inf-not-NaN."""
    x, y, h = _problem()
    from gp_emu_uqsa_tpu.kernels import GPParams

    good = make_params([0.6, 1.0], nugget=1e-6, dtype=x.dtype)
    p = GPParams(good.log_delta.at[0].set(jnp.nan), good.log_sigma2,
                 good.log_nugget)
    err, _ = checked_fit(p, x, y, h)
    msg = err.get()
    assert msg is not None and "kernel matrix" in msg
    # production convention unchanged: inf, never NaN
    nll = gp.nll(p, x, y, h)
    assert not np.isnan(float(nll))


def test_checked_fit_reports_degenerate_nll():
    """Constant y: zero residual variance -> concentrated sigma2 = 0 ->
    the NLL stage fires with the 'is y constant?' diagnosis."""
    x, y, h = _problem()
    yc = jnp.ones_like(y) * 2.5
    p = make_params([0.6, 1.0], nugget=1e-6, dtype=x.dtype)
    err, _ = checked_fit(p, x, yc, h)
    msg = err.get()
    assert msg is not None
    assert "NLL non-finite" in msg or "sigma2" in msg


def test_checked_fit_jits():
    x, y, h = _problem()
    p = make_params([0.6, 1.0], nugget=1e-6, dtype=x.dtype)
    err, state = jax.jit(
        lambda p: checked_fit(p, x, y, h)
    )(p)
    assert err.get() is None
    assert np.isfinite(float(state.nll))


def test_debug_nans_context():
    assert not jax.config.jax_debug_nans
    with debug_nans():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jnp.log(-jnp.ones(3)) * 1.0  # NaN raises under the context
    assert not jax.config.jax_debug_nans
