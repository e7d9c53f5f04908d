"""Multi-output batched emulation vs per-output fits."""
import numpy as np
import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.multi import MultiEmulator
from gp_emu_uqsa_tpu import gp
import gp_emu_uqsa_tpu.sensitivity as s


def _data(n=50, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, 2))
    y = np.stack(
        [
            np.sin(4 * x[:, 0]) + 0.2 * x[:, 1],
            x[:, 0] * 0.1 + 2.0 * np.cos(3 * x[:, 1]),
            x[:, 0] + x[:, 1],
        ],
        axis=1,
    )
    return x, y


def test_matches_per_output_mle():
    x, y = _data()
    me = MultiEmulator.fit(jax.random.key(0), x, y, tries=4, nugget=1e-6)
    assert me.n_outputs == 3
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    for k in range(3):
        _, info = mle_fit(jax.random.key(0), x, y[:, k], h,
                          MLEConfig(tries=4, nugget=1e-6))
        batched_best = float(jnp.min(jnp.where(
            jnp.isfinite(me.info["nlls"][k]), me.info["nlls"][k], jnp.inf)))
        assert batched_best <= float(info["best_nll"]) + 0.5


def test_batched_predictions_accurate():
    x, y = _data()
    me = MultiEmulator.fit(jax.random.key(1), x, y, tries=4, nugget=1e-6)
    rng = np.random.default_rng(5)
    xs = rng.uniform(size=(40, 2))
    means, variances = me.predict(xs)
    assert means.shape == (3, 40) and variances.shape == (3, 40)
    truth = np.stack(
        [
            np.sin(4 * xs[:, 0]) + 0.2 * xs[:, 1],
            xs[:, 0] * 0.1 + 2.0 * np.cos(3 * xs[:, 1]),
            xs[:, 0] + xs[:, 1],
        ]
    )
    rmse = np.sqrt(np.mean((np.asarray(means) - truth) ** 2, axis=1))
    assert np.all(rmse < 0.05), rmse


def test_sense_matrix_and_table(tmp_path):
    x, y = _data()
    me = MultiEmulator.fit(jax.random.key(2), x, y, tries=3, nugget=1e-6)
    m = np.array([0.5, 0.5])
    v = np.array([0.03, 0.03])
    sm = me.sense_matrix(m, v)
    assert sm.shape == (3, 2)
    # output 0 driven by x0; output 1 by x1
    assert sm[0, 0] > 0.7 and sm[1, 1] > 0.7
    fig = s.sense_table(me.sensitivities(m, v), ["x0", "x1"],
                        ["y0", "y1", "y2"], save=str(tmp_path / "t.png"))
    assert (tmp_path / "t.png").exists()
