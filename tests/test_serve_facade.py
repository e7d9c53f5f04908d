"""Facade dispatch to the fused Pallas serving tier (VERDICT r4 next-step #1).

`Emulator.predict` must be able to reach the engine's fastest correct
serving path (ops/serve.py fused mean+variance kernels) — previously only
reachable by importing ops.serve directly. These tests pin:
  * serve="pallas" (interpret mode on CPU) == serve="xla" numerically;
  * the auto gate: off-TPU / non-gaussian / wide-d stays on the XLA path;
  * the GP_EMU_DISABLE_PALLAS_SERVE escape hatch wins over serve="pallas"
    auto-dispatch gating.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gp_emu_uqsa_tpu.emulator import Emulator


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(96, 3))
    y = np.sin(3.0 * x[:, 0]) + x[:, 1] * x[:, 2]
    emul = Emulator.from_arrays(x, y, tries=2, tv_config=(4, 0, 1),
                                dtype=jnp.float32, seed=0)
    emul.optimize()
    return emul


def test_facade_pallas_serve_matches_xla(trained):
    rng = np.random.default_rng(1)
    xq = rng.uniform(size=(40, 3))
    m_x, v_x = trained.predict(xq, serve="xla")
    m_p, v_p = trained.predict(xq, serve="pallas", quad_precision="highest")
    s2 = float(trained.state.sigma2)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x),
                               rtol=1e-4, atol=1e-4 * max(1.0, s2))
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x),
                               rtol=2e-3, atol=1e-4 * s2)


def test_facade_pallas_serve_include_nugget(trained):
    rng = np.random.default_rng(2)
    xq = rng.uniform(size=(16, 3))
    _, v_x = trained.predict(xq, serve="xla", include_nugget=True)
    _, v_p = trained.predict(xq, serve="pallas", include_nugget=True,
                             quad_precision="highest")
    s2 = float(trained.state.sigma2)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x),
                               rtol=2e-3, atol=1e-4 * s2)


def test_auto_gate_off_tpu(trained):
    # CPU backend: auto must NOT pick the Pallas path (no TPU lowering)
    assert not trained._use_pallas_serve("auto", m=4096, d=3)
    # forced: yes (interpret-mode hook used by the equivalence test above)
    assert trained._use_pallas_serve("pallas", m=16, d=3)
    assert not trained._use_pallas_serve("xla", m=1 << 20, d=3)


def test_gate_rejects_wide_d_and_non_gaussian(trained):
    # lane-packed layout bound: packed_width(d) > 128 must fall back
    assert not trained._use_pallas_serve("pallas", m=1 << 20, d=64)
    import dataclasses

    matern = dataclasses.replace(trained.mle_config, family="matern52")
    other = dataclasses.replace(trained, mle_config=matern)
    assert not other._use_pallas_serve("pallas", m=1 << 20, d=3)


def test_escape_hatch_env(trained, monkeypatch):
    monkeypatch.setenv("GP_EMU_DISABLE_PALLAS_SERVE", "1")
    assert not trained._use_pallas_serve("pallas", m=1 << 20, d=3)
