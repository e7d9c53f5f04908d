"""Checkpoint round-trips and structured logging."""
import json

import numpy as np
import jax

import gp_emu_uqsa_tpu as g
from gp_emu_uqsa_tpu.utils import (
    load_emulator, load_hmc_state, log_event, save_emulator, save_hmc_state,
    set_log_path, timed,
)


def test_emulator_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(40, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    emul = g.Emulator.from_arrays(x, y, tries=3, seed=1)
    emul.train_full()
    mean1, var1 = emul.predict(np.array([[0.3, 0.7], [0.6, 0.1]]))

    save_emulator(tmp_path / "ck", emul)
    emul2 = load_emulator(tmp_path / "ck")
    mean2, var2 = emul2.predict(np.array([[0.3, 0.7], [0.6, 0.1]]))
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2), rtol=1e-8)


def test_emulator_checkpoint_preserves_family(tmp_path):
    """Regression (ADVICE r1): a matern52 fit must NOT restore as gaussian."""
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(40, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    emul = g.Emulator.from_arrays(x, y, tries=3, seed=1, kernel="matern52")
    emul.train_full()
    xq = np.array([[0.3, 0.7], [0.6, 0.1], [0.9, 0.9]])
    mean1, var1 = emul.predict(xq)

    save_emulator(tmp_path / "ckf", emul)
    emul2 = load_emulator(tmp_path / "ckf")
    assert emul2.mle_config.family == "matern52"
    mean2, var2 = emul2.predict(xq)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2), rtol=1e-8)
    # beliefs write-back records the family too (ADVICE r1 low)
    assert emul2.updated_beliefs().kernel == "matern52()"


def test_hmc_state_roundtrip(tmp_path):
    z = np.random.default_rng(1).standard_normal((4, 3))
    key = jax.random.key(42)
    save_hmc_state(tmp_path / "hmc", z, 0.05, np.ones(3), key,
                   meta={"n_done": 100})
    z2, eps, im, key2, meta = load_hmc_state(tmp_path / "hmc")
    np.testing.assert_allclose(np.asarray(z2), z)
    assert float(eps) == 0.05 and meta["n_done"] == 100
    # restored key produces identical randomness
    a = jax.random.normal(key, (3,))
    b = jax.random.normal(key2, (3,))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_hmc_preemption_resume_stays_on_target(tmp_path):
    """SURVEY S6 'coarse resume across preemption': a chain checkpointed
    mid-run and resumed from the saved (position, step size) keeps
    sampling the same posterior — the resumed draws' moments must agree
    with an uninterrupted run's on a known Gaussian target. (The saved
    inverse mass round-trips through the checkpoint but hmc_sample has no
    injection point for it yet — the short resume warmup re-adapts the
    metric; COARSE resume by design, SURVEY S6.)"""
    import jax.numpy as jnp
    from gp_emu_uqsa_tpu.inference.hmc import HMCConfig, hmc_sample

    sd = jnp.asarray([1.0, 0.5, 2.0])

    def logdensity(z):
        return -0.5 * jnp.sum((z / sd) ** 2)

    n_chains, d = 8, 3
    z0 = jnp.zeros((n_chains, d))
    cfg = HMCConfig(n_warmup=200, n_samples=200, n_leapfrog=8)
    samples, stats = hmc_sample(jax.random.key(0), logdensity, z0, cfg)
    # "preemption": persist the end-of-run state
    save_hmc_state(tmp_path / "hmc", samples[:, -1], stats["step_size"],
                   stats["inv_mass"], jax.random.key(7))
    z_res, eps, im, key, _ = load_hmc_state(tmp_path / "hmc")
    # the adapted metric survives the round-trip intact (even though the
    # resume below re-adapts it — see docstring)
    np.testing.assert_allclose(np.asarray(im), np.asarray(stats["inv_mass"]))
    # resume: short re-adaptation around the RESTORED step size, then draw
    cfg_res = HMCConfig(n_warmup=20, n_samples=200, n_leapfrog=8,
                        init_step_size=float(eps))
    res_samples, res_stats = hmc_sample(key, logdensity, jnp.asarray(z_res),
                                        cfg_res)
    assert float(res_stats["accept_rate"]) > 0.5
    flat = np.asarray(res_samples).reshape(-1, d)
    # stationarity: per-dim sd within 15% of the target's (1600 draws)
    np.testing.assert_allclose(flat.std(axis=0), np.asarray(sd), rtol=0.15)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.25)


def test_structured_logging(tmp_path):
    log = tmp_path / "events.jsonl"
    set_log_path(log)
    log_event("fit", nll=1.23, n=100)
    with timed("predict", n_points=10):
        pass
    set_log_path(None)
    lines = [json.loads(line) for line in log.read_text().splitlines()]
    assert lines[0]["event"] == "fit" and lines[0]["nll"] == 1.23
    assert lines[1]["event"] == "predict" and "seconds" in lines[1]


def test_adaptive_timed_scales_reps():
    """utils/timing.timed: amortizes a fixed per-sync cost (the tunnel RTT
    analog) by scaling reps until device time dominates, and returns a
    per-op estimate within 2x of truth for a sub-'RTT' op."""
    import time as _time

    from gp_emu_uqsa_tpu.utils.timing import timed

    op_s = 2e-4
    rtt_s = 5e-3
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        _time.sleep(op_s)
        return object()

    def sync(_):
        _time.sleep(rtt_s)

    est = timed(fn, sync, min_total_s=0.05, max_reps=4096)
    # naive 8-rep timing would report ~ (8*op + rtt)/8 ~ 8e-4 (4x off);
    # the adaptive loop must land within ~2x
    assert 0.5 * op_s < est < 2.0 * op_s, est
    assert calls["n"] > 64  # reps actually scaled up
