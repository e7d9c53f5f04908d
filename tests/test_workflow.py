"""End-to-end reference workflow: config/beliefs files -> setup -> train.

Covers SURVEY.md S4.1/S4.2 call stacks and the file-compat surface (S6
"Config / flag system"), using the shipped toy-sim example as the
acceptance fixture (the reference's examples-as-tests strategy, S5).
"""
import shutil
from pathlib import Path

import numpy as np
import pytest

import gp_emu_uqsa_tpu as g
from gp_emu_uqsa_tpu.configs import Beliefs, Config
from gp_emu_uqsa_tpu.dataio import make_splits

EXAMPLES = Path(__file__).parent.parent / "examples"


@pytest.fixture
def toy_dir(tmp_path):
    """Copy the toy-sim example into a writable tmp dir."""
    src = EXAMPLES / "toy-sim"
    for f in src.iterdir():
        if f.is_file():
            shutil.copy(f, tmp_path / f.name)
    return tmp_path


class TestConfigFiles:
    def test_config_roundtrip(self, toy_dir):
        cfg = Config.from_file(toy_dir / "toy-sim_config")
        assert cfg.tries == 5
        assert cfg.tv_config == (10, 0, 2)
        assert cfg.delta_bounds is None
        cfg.to_file(toy_dir / "rt_config")
        cfg2 = Config.from_file(toy_dir / "rt_config")
        assert cfg2.tries == cfg.tries and cfg2.tv_config == cfg.tv_config

    def test_beliefs_roundtrip(self, toy_dir):
        bel = Beliefs.from_file(toy_dir / "toy-sim_beliefs")
        assert bel.mucm and bel.fix_nugget and bel.active is None
        bel.delta = [0.123456]
        bel.to_file(toy_dir / "rt_beliefs")
        bel2 = Beliefs.from_file(toy_dir / "rt_beliefs")
        assert bel2.delta == pytest.approx([0.123456])
        assert bel2.kernel.startswith("gaussian")

    def test_unknown_kernel_rejected(self, tmp_path):
        p = tmp_path / "b"
        p.write_text("kernel matern()\n")  # ambiguous: must name 52/32
        with pytest.raises(ValueError, match="unsupported kernel"):
            Beliefs.from_file(p)

    def test_kernel_family_aliases(self, tmp_path):
        p = tmp_path / "b2"
        p.write_text("kernel matern_5_2()\n")
        assert Beliefs.from_file(p).kernel_family() == "matern52"

    def test_bounds_parsing(self, tmp_path):
        p = tmp_path / "c"
        p.write_text(
            "beliefs b\ninputs i\noutputs o\n"
            "delta_bounds [(0.01, 2.0), (0.05, 3.0)]\n"
            "sigma_bounds [(0.1, 10.0)]\ntries 3\n"
        )
        cfg = Config.from_file(p)
        assert cfg.delta_bounds == [(0.01, 2.0), (0.05, 3.0)]
        assert cfg.sigma_bounds == [(0.1, 10.0)]


class TestSplits:
    def test_tv_semantics(self):
        x = np.arange(40, dtype=float)[:, None]
        y = np.arange(40, dtype=float)
        sp = make_splits(x, y, (10, 0, 2), shuffle=False, scale_inputs=False)
        assert sp.n_v_sets == 2
        assert len(sp.train_rows(0)) == 32
        assert len(sp.v_rows(0)) == 4 and len(sp.v_rows(1)) == 4
        assert len(sp.train_rows(1)) == 36
        assert len(sp.train_rows(2)) == 40
        # no overlap, full coverage
        all_rows = np.concatenate([sp.train_rows(0), sp.v_rows(0), sp.v_rows(1)])
        assert sorted(all_rows.tolist()) == list(range(40))

    def test_scaling_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-5, 7, size=(30, 3))
        sp = make_splits(x, np.zeros(30), (5, 0, 1), shuffle=False, scale_inputs=True)
        assert sp.x_all.min() >= 0 and sp.x_all.max() <= 1
        mm = np.asarray(sp.minmax)
        np.testing.assert_allclose(mm[:, 0], x.min(0))
        np.testing.assert_allclose(mm[:, 1], x.max(0))

    def test_shuffle_preserves_pairs(self):
        x = np.arange(20, dtype=float)[:, None]
        y = 2 * np.arange(20, dtype=float)
        sp = make_splits(x, y, (5, 0, 1), shuffle=True, scale_inputs=False, seed=3)
        np.testing.assert_allclose(sp.y_all, 2 * sp.x_all[:, 0])


class TestEndToEnd:
    def test_setup_train_predict(self, toy_dir):
        emul = g.setup(toy_dir / "toy-sim_config")
        g.train(emul, auto=True, message=False)
        # trained emulator should reproduce the simulator closely
        import sys
        sys.path.insert(0, str(toy_dir))
        xg = np.linspace(0.05, 1.95, 60)[:, None]
        truth = 3.0 * xg[:, 0] * np.sin(5.0 * np.pi * xg[:, 0] / 2.0)
        mean, var = emul.predict(xg)
        rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
        assert rmse < 0.05, f"toy-sim emulator RMSE too high: {rmse}"
        # final_build wrote the checkpoint files
        assert (toy_dir / "toy-sim_beliefs-f").exists()
        assert (toy_dir / "toy-sim_input-f").exists()
        assert (toy_dir / "toy-sim_output-f").exists()
        bel = Beliefs.from_file(toy_dir / "toy-sim_beliefs-f")
        assert len(bel.delta) == 1 and bel.delta[0] > 0
        assert bel.input_minmax is not None

    def test_resume_from_written_beliefs(self, toy_dir):
        """The written-back beliefs file reproduces the trained emulator."""
        emul = g.setup(toy_dir / "toy-sim_config")
        g.final_build(emul)
        mean1, _ = emul.predict(np.array([[0.77], [1.3]]))
        # resume: new config pointing at the written-back files
        cfg = Config.from_file(toy_dir / "toy-sim_config")
        cfg.beliefs = str(toy_dir / "toy-sim_beliefs-f")
        cfg.inputs = str(toy_dir / "toy-sim_input-f")
        cfg.outputs = str(toy_dir / "toy-sim_output-f")
        cfg.to_file(toy_dir / "resume_config")
        emul2 = g.setup(toy_dir / "resume_config", datashuffle=False, scaleinputs=False)
        # rebuild posterior at the checkpointed hyperparameters (no re-opt)
        import jax.numpy as jnp
        from gp_emu_uqsa_tpu.kernels import make_params
        from gp_emu_uqsa_tpu import gp as gpmod
        bel = Beliefs.from_file(cfg.beliefs)
        emul2.params = make_params(bel.delta, nugget=max(bel.nugget, 1e-10),
                                   dtype=jnp.float64)
        x, y, h = emul2.train_view()
        emul2.state = gpmod.fit(emul2.params, x, y, h)
        mean2, _ = emul2.predict(np.array([[0.77], [1.3]]))
        np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2), rtol=1e-5)

    def test_predict_uses_cached_jitted_serving(self, toy_dir):
        """VERDICT r3 weak #7: the facade predict must reuse one jitted
        Predictor per fit state (no per-call TRSM retracing), match the
        exact factor path, and invalidate when the state changes."""
        emul = g.setup(toy_dir / "toy-sim_config")
        g.final_build(emul)
        xg = np.linspace(0.1, 1.9, 23)[:, None]
        mean_fast, var_fast = emul.predict(xg)
        assert emul._serve_cache is not None
        cache_before = emul._serve_cache
        emul.predict(xg)
        assert emul._serve_cache is cache_before       # cache reused
        # matches the exact full-cov path on the diagonal
        from gp_emu_uqsa_tpu import gp as gpmod
        x, y, h = emul.train_view()
        xs, hs = emul._prepare_inputs(xg)
        mean_ex, cov_ex = gpmod.predict(emul.state, x, h, xs, hs,
                                        full_cov=True)
        np.testing.assert_allclose(np.asarray(mean_fast),
                                   np.asarray(mean_ex), rtol=1e-6, atol=1e-8)
        # variance agreement between the A^-1 quadratic and the factor
        # path is bounded by kappa(A)*eps, and MLE fits can drive the
        # nugget to ~1e-10 (kappa ~ 1e10 even in fp64): scale the floor
        # by sigma2, the natural size of the variance
        np.testing.assert_allclose(np.asarray(var_fast),
                                   np.asarray(np.diagonal(np.asarray(cov_ex))),
                                   rtol=1e-4,
                                   atol=1e-5 * float(emul.state.sigma2))
        # refit invalidates the cache
        emul.optimize()
        emul.predict(xg)
        assert emul._serve_cache is not cache_before

    def test_plot_smoke(self, toy_dir, tmp_path):
        emul = g.setup(toy_dir / "toy-sim_config")
        g.final_build(emul)
        fig = g.plot(emul, [0], mean_or_var="mean", points=30,
                     save=str(tmp_path / "p.png"))
        assert (tmp_path / "p.png").exists()


class TestBayesFacade:
    def test_train_bayes_predict_bayes(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(40, 2))
        y = np.sin(4 * x[:, 0]) + x[:, 1]
        emul = g.Emulator.from_arrays(x, y, tries=3, seed=2)
        stats = emul.train_bayes(sampler="hmc", n_chains=4, n_warmup=100,
                                 n_samples=100)
        assert float(stats["accept_rate"]) > 0.4
        mean, var = emul.predict_bayes(np.array([[0.3, 0.6], [0.8, 0.2]]),
                                       max_draws=8)
        truth = np.sin(4 * np.array([0.3, 0.8])) + np.array([0.6, 0.2])
        assert np.all(np.abs(np.asarray(mean) - truth) < 0.3)
        assert np.all(np.asarray(var) >= 0)

    def test_predict_batched_matches(self):
        import jax.numpy as jnp
        from gp_emu_uqsa_tpu import gp as gpmod
        from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
        from gp_emu_uqsa_tpu.kernels import make_params

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(30, 2)))
        y = jnp.sin(3 * x[:, 0]) + x[:, 1]
        spec = linear_basis(2)
        h = basis_matrix(x, spec)
        st = gpmod.fit(make_params([0.5, 0.7], nugget=1e-6, dtype=jnp.float64),
                       x, y, h)
        pred = gpmod.predictor(st)
        xs = jnp.asarray(rng.uniform(size=(157, 2)))
        hs = basis_matrix(xs, spec)
        m1, v1 = gpmod.predict_fast(pred, x, xs, hs)
        m2, v2 = gpmod.predict_batched(pred, x, xs, hs, batch=32)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-3, atol=1e-12)

    def test_predict_batched_threads_family(self):
        """Regression (ADVICE r1): batched serving of a matern52 fit must use
        matern52 cross-correlations, not silently fall back to gaussian."""
        import jax.numpy as jnp
        from gp_emu_uqsa_tpu import gp as gpmod
        from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
        from gp_emu_uqsa_tpu.kernels import make_params

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(size=(30, 2)))
        y = jnp.sin(3 * x[:, 0]) + x[:, 1]
        spec = linear_basis(2)
        h = basis_matrix(x, spec)
        fam = "matern52"
        st = gpmod.fit(make_params([0.5, 0.7], nugget=1e-6, dtype=jnp.float64),
                       x, y, h, family=fam)
        pred = gpmod.predictor(st)
        xs = jnp.asarray(rng.uniform(size=(100, 2)))
        hs = basis_matrix(xs, spec)
        m1, v1 = gpmod.predict_fast(pred, x, xs, hs, family=fam)
        m2, v2 = gpmod.predict_batched(pred, x, xs, hs, batch=32, family=fam)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-3,
                                   atol=1e-12)
        # and it must DIFFER from the gaussian-family result
        mg, _ = gpmod.predict_batched(pred, x, xs, hs, batch=32)
        assert not np.allclose(np.asarray(m2), np.asarray(mg))


class TestActiveAndInteractive:
    def test_active_subset_and_output_column(self, tmp_path):
        """active-dim subset + multi-column output selection via beliefs."""
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(60, 4))
        y0 = np.sin(4 * x[:, 1]) + x[:, 3]          # depends on dims 1, 3
        y1 = np.cos(2 * x[:, 0])
        np.savetxt(tmp_path / "in", x)
        np.savetxt(tmp_path / "out", np.c_[y1, y0])
        (tmp_path / "bel").write_text(
            "active 1 3\noutput 1\nbasis_str 1.0 x x\nbasis_inf NA 0 1\n"
            "mucm T\nkernel gaussian()\ndelta 1.0 1.0\nsigma 1.0\n"
            "nugget 0.0\nfix_nugget T\n"
        )
        (tmp_path / "conf").write_text(
            "beliefs bel\ninputs in\noutputs out\ntv_config 6 0 1\ntries 3\n"
        )
        emul = g.setup(tmp_path / "conf")
        g.final_build(emul)
        # predict on raw 4-col inputs; only active dims should matter
        xt = rng.uniform(size=(30, 4))
        mean, _ = emul.predict(xt)
        truth = np.sin(4 * xt[:, 1]) + xt[:, 3]
        rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
        assert rmse < 0.05, rmse

    def test_interactive_train_decline(self, toy_dir, monkeypatch):
        """auto=False asks before folding; 'n' stops the V loop."""
        emul = g.setup(toy_dir / "toy-sim_config")
        answers = iter(["n"])
        monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))
        g.train(emul, auto=False)
        # declined the first fold => final build still ran on all data
        assert emul.state is not None
        assert emul.n_folded == emul.splits.n_v_sets  # final_build folds all


