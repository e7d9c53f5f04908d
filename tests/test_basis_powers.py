"""User-specifiable mean-basis functions beyond constant+linear.

VERDICT r4 next-step #9 / SURVEY.md S3 Mean-basis row ("constant + linear
terms, user-specifiable functions"): a beliefs file with e.g. a quadratic
term must load, train, and predict; the analytic UQSA path keeps its
<=-linear guard (MUCM requirement, SURVEY.md S7) and must raise cleanly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gp_emu_uqsa_tpu as g
from gp_emu_uqsa_tpu.basis import (
    BasisSpec, basis_matrix, basis_strings, linear_basis, parse_basis_strings,
)
from gp_emu_uqsa_tpu.emulator import Emulator


class TestParsing:
    def test_power_tokens(self):
        spec = parse_basis_strings(["1.0", "x", "x**2"], ["NA", "0", "0"])
        assert spec.include_const
        assert spec.linear_dims == (0,)
        assert spec.power_terms == ((0, 2),)

    def test_caret_and_indexed_forms(self):
        spec = parse_basis_strings(["x^3", "x[1]**2"], ["0", "1"])
        assert spec.power_terms == ((0, 3), (1, 2))
        assert not spec.include_const

    def test_power_one_is_linear(self):
        spec = parse_basis_strings(["x**1"], ["2"])
        assert spec.linear_dims == (2,)
        assert spec.power_terms == ()

    def test_garbage_still_rejected(self):
        with pytest.raises(ValueError, match="unsupported basis function"):
            parse_basis_strings(["sin(x)"], ["0"])
        with pytest.raises(ValueError, match="unsupported basis function"):
            parse_basis_strings(["x**q"], ["0"])

    def test_roundtrip_strings(self):
        spec = BasisSpec(True, (0, 2), ((1, 2), (0, 3)))
        strs, infs = basis_strings(spec)
        assert parse_basis_strings(strs, infs) == spec

    def test_q_and_is_linear(self):
        spec = BasisSpec(True, (0,), ((1, 2),))
        assert spec.q == 3
        assert not spec.is_linear
        assert linear_basis(3).is_linear


class TestMatrix:
    def test_basis_matrix_power_columns(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(7, 3)))
        spec = BasisSpec(True, (0, 1), ((2, 2), (0, 3)))
        h = np.asarray(basis_matrix(x, spec))
        xn = np.asarray(x)
        assert h.shape == (7, 5)
        np.testing.assert_allclose(h[:, 0], 1.0)
        np.testing.assert_allclose(h[:, 1], xn[:, 0])
        np.testing.assert_allclose(h[:, 2], xn[:, 1])
        np.testing.assert_allclose(h[:, 3], xn[:, 2] ** 2)
        np.testing.assert_allclose(h[:, 4], xn[:, 0] ** 3)


class TestEndToEnd:
    def _quad_emulator(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(size=(60, 1))
        y = 2.0 + 3.0 * x[:, 0] + 4.0 * x[:, 0] ** 2
        spec = BasisSpec(True, (0,), ((0, 2),))
        emul = Emulator.from_arrays(
            x, y, basis=spec, tries=2, tv_config=(4, 0, 1),
            scale_inputs=False, nugget=1e-8)
        emul.optimize()
        return emul

    def test_quadratic_basis_trains_and_extrapolates(self):
        emul = self._quad_emulator()
        # in-range prediction interpolates
        xq = np.linspace(0.05, 0.95, 9)[:, None]
        mean, _ = emul.predict(xq)
        truth = 2.0 + 3.0 * xq[:, 0] + 4.0 * xq[:, 0] ** 2
        np.testing.assert_allclose(np.asarray(mean), truth, atol=1e-3)
        # GLS beta recovers the polynomial coefficients (data IS the basis)
        np.testing.assert_allclose(
            np.asarray(emul.state.beta), [2.0, 3.0, 4.0], atol=1e-2)
        # extrapolation reverts to h(x)beta: only a quadratic basis gets
        # the far point right
        far = np.asarray([[2.0]])
        mean_far, _ = emul.predict(far)
        np.testing.assert_allclose(float(mean_far[0]), 2 + 6 + 16, rtol=0.02)

    def test_beliefs_file_with_quadratic_term(self, tmp_path):
        rng = np.random.default_rng(4)
        x = rng.uniform(size=(40, 2))
        y = 1.0 + x[:, 0] + 0.5 * x[:, 1] ** 2 + 0.05 * np.sin(6 * x[:, 0])
        np.savetxt(tmp_path / "inputs", x)
        np.savetxt(tmp_path / "outputs", y)
        (tmp_path / "beliefs").write_text(
            "active all\noutput 0\n"
            "basis_str 1.0 x x x**2\nbasis_inf NA 0 1 1\n"
            "beta 1.0 1.0 1.0 1.0\nfix_mean F\nmucm T\n"
            "kernel gaussian()\ndelta 1.0\nsigma 1.0\n"
            "nugget 0.000001\nfix_nugget T\n")
        (tmp_path / "config").write_text(
            f"beliefs {tmp_path}/beliefs\ninputs {tmp_path}/inputs\n"
            f"outputs {tmp_path}/outputs\ntv_config 4 0 1\n"
            "delta_bounds [ ]\nsigma_bounds [ ]\ntries 2\n"
            "constraints bounds\n")
        emul = g.setup(tmp_path / "config", datashuffle=False)
        assert emul.spec.power_terms == ((1, 2),)
        g.train(emul, auto=True)
        xq = rng.uniform(size=(12, 2))
        mean, var = emul.predict(xq)
        truth = 1.0 + xq[:, 0] + 0.5 * xq[:, 1] ** 2 + 0.05 * np.sin(6 * xq[:, 0])
        assert float(np.max(np.abs(np.asarray(mean) - truth))) < 0.05
        # write-back carries the quadratic term; resume round-trips
        bel2 = g.Beliefs.from_file(tmp_path / "beliefs-f")
        spec2 = parse_basis_strings(bel2.basis_str, bel2.basis_inf)
        assert spec2.power_terms == ((1, 2),)

    def test_sensitivity_rejects_power_terms(self):
        import gp_emu_uqsa_tpu.sensitivity as s

        emul = self._quad_emulator()
        with pytest.raises(ValueError, match="at most linear"):
            s.setup(emul, m=[0.5], v=[0.02])

    def test_checkpoint_roundtrip_power_terms(self, tmp_path):
        from gp_emu_uqsa_tpu.utils.checkpoint import (
            load_emulator, save_emulator,
        )

        emul = self._quad_emulator()
        save_emulator(tmp_path / "ck", emul)
        emul2 = load_emulator(tmp_path / "ck")
        assert emul2.spec == emul.spec
        xq = np.asarray([[0.3], [0.7]])
        m1, v1 = emul.predict(xq)
        m2, v2 = emul2.predict(xq)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)


class TestValidation:
    def test_basis_matrix_rejects_out_of_range_dim(self):
        # jnp indexing clamps and x[:, d:d+1] yields an EMPTY column, so
        # without the eager check a beliefs file with a bad basis_inf
        # index would silently train the wrong mean (code-review r5 #4)
        x = jnp.ones((5, 3))
        with pytest.raises(ValueError, match="input dim"):
            basis_matrix(x, BasisSpec(True, (), ((5, 2),)))
        with pytest.raises(ValueError, match="input dim"):
            basis_matrix(x, BasisSpec(True, (0, 7), ()))

    def test_integer_query_inputs_predict_correctly(self):
        # integer query arrays used to truncate the min-max lo/span to
        # ints inside _prepare_inputs (code-review r5 #1)
        rng = np.random.default_rng(5)
        x = rng.uniform(0.3, 3.7, size=(50, 2))
        y = np.sin(x[:, 0]) + x[:, 1]
        emul = Emulator.from_arrays(x, y, tries=2, tv_config=(4, 0, 1),
                                    scale_inputs=True)
        emul.optimize()
        xq_f = np.array([[1.0, 2.0], [2.0, 3.0]])
        m_f, _ = emul.predict(xq_f)
        m_i, _ = emul.predict([[1, 2], [2, 3]])        # int nested list
        np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_f),
                                   rtol=1e-12)

    def test_misaligned_basis_inf_contextual_error(self):
        with pytest.raises(ValueError, match="basis_str/basis_inf"):
            parse_basis_strings(["1.0", "x**2"], ["NA", "NA"])
