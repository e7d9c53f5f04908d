"""BASELINE.json acceptance configs 2 & 3 as scripted tests (SURVEY.md S9.5).

Golden values: for the 10D smooth-g simulator the sensitivity ordering is
known analytically (b_i strictly decreasing => S_i strictly decreasing), and
MC integration of the true function gives the quantitative check.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

EX = Path(__file__).parent.parent / "examples"
sys.path.insert(0, str(EX / "branin-2d"))
sys.path.insert(0, str(EX / "synthetic-10d"))


@pytest.mark.slow
def test_branin_config2():
    import run_branin

    emul, sens = run_branin.main(n=60, noise_sd=2.0, verbose=False)
    # trained nugget should reflect the injected noise: sigma2*nugget ~ 4
    nug = float(np.exp(emul.params.log_nugget))
    sig2 = float(emul.state.sigma2)
    noise_var = nug * sig2
    assert 0.2 < noise_var < 80.0, noise_var
    # emulator accuracy on the noiseless truth
    rng = np.random.default_rng(1)
    xt = rng.uniform([-5, 0], [10, 15], size=(200, 2))
    mean, _ = emul.predict(xt)
    truth = run_branin.branin(xt[:, 0], xt[:, 1])
    rel = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)) / np.std(truth))
    assert rel < 0.25, rel
    si = np.asarray(sens.sensitivity()["S_i"])
    assert np.all(si > -0.01) and si.sum() < 1.15


@pytest.mark.slow
def test_10d_config3():
    import run_10d

    emul, sens, si, ti = run_10d.main(n=400, tries=4, verbose=False)
    s_i = np.asarray(si["S_i"])
    # known ordering: inputs 0..3 dominate, 8..9 negligible
    assert s_i[0] > s_i[2] > s_i[4], s_i
    assert s_i[0] > 0.15
    assert np.all(s_i[8:] < 0.02)
    # (a) INTERNAL golden check — the analytic integrals must match brute
    # Monte-Carlo integration of the emulator itself (this validates the
    # UQSA math regardless of how accurate the n=400 emulator is):
    rng = np.random.default_rng(2)
    m, v = np.full(10, 0.5), np.full(10, 0.02)
    z = m + np.sqrt(v) * rng.standard_normal((8000, 10))
    mean_z, var_z = emul.predict(z)
    mc_of_emul = float(np.asarray(mean_z).var() + np.asarray(var_z).mean())
    v_total = float(si["V_total"])
    assert abs(v_total - mc_of_emul) / mc_of_emul < 0.15, (v_total, mc_of_emul)
    # (b) EXTERNAL check vs the true simulator — loose: n=400 in 10D bounds
    # emulator accuracy, not the integrals
    f = run_10d.smooth_g(z)
    var_total_mc = f.var()
    assert v_total / var_total_mc < 2.5 and v_total / var_total_mc > 0.4
    # first-order V_1 vs nested MC on the true function (dominant input, the
    # emulator captures it much better than the total)
    z1 = m[0] + np.sqrt(v[0]) * rng.standard_normal(150)
    means = []
    for a in z1:
        zz = m + np.sqrt(v) * rng.standard_normal((2000, 10))
        zz[:, 0] = a
        means.append(run_10d.smooth_g(zz).mean())
    v1_mc = np.var(means)
    v1 = float(np.asarray(si["V_i"])[0])
    assert 0.4 < v1 / v1_mc < 2.5, (v1, v1_mc)


@pytest.mark.slow
def test_sensitivity_file_tree(tmp_path, monkeypatch):
    """File-driven sensitivity example tree (VERDICT r4 next-step #10):
    reference-layout config/beliefs/data files -> setup/train ->
    analytic UQSA -> indices file, run exactly as a user would."""
    import shutil
    import runpy

    src = EX / "sensitivity-2d"
    for f in src.iterdir():
        shutil.copy(f, tmp_path / f.name)
    monkeypatch.chdir(tmp_path)
    runpy.run_path(str(tmp_path / "run_sensitivity.py"), run_name="__main__")
    # the workflow wrote the indices table and the beliefs write-back
    lines = (tmp_path / "sens2d_indices").read_text().strip().splitlines()
    assert lines[0].startswith("E*[E(Y)]")
    rows = [ln.split() for ln in lines[4:]]
    s_i = np.array([float(r[2]) for r in rows])
    s_ti = np.array([float(r[4]) for r in rows])
    # simulator x1 + 0.15 exp(x1) + 0.6 x2^2: x1 dominates
    assert s_i[0] > s_i[1] > 0.0
    assert 0.9 < s_i.sum() < 1.1          # near-additive function
    assert np.all(s_ti >= s_i - 0.02)
    assert (tmp_path / "sens2d_beliefs-f").exists()


@pytest.mark.slow
def test_noisefit_file_tree(tmp_path, monkeypatch):
    """File-driven noisefit tree: reference call shape
    noisefit(data_conf, noise_conf, stopat, olhcmult) + per-iteration
    intermediate files (SURVEY.md S3 noise-fit row)."""
    import shutil

    from gp_emu_uqsa_tpu.noise_fit import noisefit, predict_noise

    src = EX / "noise-fit"
    for f in src.iterdir():
        shutil.copy(f, tmp_path / f.name)
    monkeypatch.chdir(tmp_path)
    result = noisefit("noisefit_data_config", "noisefit_noise_config",
                      stopat=3, olhcmult=100)
    # per-iteration intermediates + final noise + beliefs write-backs
    assert (tmp_path / "noisefit_output-noise-it0").exists()
    assert (tmp_path / "noisefit_output-noise").exists()
    assert (tmp_path / "noisefit_data_beliefs-f").exists()
    assert (tmp_path / "noisefit_noise_beliefs-f").exists()
    it0 = np.loadtxt(tmp_path / "noisefit_output-noise-it0")
    assert it0.shape == (150,) and np.all(it0 > 0)
    # the fitted noise sd must increase left->right (true sd = 0.1+0.4x;
    # result.x is in the min-max scaled input space, so query there)
    est_sd = np.sqrt(predict_noise(result, np.array([0.1, 0.9])))
    assert est_sd[1] > est_sd[0]
