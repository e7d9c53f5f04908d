"""Optimized LHC design properties."""
import numpy as np

from gp_emu_uqsa_tpu.design_inputs import optLatinHyperCube


def test_lhc_is_latin_and_scaled(tmp_path):
    mm = [[0.0, 2.0], [10.0, 20.0], [-1.0, 1.0]]
    x = optLatinHyperCube(3, 16, 40, mm, filename=str(tmp_path / "d"))
    assert x.shape == (16, 3)
    for j, (lo, hi) in enumerate(mm):
        assert x[:, j].min() >= lo and x[:, j].max() <= hi
        # latin property: one point per stratum
        strata = np.floor((x[:, j] - lo) / (hi - lo) * 16).astype(int)
        strata = np.clip(strata, 0, 15)
        assert len(set(strata.tolist())) == 16
    assert (tmp_path / "d").exists()
    loaded = np.loadtxt(tmp_path / "d")
    np.testing.assert_allclose(loaded, x, rtol=1e-10)


def test_maximin_beats_random():
    """The N-candidate maximin design beats a single candidate on average."""
    def min_dist(x):
        d = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    mm = [[0, 1]] * 2
    best = optLatinHyperCube(2, 20, 200, mm, seed=1)
    single = optLatinHyperCube(2, 20, 1, mm, seed=2)
    assert min_dist(best) > min_dist(single)
