"""Native C fast-loader vs np.loadtxt parity (gp_emu_uqsa_tpu/native).

The loader replaces the reference's np.loadtxt data path (SURVEY.md S3
"Data manager") and must match loadtxt's default semantics exactly:
whitespace separation, '#' comments, blank lines skipped, ragged rows an
error.
"""
import numpy as np
import pytest

from gp_emu_uqsa_tpu import native
from gp_emu_uqsa_tpu.dataio import load_matrix

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler on this host")


def _roundtrip(tmp_path, text):
    p = tmp_path / "m.txt"
    p.write_text(text)
    return p


def test_matches_loadtxt_basic(tmp_path):
    rng = np.random.default_rng(0)
    m = rng.standard_normal((37, 5))
    p = tmp_path / "m.txt"
    np.savetxt(p, m, fmt="%.12g")
    got = native.load_matrix_native(p)
    want = np.loadtxt(p, ndmin=2)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.float64


def test_comments_blank_lines_and_formats(tmp_path):
    p = _roundtrip(tmp_path, """
# full comment line
1.0 2.5e-3 -4  # trailing comment
\t3 4.5E+2\t+6.25

7 8e0 9.
""")
    got = native.load_matrix_native(p)
    want = np.loadtxt(p, ndmin=2)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (3, 3)


def test_single_column_keeps_2d(tmp_path):
    p = _roundtrip(tmp_path, "1.0\n2.0\n3.0\n")
    got = load_matrix(p)
    assert got.shape == (3, 1)
    np.testing.assert_array_equal(got, [[1.0], [2.0], [3.0]])


def test_single_row(tmp_path):
    p = _roundtrip(tmp_path, "1 2 3\n")
    assert load_matrix(p).shape == (1, 3)


def test_nan_inf(tmp_path):
    p = _roundtrip(tmp_path, "nan inf -inf\n")
    got = native.load_matrix_native(p)
    assert np.isnan(got[0, 0]) and np.isposinf(got[0, 1])
    assert np.isneginf(got[0, 2])


def test_ragged_rejected(tmp_path):
    p = _roundtrip(tmp_path, "1 2 3\n4 5\n")
    with pytest.raises(ValueError):
        native.load_matrix_native(p)


def test_non_numeric_rejected(tmp_path):
    p = _roundtrip(tmp_path, "1 2\nfoo 4\n")
    with pytest.raises(ValueError):
        native.load_matrix_native(p)


def test_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.load_matrix_native(tmp_path / "nope.txt")


def test_crlf(tmp_path):
    p = _roundtrip(tmp_path, "1 2\r\n3 4\r\n")
    np.testing.assert_array_equal(
        native.load_matrix_native(p), [[1.0, 2.0], [3.0, 4.0]])


def test_large_roundtrip_and_speed(tmp_path):
    rng = np.random.default_rng(1)
    m = rng.uniform(size=(20000, 8))
    p = tmp_path / "big.txt"
    np.savetxt(p, m, fmt="%.12g")
    got = native.load_matrix_native(p)
    want = np.loadtxt(p, ndmin=2)
    np.testing.assert_array_equal(got, want)
