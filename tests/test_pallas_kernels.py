"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from gp_emu_uqsa_tpu.kernels import gaussian_corr_self, make_params
from gp_emu_uqsa_tpu.ops.kernel_matrix import gaussian_corr_self_pallas


def test_fused_kernel_matrix_matches_xla():
    rng = np.random.default_rng(0)
    n, d = 300, 5   # deliberately not tile-aligned
    x = rng.uniform(size=(n, d)).astype(np.float32)
    delta = np.array([0.5, 0.8, 1.2, 0.3, 2.0], np.float32)
    nugget = 1e-4
    got = gaussian_corr_self_pallas(x, delta, nugget, interpret=True)
    p = make_params(delta, nugget=nugget, dtype=jnp.float32)
    want = gaussian_corr_self(jnp.asarray(x), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    # symmetric to fp32 accumulation order (the packed bf16x6 dot sums the
    # same term set for (i,j) and (j,i) but in different orders) + unit
    # diagonal (+nugget)
    a = np.asarray(got)
    np.testing.assert_allclose(a, a.T, atol=1e-5)
    np.testing.assert_allclose(np.diag(a), 1.0 + nugget, rtol=1e-5)


def test_mxu_packed_distance_matches_fp64():
    """One bf16 dot over the packed lanes == fp64 D2 to fp32 accuracy."""
    import jax
    from gp_emu_uqsa_tpu.ops.mxu_packing import (
        pack_dist_a, pack_dist_b, packed_width, pad_lanes,
    )

    rng = np.random.default_rng(7)
    for d in (1, 8, 20):
        assert packed_width(d) <= 128
        a = rng.uniform(-2, 2, size=(57, d)).astype(np.float32)
        b = rng.uniform(-2, 2, size=(43, d)).astype(np.float32)
        pa, pb = pad_lanes(pack_dist_a(a)), pad_lanes(pack_dist_b(b))
        assert pa.dtype == jnp.bfloat16
        d2 = jax.lax.dot_general(pa, pb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        a64, b64 = a.astype(np.float64), b.astype(np.float64)
        ref = ((a64 * a64).sum(1)[:, None] + (b64 * b64).sum(1)[None, :]
               - 2 * a64 @ b64.T)
        scale = max(1.0, float(np.max(np.abs(ref))))
        assert float(np.max(np.abs(np.asarray(d2) - ref))) < 4e-7 * scale


def test_fused_kernels_fp32_fallback_above_d20():
    """d > 20 exceeds the 128-lane packing; the fp32 HIGHEST path takes
    over and still matches XLA."""
    rng = np.random.default_rng(8)
    n, d = 100, 25
    x = rng.uniform(size=(n, d)).astype(np.float32)
    delta = np.full(d, 0.9, np.float32)
    got = gaussian_corr_self_pallas(x, delta, 1e-4, interpret=True)
    p = make_params(delta, nugget=1e-4, dtype=jnp.float32)
    want = gaussian_corr_self(jnp.asarray(x), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    from gp_emu_uqsa_tpu.kernels import gaussian_corr
    from gp_emu_uqsa_tpu.ops.serve import corr_matvec_pallas

    xs = rng.uniform(size=(77, d)).astype(np.float32)
    rhs = rng.standard_normal(n).astype(np.float32)
    got_v = corr_matvec_pallas(xs, x, delta, rhs, interpret=True)
    p0 = make_params(delta, nugget=0.0, dtype=jnp.float32)
    want_v = gaussian_corr(jnp.asarray(xs), jnp.asarray(x), p0) @ jnp.asarray(rhs)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=3e-5, atol=3e-5)


def test_corr_matvec_fused_matches_xla():
    from gp_emu_uqsa_tpu.kernels import gaussian_corr
    from gp_emu_uqsa_tpu.ops.serve import corr_matvec_pallas

    rng = np.random.default_rng(2)
    m, n, d, r = 513, 300, 3, 5       # nothing tile-aligned
    xstar = rng.uniform(size=(m, d)).astype(np.float32)
    x = rng.uniform(size=(n, d)).astype(np.float32)
    delta = np.array([0.5, 1.5, 0.9], np.float32)
    rhs = rng.standard_normal((n, r)).astype(np.float32)
    got = corr_matvec_pallas(xstar, x, delta, rhs, interpret=True)
    p = make_params(delta, nugget=0.0, dtype=jnp.float32)
    c = gaussian_corr(jnp.asarray(xstar), jnp.asarray(x), p)
    want = np.asarray(c @ jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-5)
    # vector RHS round-trips shape
    got_v = corr_matvec_pallas(xstar, x, delta, rhs[:, 0], interpret=True)
    assert got_v.shape == (m,)
    np.testing.assert_allclose(np.asarray(got_v), want[:, 0],
                               rtol=3e-5, atol=3e-5)


def test_serve_mean_pallas_matches_predict_fast():
    import jax
    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.ops.serve import serve_mean_pallas

    rng = np.random.default_rng(3)
    n, d, m = 80, 2, 200
    x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, 0]) + x[:, 1]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    xs = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
    hs = basis_matrix(xs, spec)
    params = make_params(np.full(d, 0.7, np.float32), nugget=1e-4,
                         dtype=jnp.float32)
    state = gp.fit(params, x, y, h)
    pred = gp.predictor(state)
    want_mean, _ = gp.predict_fast(pred, x, xs, hs)
    got_mean = serve_mean_pallas(pred, x, xs, hs, interpret=True)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean),
                               rtol=2e-4, atol=2e-4)


def test_serve_mean_pallas_batched_matches_unbatched():
    """lax.map chunking (the 1M-point serving path) == one-shot serve,
    including a query count that is not a multiple of the batch."""
    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.ops.serve import (
        serve_mean_pallas, serve_mean_pallas_batched,
    )

    rng = np.random.default_rng(5)
    n, d, m = 60, 3, 333                  # m % batch != 0 on purpose
    x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) - x[:, 2]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    xs = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
    hs = basis_matrix(xs, spec)
    params = make_params(np.full(d, 0.6, np.float32), nugget=1e-4,
                         dtype=jnp.float32)
    pred = gp.predictor(gp.fit(params, x, y, h))
    want = serve_mean_pallas(pred, x, xs, hs, interpret=True)
    got = serve_mean_pallas_batched(pred, x, xs, hs, batch=128,
                                    interpret=True)
    assert got.shape == (m,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_corr_quad_pallas_matches_direct():
    """|W c|^2 streaming kernel == direct t^T A^-1 t (strict lower W profile,
    multiple j/k tiles so the triangular skip and aliasing paths run)."""
    import jax
    from gp_emu_uqsa_tpu.kernels import gaussian_corr
    from gp_emu_uqsa_tpu.ops import serve
    from gp_emu_uqsa_tpu.ops.serve import corr_quad_pallas

    rng = np.random.default_rng(11)
    n, d, m = 700, 4, 150             # n spans 2+ TILE_QN tiles when shrunk
    x = rng.uniform(size=(n, d)).astype(np.float32)
    xs = rng.uniform(size=(m, d)).astype(np.float32)
    delta = np.array([0.5, 0.8, 1.1, 0.6], np.float32)
    mmat = rng.standard_normal((n, n))
    a = (mmat @ mmat.T / n + np.eye(n)).astype(np.float64)
    l = np.linalg.cholesky(a)
    w = np.linalg.inv(l).astype(np.float32)    # lower-triangular L^-1
    got = corr_quad_pallas(xs, x, delta, w, interpret=True)
    from gp_emu_uqsa_tpu.kernels import make_params as mp
    c = np.asarray(gaussian_corr(jnp.asarray(xs), jnp.asarray(x),
                                 mp(delta, nugget=0.0, dtype=jnp.float32)),
                   np.float64)
    want = np.sum((w.astype(np.float64) @ c.T) ** 2, axis=0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-5)
    # the bf16x3 tier (spelled-out splits) must agree too; interpret mode
    # runs its dots in fp32, so this checks the split/recombine algebra —
    # the true bf16x3 rounding is measured on hardware (docs/numerics.md)
    got_hi = corr_quad_pallas(xs, x, delta, w, interpret=True,
                              quad_precision="high")
    np.testing.assert_allclose(np.asarray(got_hi), want, rtol=1e-3, atol=1e-4)


def test_serve_meanvar_pallas_matches_predict_fast():
    """Two-pass fused mean+variance == gp.predict_fast (VERDICT r3 #2)."""
    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.ops.serve import (
        serve_meanvar_pallas, serve_meanvar_pallas_batched, serve_predictor,
    )

    rng = np.random.default_rng(13)
    n, d, m = 90, 3, 270
    x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, 0]) + x[:, 1] * x[:, 2]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    xs = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
    hs = basis_matrix(xs, spec)
    # nugget 1e-2: keeps predictive variances well above the fp32 rounding
    # floor of BOTH paths (at 1e-4 the dense-design variances are ~1e-6 —
    # pure clipping noise in either formulation)
    params = make_params(np.full(d, 0.7, np.float32), nugget=1e-2,
                         dtype=jnp.float32)
    state = gp.fit(params, x, y, h)
    pred = gp.predictor(state)
    want_mean, want_var = gp.predict_fast(pred, x, xs, hs)
    spred = serve_predictor(state)
    got_mean, got_var = serve_meanvar_pallas(spred, x, xs, hs, interpret=True)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean),
                               rtol=2e-4, atol=2e-4)
    # both sides are fp32 algorithms; their difference is bounded by the
    # fp32 conditioning of the quadratic, which scales with sigma2 (the
    # prior variance), not with the possibly-tiny posterior variance
    scale = float(state.sigma2)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var),
                               atol=5e-4 * scale, rtol=2e-2)
    # batched path round-trips, m % batch != 0
    bm, bv = serve_meanvar_pallas_batched(spred, x, xs, hs, batch=128,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(bm), np.asarray(got_mean),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(got_var),
                               rtol=2e-3, atol=1e-5 * scale)


def test_corr_matvec_multi_output_slab():
    """The RHS slab serves up to 128 outputs in ONE fused pass (module
    docstring of ops/serve.py): for emulators sharing a kernel, packing
    the per-output weight vectors e_k as slab columns yields every
    output's mean contraction from a single kernel invocation."""
    from gp_emu_uqsa_tpu.kernels import gaussian_corr, make_params
    from gp_emu_uqsa_tpu.ops.serve import corr_matvec_pallas

    rng = np.random.default_rng(21)
    n, d, m, k = 150, 4, 90, 12           # 12 outputs, one pass
    x = rng.uniform(size=(n, d)).astype(np.float32)
    xs = rng.uniform(size=(m, d)).astype(np.float32)
    delta = np.array([0.6, 0.9, 1.2, 0.8], np.float32)
    e_slab = rng.standard_normal((n, k)).astype(np.float32)
    got = corr_matvec_pallas(xs, x, delta, e_slab, interpret=True)
    p = make_params(delta, nugget=0.0, dtype=jnp.float32)
    c = gaussian_corr(jnp.asarray(xs), jnp.asarray(x), p)
    want = np.asarray(c @ jnp.asarray(e_slab))
    assert got.shape == (m, k)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-5)


def test_blocked_cholesky_matches_lapack():
    import jax.numpy as jnp
    from gp_emu_uqsa_tpu.ops.cholesky import cholesky_blocked_padded

    rng = np.random.default_rng(1)
    for n in (100, 512, 700, 1024):
        m = rng.standard_normal((n, n))
        a = m @ m.T + n * np.eye(n)
        l_ref = np.linalg.cholesky(a)
        l_got = np.asarray(cholesky_blocked_padded(jnp.asarray(a), leaf=256))
        np.testing.assert_allclose(l_got, l_ref, rtol=1e-8, atol=1e-8)
        # exactly lower triangular
        assert np.allclose(np.triu(l_got, 1), 0.0)
