"""Sharded-vs-unsharded equality on the 8-device CPU mesh (SURVEY.md S9.5)."""
import numpy as np
import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.kernels import make_params
from gp_emu_uqsa_tpu.parallel import make_mesh, predict_sharded


def _fit_problem(n=40, d=3, m=101):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(2 * x[:, 0]) + x[:, 1] * x[:, 2]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    xs = jnp.asarray(rng.uniform(size=(m, d)))
    hs = basis_matrix(xs, spec)
    p = make_params(np.full(d, 0.7), nugget=1e-6, dtype=jnp.float64)
    state = gp.fit(p, x, y, h)
    return state, x, h, xs, hs


def test_predict_sharded_matches_local():
    state, x, h, xs, hs = _fit_problem(m=101)  # 101 is NOT divisible by 8
    mesh = make_mesh({"data": 8})
    mean_s, var_s = predict_sharded(state, x, h, xs, hs, mesh)
    mean_l, var_l = gp.predict(state, x, h, xs, hs)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_l), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_l), rtol=1e-10, atol=1e-14)


def test_2d_mesh_axes():
    mesh = make_mesh({"chains": 4, "data": 2})
    assert mesh.shape["chains"] == 4 and mesh.shape["data"] == 2
    state, x, h, xs, hs = _fit_problem(m=16)
    mean_s, var_s = predict_sharded(state, x, h, xs, hs, mesh)
    mean_l, _ = gp.predict(state, x, h, xs, hs)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_l), rtol=1e-12)


def test_graft_entry_roundtrip():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out[0])))
    ge.dryrun_multichip(8)


def test_ring_predict_matches_local():
    """Sharded-training ring prediction == local exact path (mean and var)."""
    from gp_emu_uqsa_tpu.parallel.ring import ring_predict

    state, x, h, xs, hs = _fit_problem(n=40, m=37)  # neither divisible by 8
    pred = gp.predictor(state)
    mesh = make_mesh({"data": 8})
    mean_r, var_r = ring_predict(pred, x, xs, hs, mesh)
    mean_l, var_l = gp.predict_fast(pred, x, xs, hs)
    np.testing.assert_allclose(np.asarray(mean_r), np.asarray(mean_l), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var_r), np.asarray(var_l),
                               rtol=1e-8, atol=1e-12)


def test_sharded_mle_restarts():
    """mle_fit with mesh-sharded restarts matches unsharded best NLL."""
    import oracle
    from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(60, 2))
    a = oracle.corr_self(x, np.array([0.4, 0.8]), 1e-8)
    y = np.linalg.cholesky(a) @ rng.standard_normal(60)
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    cfg = MLEConfig(tries=8)
    mesh = make_mesh({"chains": 8})
    p1, i1 = mle_fit(jax.random.key(0), x, y, h, cfg)
    p2, i2 = mle_fit(jax.random.key(0), x, y, h, cfg, mesh=mesh)
    np.testing.assert_allclose(float(i1["best_nll"]), float(i2["best_nll"]),
                               rtol=1e-8)


def test_distributed_cholesky():
    """Row-sharded panel Cholesky == LAPACK on the 8-device mesh."""
    from gp_emu_uqsa_tpu.ops.distributed_cholesky import distributed_cholesky

    rng = np.random.default_rng(4)
    for n, blk in ((300, 64), (512, 128)):
        m = rng.standard_normal((n, n))
        a = (m @ m.T + n * np.eye(n)).astype(np.float64)
        l_ref = np.linalg.cholesky(a)
        mesh = make_mesh({"mr": 8})
        l_got = np.asarray(distributed_cholesky(jnp.asarray(a), mesh, block=blk))
        np.testing.assert_allclose(l_got, l_ref, rtol=1e-9, atol=1e-9)
        assert np.allclose(np.triu(l_got, 1), 0.0)


def test_distributed_cholesky_recursive():
    """Recursive distributed Cholesky == LAPACK, sharded and unsharded."""
    from gp_emu_uqsa_tpu.ops.distributed_cholesky import (
        distributed_cholesky_recursive,
    )

    rng = np.random.default_rng(7)
    for n, leaf in ((300, 64), (1024, 128)):
        m = rng.standard_normal((n, n))
        a = (m @ m.T + n * np.eye(n)).astype(np.float64)
        l_ref = np.linalg.cholesky(a)
        mesh = make_mesh({"mr": 8})
        l_got = np.asarray(
            distributed_cholesky_recursive(jnp.asarray(a), mesh, leaf=leaf)
        )
        np.testing.assert_allclose(l_got, l_ref, rtol=1e-9, atol=1e-9)
        assert np.allclose(np.triu(l_got, 1), 0.0)
        l_loc = np.asarray(
            distributed_cholesky_recursive(jnp.asarray(a), None, leaf=leaf)
        )
        np.testing.assert_allclose(l_loc, l_ref, rtol=1e-9, atol=1e-9)


def test_sharded_corr_build_plus_distributed_chol():
    """End-to-end large-n path: sharded A build -> distributed Cholesky."""
    from gp_emu_uqsa_tpu.kernels import make_params, gaussian_corr_self
    from gp_emu_uqsa_tpu.ops.distributed_cholesky import _dist_chol_impl
    from gp_emu_uqsa_tpu.parallel.sharded_gp import build_corr_sharded

    rng = np.random.default_rng(5)
    n, d = 250, 3   # not divisible by 8 -> exercises identity-tail padding
    x = rng.uniform(size=(n, d))
    p = make_params(np.full(d, 0.6), nugget=1e-3, dtype=jnp.float64)
    mesh = make_mesh({"mr": 8})
    a_sh, n_out = build_corr_sharded(x, p, mesh)
    assert n_out == n
    a_ref = np.asarray(gaussian_corr_self(jnp.asarray(x), p))
    np.testing.assert_allclose(np.asarray(a_sh)[:n, :n], a_ref, atol=1e-12)
    # identity tail
    tail = np.asarray(a_sh)[n:, n:]
    np.testing.assert_allclose(tail, np.eye(tail.shape[0]), atol=1e-12)
    # full pipeline through the distributed factorization (block divides pad)
    l = _dist_chol_impl(a_sh, block=a_sh.shape[0] // 4, axis_name="mr")
    l_np = np.asarray(l)[:n, :n]
    np.testing.assert_allclose(l_np @ l_np.T, a_ref, atol=1e-9)


def test_fit_large_matches_local():
    """Distributed large-n fit == single-device gp.fit, then predicts."""
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.kernels import make_params
    from gp_emu_uqsa_tpu.parallel.large_fit import fit_large

    rng = np.random.default_rng(6)
    n, d = 220, 3
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3 * x[:, 0]) + x[:, 1] - 0.5 * x[:, 2]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    p = make_params(np.full(d, 0.7), nugget=1e-4, dtype=jnp.float64)
    mesh = make_mesh({"mr": 8})
    st_d = fit_large(p, x, y, h, mesh, block=64)
    st_l = gp.fit(p, x, y, h)
    np.testing.assert_allclose(float(st_d.nll), float(st_l.nll), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_l.beta),
                               rtol=1e-8)
    np.testing.assert_allclose(float(st_d.sigma2), float(st_l.sigma2),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(st_d.e), np.asarray(st_l.e),
                               rtol=1e-6, atol=1e-8)
    # downstream prediction through the standard path
    xs = jnp.asarray(rng.uniform(size=(13, d)))
    hs = basis_matrix(xs, spec)
    m_d, v_d = gp.predict(st_d, x, h, xs, hs)
    m_l, v_l = gp.predict(st_l, x, h, xs, hs)
    np.testing.assert_allclose(np.asarray(m_d), np.asarray(m_l), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v_d), np.asarray(v_l), rtol=1e-6,
                               atol=1e-10)
    # the masked-panel factorization path stays equivalent
    st_p = fit_large(p, x, y, h, mesh, block=64, factorization="panel")
    np.testing.assert_allclose(float(st_p.nll), float(st_l.nll), rtol=1e-10)


def test_fit_large_refine_fp32_compensated():
    """fit_large(refine=1) in fp32 uses the compensated sharded residual
    (ops/compensated.py::residual_compensated_sharded) — it must improve
    e toward the fp64 oracle of the same fp32-rounded system, on the
    8-device mesh, with no x64 dependence in the math.
    """
    import scipy.linalg as sla

    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.kernels import corr_self, make_params
    from gp_emu_uqsa_tpu.parallel.large_fit import fit_large

    rng = np.random.default_rng(9)
    n, d = 512, 3
    base = rng.uniform(size=(n // 2, d))
    xx = np.vstack([base, base + 1e-3 * rng.standard_normal((n // 2, d))])
    x = jnp.asarray(xx, jnp.float32)
    y = jnp.asarray(np.sin(3 * xx[:, 0]) + xx[:, 1], jnp.float32)
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    p = make_params(np.full(d, 1.2), nugget=2.2e-3, dtype=jnp.float32)
    mesh = make_mesh({"mr": 8})
    st0 = fit_large(p, x, y, h, mesh, block=64)
    st1 = fit_large(p, x, y, h, mesh, block=64, refine=1)

    # fp64 oracle on the same fp32-rounded system at the fit's own beta
    a64 = np.asarray(corr_self(x, p), np.float64)
    beta = np.asarray(st1.beta, np.float64)
    rhs = np.asarray(y, np.float64) - np.asarray(h, np.float64) @ beta
    cf = sla.cho_factor(a64, lower=True)
    e64 = sla.cho_solve(cf, rhs)
    enorm = np.linalg.norm(e64)
    err0 = np.linalg.norm(np.asarray(st0.e, np.float64) - e64) / enorm
    err1 = np.linalg.norm(np.asarray(st1.e, np.float64) - e64) / enorm
    # floor: the sharded kernel BUILD rounds A differently from the
    # oracle's eager corr_self (O(kappa*eps32) term, docs/numerics.md) —
    # measured 5.0e-4 here; refinement's contract is the solve, pinned by
    # the improvement ratio below
    assert err1 < 1.5e-3
    assert err1 < err0 / 3          # the sweep demonstrably acted


def test_predictor_large_sharded_serving():
    """End-to-end sharded large-n serving with NO (n, n) global object
    (VERDICT r4 next-step #3): fit_large -> predictor_large (W = L^-1 via
    the distributed TRSM, identity built under a sharding constraint) ->
    ring_predict, equal to the local predictor/predict_fast path, with the
    (n, n) serving operand asserted row-sharded end to end."""
    from jax.sharding import PartitionSpec as P

    from gp_emu_uqsa_tpu.parallel.large_fit import fit_large, predictor_large
    from gp_emu_uqsa_tpu.parallel.ring import ring_predict

    rng = np.random.default_rng(12)
    n, d, m = 256, 3, 53          # n mesh- and block-aligned (the prod path)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3 * x[:, 0]) + x[:, 1] * x[:, 2]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    xs = jnp.asarray(rng.uniform(size=(m, d)))
    hs = basis_matrix(xs, spec)
    p = make_params(np.full(d, 0.7), nugget=1e-4, dtype=jnp.float64)
    mesh = make_mesh({"mr": 8})

    st = fit_large(p, x, y, h, mesh, block=64)
    pred_s = predictor_large(st, mesh, block=64)
    # the (n, n) serving operand is row-sharded — no full-size gather
    assert tuple(pred_s.linv.sharding.spec)[:1] == ("mr",), \
        pred_s.linv.sharding
    # W itself equals the local triangular inverse
    pred_l = gp.predictor(gp.fit(p, x, y, h))
    np.testing.assert_allclose(np.asarray(pred_s.linv),
                               np.asarray(pred_l.linv), rtol=1e-6, atol=1e-8)

    mesh_data = make_mesh({"data": 8})
    mean_r, var_r = ring_predict(pred_s, x, xs, hs, mesh_data)
    mean_l, var_l = gp.predict_fast(pred_l, x, xs, hs)
    np.testing.assert_allclose(np.asarray(mean_r), np.asarray(mean_l),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(var_r), np.asarray(var_l),
                               rtol=1e-7, atol=1e-12)


def test_predictor_large_unaligned_n():
    """Padding path: n not divisible by block*p still factorizes/serves."""
    from gp_emu_uqsa_tpu.parallel.large_fit import fit_large, predictor_large
    from gp_emu_uqsa_tpu.parallel.ring import ring_predict

    rng = np.random.default_rng(13)
    n, d = 150, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(2 * x[:, 0]) + x[:, 1]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    p = make_params(np.full(d, 0.8), nugget=1e-4, dtype=jnp.float64)
    mesh = make_mesh({"mr": 8})
    st = fit_large(p, x, y, h, mesh, block=32)
    pred_s = predictor_large(st, mesh, block=32)
    pred_l = gp.predictor(gp.fit(p, x, y, h))
    np.testing.assert_allclose(np.asarray(pred_s.linv),
                               np.asarray(pred_l.linv), rtol=1e-6, atol=1e-8)
    xs = jnp.asarray(rng.uniform(size=(21, d)))
    hs = basis_matrix(xs, spec)
    mean_r, var_r = ring_predict(pred_s, x, xs, hs, make_mesh({"data": 8}))
    mean_l, var_l = gp.predict_fast(pred_l, x, xs, hs)
    np.testing.assert_allclose(np.asarray(mean_r), np.asarray(mean_l),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(var_r), np.asarray(var_l),
                               rtol=1e-7, atol=1e-12)


def test_shard_map_trsm_hlo_has_no_allgather():
    """The round-5 structural claim, pinned at the HLO level: the manual
    shard_map substitution must compile with ZERO all-gathers (the GSPMD
    formulation silently replicated the full factor — see
    tri_solve_shard_map docstring). Only the per-step (B, k) psum
    (all-reduce) may appear."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gp_emu_uqsa_tpu.ops.distributed_cholesky import _shard_map_solver

    mesh = make_mesh({"mr": 8})
    n, blk, k = 512, 32, 4
    l = jnp.tril(jnp.ones((n, n))) + n * jnp.eye(n)
    b = jnp.ones((n, k))
    lp = jax.device_put(l, NamedSharding(mesh, P("mr", None)))
    bp = jax.device_put(b, NamedSharding(mesh, P("mr", None)))
    for trans in (False, True):
        fn = _shard_map_solver(mesh, "mr", blk, n // 8, trans)
        txt = fn.lower(lp, bp).compile().as_text()
        assert "all-gather" not in txt, f"trans={trans}"
        assert "all-reduce" in txt          # the (B, k) psum broadcast
