"""Pallas TPU kernel: fused cross-correlation x RHS contraction (serving).

Serving-path hot op (reference `Posterior.mean`, SURVEY.md S4.3): the
posterior mean at m query points is

    mean = H* beta + c*(X*, X) @ e,        c* = exp(-D2(X*, X))

The XLA path materializes the (m, n) cross-correlation block in HBM (one
write) and reads it back for every downstream GEMM (c*@e, c*@A^-1 H, ...).
At serving scale (m = 1e6, n = 16k) that block is 64 GB per round-trip —
pure HBM-bandwidth waste, since each c* tile is cheap to recompute on the
MXU from the (m,d)+(n,d) inputs.

`corr_matvec_pallas` fuses the whole chain: each (TM, TN) correlation tile
is built in VMEM (norms + MXU cross-product + exp) and immediately
contracted against a resident (TN, r) RHS slab, accumulating a (TM, r)
output tile across the n-grid axis. c* never touches HBM. Packing
RHS = [e | A^-1 H] yields the mean and the R-term of the universal-kriging
variance in one pass; packing multi-output e's serves up to 128 outputs at
once.

Grid iteration on TPU is sequential per core, so the j-axis accumulation
into out_ref is race-free (guide: "Grid and Block Specifications").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gp_emu_uqsa_tpu.ops.mxu_packing import (
    pack_dist_a, pack_dist_b, packed_width, pad_lanes,
)

TILE_M = 256
TILE_N = 512
_LANE = 128


def _contract(c, rhs_tile, out_ref, prec):
    # Never DEFAULT on the RHS contraction: a single bf16 MXU pass rounds
    # both c and rhs to 8 mantissa bits — measured 0.13 abs error on a
    # n=4096 matvec on hardware (serving e has large cancelling entries).
    # HIGHEST (6 bf16 passes, fp32-exact) is the default; HIGH (3 passes,
    # ~2^-16-relative operands) is the opt-in fast serving mode — this
    # contraction is the kernel's dominant MXU cost.
    out_ref[:] += jax.lax.dot_general(
        c, rhs_tile,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _kernel_packed(pa_ref, pb_ref, rhs_ref, out_ref, *, prec):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # ONE bf16 MXU pass -> fp32-accurate D2 tile, norms included
    # (ops/mxu_packing.py lane-packed bf16x6 layout). DEFAULT pinned
    # explicitly: see ops/kernel_matrix.py — an enclosing fp32_exact
    # context otherwise forces fp32 contract precision onto bf16 operands
    # and Mosaic fails with "Bad lhs type".
    d2 = jax.lax.dot_general(
        pa_ref[:], pb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    c = jnp.exp(-jnp.maximum(d2, 0.0))                  # (TM, TN) VMEM only
    _contract(c, rhs_ref[:], out_ref, prec)


def _kernel_fp32(xs_ref, xt_ref, rhs_ref, out_ref, *, prec):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = xs_ref[:]                                      # (TM, d_pad)
    xj = xt_ref[:]                                      # (TN, d_pad)
    ni = jnp.sum(xi * xi, axis=1, keepdims=True)        # (TM, 1)
    nj = jnp.sum(xj * xj, axis=1, keepdims=True).T      # (1, TN)
    # HIGHEST: distances feed exp(); bf16-rounded operands are visible there
    cross = jax.lax.dot_general(
        xi, xj,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(ni + nj - 2.0 * cross, 0.0)
    c = jnp.exp(-d2)                                    # (TM, TN) in VMEM only
    _contract(c, rhs_ref[:], out_ref, prec)


@functools.partial(jax.jit, static_argnames=("interpret", "rhs_precision"))
def corr_matvec_pallas(xstar, x, delta, rhs, *, interpret: bool = False,
                       rhs_precision: str = "highest"):
    """exp(-D2(xstar/delta, x/delta)) @ rhs without materializing the block.

    xstar: (m, d); x: (n, d); delta: (d,); rhs: (n, r) or (n,), r <= 128.
    Returns (m, r) (or (m,) for vector rhs) in fp32. Zero-padded training
    rows are neutralized by zero-padding rhs (their correlation column is
    multiplied by a zero RHS row).

    rhs_precision: "highest" (fp32-exact contraction, default) or "high"
    (bf16x3: ~2x the contraction throughput at ~2^-16-relative operand
    rounding — for throughput-first mean serving where sub-1e-4-relative
    means are not required).
    """
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}[rhs_precision]
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    xstar = jnp.asarray(xstar, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    rhs = jnp.asarray(rhs, jnp.float32)
    m, d = xstar.shape
    n = x.shape[0]
    r = rhs.shape[1]
    if r > _LANE:
        raise ValueError(f"rhs width {r} > {_LANE}; split into slabs")
    inv_delta = 1.0 / jnp.asarray(delta, jnp.float32)
    xs = xstar * inv_delta
    xt = x * inv_delta

    m_pad = pl.cdiv(m, TILE_M) * TILE_M
    n_pad = pl.cdiv(n, TILE_N) * TILE_N
    rhs = jnp.pad(rhs, ((0, n_pad - n), (0, _LANE - r)))
    packed = packed_width(d) <= _LANE

    if packed:
        # lane-packed bf16x6 distance: 1 MXU pass instead of 6 (module doc
        # of ops/mxu_packing.py). Note _pack emits constant 1-valued lanes
        # per row, so a zero-padded row does NOT give d2 = 0 (it gives
        # d2 = |b|^2, c = exp(-|b|^2) != 1); padded-row correlations are
        # nonzero but harmless — padded training rows are neutralized by
        # the zero-padded rhs, padded query rows are sliced off the output.
        op_a = pad_lanes(pack_dist_a(jnp.pad(xs, ((0, m_pad - m), (0, 0)))))
        op_b = pad_lanes(pack_dist_b(jnp.pad(xt, ((0, n_pad - n), (0, 0)))))
        kernel = functools.partial(_kernel_packed, prec=prec)
        in_width = _LANE
        dist_flops = 2 * m_pad * n_pad * _LANE
    else:
        d_pad = pl.cdiv(d, _LANE) * _LANE
        op_a = jnp.pad(xs, ((0, m_pad - m), (0, d_pad - d)))
        op_b = jnp.pad(xt, ((0, n_pad - n), (0, d_pad - d)))
        kernel = functools.partial(_kernel_fp32, prec=prec)
        in_width = d_pad
        dist_flops = 6 * 2 * m_pad * n_pad * d_pad

    grid = (m_pad // TILE_M, n_pad // TILE_N)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, in_width), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, in_width), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, _LANE), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, _LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, _LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=dist_flops + 6 * 2 * m_pad * n_pad * _LANE
            + 4 * m_pad * n_pad,
            bytes_accessed=(m_pad * in_width + n_pad * in_width
                            + n_pad * _LANE + m_pad * _LANE) * 4,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(op_a, op_b, rhs)
    out = out[:m, :r]
    return out[:, 0] if squeeze else out


def serve_mean_pallas(pred, x, xstar, hstar, *, interpret: bool = False,
                      rhs_precision: str = "highest"):
    """Posterior mean at xstar via the fused kernel (mean-only serving).

    `pred` is a gp.Predictor; equivalent to gp.predict_fast(...)[0] but with
    no (m, n) HBM intermediate. Suitable for the 1M-point mean-serving path.
    """
    ce = corr_matvec_pallas(
        xstar, x, jnp.exp(pred.params.log_delta), pred.e, interpret=interpret,
        rhs_precision=rhs_precision,
    )
    return jnp.asarray(hstar, jnp.float32) @ pred.beta.astype(jnp.float32) + ce


@functools.partial(jax.jit, static_argnames=("batch", "interpret",
                                              "rhs_precision"))
def serve_mean_pallas_batched(pred, x, xstar, hstar, *, batch: int = 131072,
                              interpret: bool = False,
                              rhs_precision: str = "highest"):
    """Mean-only serving at arbitrary m (e.g. the 1M-point BASELINE config 5).

    One `corr_matvec_pallas` call writes an (m_pad, 128) fp32 output block
    (the lane dimension is fixed at 128), so a single-shot 1M-point call
    would materialize a 512 MB scratch for a 4 MB result. Chunk the query
    axis with `lax.map` instead: each chunk's scratch is (batch, 128) —
    64 MB at the default — and only the (batch,) mean column survives the
    loop. Device memory stays bounded regardless of m.
    """
    m = xstar.shape[0]
    nb = pl.cdiv(m, batch)
    m_pad = nb * batch
    xs = jnp.pad(jnp.asarray(xstar, jnp.float32), ((0, m_pad - m), (0, 0)))
    hs = jnp.pad(jnp.asarray(hstar, jnp.float32), ((0, m_pad - m), (0, 0)))
    xs = xs.reshape(nb, batch, xs.shape[1])
    hs = hs.reshape(nb, batch, hs.shape[1])
    out = jax.lax.map(
        lambda ch: serve_mean_pallas(pred, x, ch[0], ch[1], interpret=interpret,
                                     rhs_precision=rhs_precision),
        (xs, hs),
    )
    return out.reshape(m_pad)[:m]


# --------------------------------------------------------------------------
# fused mean + VARIANCE serving (VERDICT r3 next-step #2)
# --------------------------------------------------------------------------
#
# The universal-kriging variance needs quad_t(x) = t(x)^T A^-1 t(x). The
# XLA serving path (gp.predict_fast) runs it as c @ A^-1 (a full
# Precision.HIGHEST GEMM: SIX bf16 MXU passes over every (j, k) pair) —
# measured 18.6 s for 1M points at n=16k on v5e, 88% of it that one GEMM.
# Two structural savings the compiler cannot find:
#
#   1. WHITENED FORM. A^-1 = W^T W with W = L^-1 lower-triangular, so
#      quad_t = |W c|^2. Half of W is zeros -> half the MXU passes of the
#      square GEMM, and the final reduction is a sum of SQUARES — the
#      1/nugget-scale cancellation that forbids low precision in the
#      c @ A^-1 form (gp.py predict_fast note) never reaches the
#      accumulator: it happens inside each y_k dot at fp32 MXU precision.
#   2. PRECISION TIER. With the cancellation tamed, the W contraction can
#      run at Precision.HIGH (bf16x3: ~2^-17-relative operand splits,
#      3 passes) instead of HIGHEST (6) — within the fp32 solve's own
#      forward-error budget (measured bound: docs/numerics.md).
#
# Kernel shape: grid (i, k, j), j innermost. For each query tile i and
# factor-row tile k, the correlation tile c(i, j) is rebuilt in VMEM from
# the lane-packed operands (one bf16 MXU pass, ops/mxu_packing.py) and
# contracted against W(k, j); j > k tiles are skipped (strict lower
# profile) and their block fetches aliased to the diagonal so no zero
# traffic moves. y(i, k) = sum_j c(i,j) W(k,j)^T accumulates in VMEM;
# at the end of the j sweep its squares fold into a 128-lane partial-sum
# output block (cross-lane reduction deferred to XLA). The large TILE_QM
# amortizes the per-query-tile re-read of W (0.5 GB lower triangle at
# n=16k): (m/TILE_QM) * n^2/2 * 4 bytes ~ 270 GB ~ 0.3 s at v5e HBM speed.

# VMEM budget (measured on v5e: 16 MB scoped limit, and pallas double-
# buffers every block): TQM=1024/TQN=512 puts the per-step working set at
# y (2 MB) + out (0.5 MB) + w (1 MB) + pa (0.25 MB) + pb (0.13 MB) ~ 3.9 MB,
# ~7.8 MB double-buffered. TQM=2048 measured 22.96 MB scoped -> Mosaic OOM.
TILE_QM = 1024     # query tile: amortizes the W re-read per query tile
TILE_QN = 512      # factor tile: sets distance-rebuild overhead ~ 128/TQN


def _corr_tile(pa_ref, pb_ref):
    """ONE bf16 MXU pass -> fp32-accurate correlation tile (mxu_packing).

    DEFAULT precision pinned explicitly (ops/kernel_matrix.py note)."""
    d2 = jax.lax.dot_general(
        pa_ref[:], pb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return jnp.exp(-jnp.maximum(d2, 0.0))


def _quad_epilogue(out_ref, y_ref):
    yy = y_ref[:] * y_ref[:]
    # fold TQN columns into 128 lanes with static slices (all-positive
    # adds: no cancellation); XLA finishes the cross-lane sum
    acc = yy[:, :_LANE]
    for s in range(1, TILE_QN // _LANE):
        acc = acc + yy[:, s * _LANE:(s + 1) * _LANE]
    out_ref[:] += acc


def _quad_kernel(pa_ref, pb_ref, w_ref, out_ref, y_ref, *, j_tiles):
    """fp32-exact tier: Precision.HIGHEST on the W contraction (6 passes)."""
    k = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(jnp.logical_and(k == 0, j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    @pl.when(j <= k)
    def _():
        c = _corr_tile(pa_ref, pb_ref)                  # (TQM, TQN)
        # y += c @ W[k, j]^T ; W's strict upper tiles never reach here
        y_ref[:] += jax.lax.dot_general(
            c, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(j == j_tiles - 1)
    def _():
        _quad_epilogue(out_ref, y_ref)


def _quad_kernel_bf16x3(pa_ref, pb_ref, whi_ref, wlo_ref, out_ref, y_ref, *,
                        j_tiles):
    """bf16x3 tier: Mosaic has no Precision.HIGH lowering, so the 3-pass
    algorithm is spelled out — W arrives pre-split (hi, lo) bf16; the
    in-VMEM c tile is split here and the lo*lo term (~2^-16 relative) is
    dropped. Same bytes as fp32 W, half the MXU passes of HIGHEST."""
    k = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(jnp.logical_and(k == 0, j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    @pl.when(j <= k)
    def _():
        c = _corr_tile(pa_ref, pb_ref)
        # TRUNCATION split via bit masking: optimization_barrier has no
        # Mosaic lowering, and the barrier-free convert round-trip
        # c - f32(bf16(c)) risks the excess-precision fold
        # (ops/mxu_packing.py::_split3). Zeroing the low 16 mantissa bits
        # gives an EXACTLY bf16-representable hi part (Dekker-style:
        # c - c_hi is then exact in fp32, |c_lo| < 2^-8 |c|), and integer
        # ops cannot be folded away.
        c_bits = jax.lax.bitcast_convert_type(c, jnp.uint32)
        c_hi32 = jax.lax.bitcast_convert_type(
            c_bits & jnp.uint32(0xFFFF0000), jnp.float32)
        c_hi = c_hi32.astype(jnp.bfloat16)
        c_lo = (c - c_hi32).astype(jnp.bfloat16)

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        y_ref[:] += (dot(c_hi, whi_ref[:]) + dot(c_hi, wlo_ref[:])
                     + dot(c_lo, whi_ref[:]))

    @pl.when(j == j_tiles - 1)
    def _():
        _quad_epilogue(out_ref, y_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "quad_precision"))
def corr_quad_pallas(xstar, x, delta, w_tri, *, interpret: bool = False,
                     quad_precision: str = "highest"):
    """quad(x*) = |W c(x*)|^2 = t(x*)^T A^-1 t(x*) without materializing c.

    xstar: (m, d); x: (n, d); delta: (d,); w_tri: (n, n) LOWER-triangular
    W = L^-1 (strict upper must be zero — those tiles are skipped).
    Returns (m,) fp32. Requires the lane-packed layout (d <= 20); callers
    fall back to the XLA path above that.

    quad_precision: "highest" (6-pass fp32-exact contraction) or "high"
    (bf16x3 spelled out — Mosaic has no Precision.HIGH lowering — ~2x the
    contraction throughput; error bound measured in docs/numerics.md —
    safe because the |.|^2 reduction is cancellation-free, unlike the
    c @ A^-1 form).
    """
    if quad_precision not in ("highest", "high"):
        raise ValueError(f"unknown quad_precision {quad_precision!r}")
    xstar = jnp.asarray(xstar, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    m, d = xstar.shape
    n = x.shape[0]
    if packed_width(d) > _LANE:
        raise ValueError(f"d={d} exceeds the packed layout; use predict_fast")
    inv_delta = 1.0 / jnp.asarray(delta, jnp.float32)

    m_pad = pl.cdiv(m, TILE_QM) * TILE_QM
    n_pad = pl.cdiv(n, TILE_QN) * TILE_QN
    # padded FACTOR rows/cols are zero (not identity): padded y rows stay 0
    w = jnp.pad(jnp.asarray(w_tri, jnp.float32),
                ((0, n_pad - n), (0, n_pad - n)))
    op_a = pad_lanes(pack_dist_a(
        jnp.pad(xstar * inv_delta, ((0, m_pad - m), (0, 0)))))
    op_b = pad_lanes(pack_dist_b(
        jnp.pad(x * inv_delta, ((0, n_pad - n), (0, 0)))))

    j_tiles = n_pad // TILE_QN
    grid = (m_pad // TILE_QM, j_tiles, j_tiles)
    pa_spec = pl.BlockSpec((TILE_QM, _LANE), lambda i, k, j: (i, 0),
                           memory_space=pltpu.VMEM)
    # alias the skipped (j > k) fetches to the diagonal block: consecutive
    # identical block indices are not re-fetched
    pb_spec = pl.BlockSpec((TILE_QN, _LANE),
                           lambda i, k, j: (jnp.minimum(j, k), 0),
                           memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec((TILE_QN, TILE_QN),
                          lambda i, k, j: (k, jnp.minimum(j, k)),
                          memory_space=pltpu.VMEM)

    if quad_precision == "high":
        # pre-split W for the spelled-out bf16x3 kernel (barrier on the
        # ROUNDED value: the excess-precision hazard, ops/mxu_packing.py)
        w_hi = jax.lax.optimization_barrier(w.astype(jnp.bfloat16))
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        kernel = functools.partial(_quad_kernel_bf16x3, j_tiles=j_tiles)
        operands = (op_a, op_b, w_hi, w_lo)
        in_specs = [pa_spec, pb_spec, w_spec, w_spec]
        gemm_passes = 3
    else:
        kernel = functools.partial(_quad_kernel, j_tiles=j_tiles)
        operands = (op_a, op_b, w)
        in_specs = [pa_spec, pb_spec, w_spec]
        gemm_passes = 6
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_QM, _LANE), lambda i, k, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, _LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_QM, TILE_QN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            # distance rebuild over lower tiles + the 3/6-pass W GEMM
            flops=(2 * m_pad * n_pad * _LANE * (j_tiles + 1) // 2 // j_tiles
                   + gemm_passes * m_pad * n_pad * n_pad // 2),
            bytes_accessed=(m_pad // TILE_QM) * n_pad * n_pad * 2
            + m_pad * _LANE * 6,
            transcendentals=m_pad * n_pad * (j_tiles + 1) // 2 // j_tiles,
        ),
        interpret=interpret,
    )(*operands)
    return jnp.sum(out[:m], axis=1)


def serve_predictor(state):
    """Build the serving state from a gp.FitState.

    Since round 4 this is just gp.predictor: the GEMM-only Predictor
    itself carries W = L^-1 (whitened quadratic — gp.Predictor docstring),
    which is exactly what the fused Pallas path streams. Kept as a named
    entry point for the serving workflow.
    """
    from gp_emu_uqsa_tpu import gp

    return gp.predictor(state)


@functools.partial(jax.jit, static_argnames=("interpret", "rhs_precision",
                                             "quad_precision",
                                             "include_nugget"))
def serve_meanvar_pallas(spred, x, xstar, hstar, *,
                         interpret: bool = False,
                         rhs_precision: str = "highest",
                         quad_precision: str = "highest",
                         include_nugget: bool = False):
    """Posterior mean AND variance at xstar via two fused Pallas passes.

    Pass 1 (corr_matvec_pallas): c @ [e | A^-1 H] — the mean contraction
    and the R-term cross product in one RHS slab.
    Pass 2 (corr_quad_pallas): |W c|^2 — the A^-1 quadratic in whitened,
    triangular form.
    The (m, n) correlation block never touches HBM. Equivalent to
    gp.predict_fast (same math, reordered); tolerances: docs/numerics.md.
    """
    delta = jnp.exp(spred.params.log_delta)
    rhs = jnp.concatenate([spred.e[:, None], spred.ainv_h], axis=1)
    slab = corr_matvec_pallas(xstar, x, delta, rhs, interpret=interpret,
                              rhs_precision=rhs_precision)   # (m, 1+q)
    ce = slab[:, 0]
    c_ainv_h = slab[:, 1:]
    hstar = jnp.asarray(hstar, jnp.float32)
    mean = hstar @ spred.beta.astype(jnp.float32) + ce
    quad_t = corr_quad_pallas(xstar, x, delta, spred.linv,
                              interpret=interpret,
                              quad_precision=quad_precision)
    r = hstar - c_ainv_h                                     # (m, q)
    rw = r @ spred.w_chol.astype(jnp.float32)
    quad_r = jnp.sum(rw * rw, axis=1)
    prior = 1.0 + (spred.params.nugget if include_nugget else 0.0)
    var = spred.sigma2 * jnp.maximum(prior - quad_t + quad_r, 0.0)
    return mean, var


@functools.partial(jax.jit, static_argnames=("batch", "interpret",
                                             "rhs_precision",
                                             "quad_precision",
                                             "include_nugget"))
def serve_meanvar_pallas_batched(spred, x, xstar, hstar, *,
                                 batch: int = 65536,
                                 interpret: bool = False,
                                 rhs_precision: str = "highest",
                                 quad_precision: str = "highest",
                                 include_nugget: bool = False):
    """Fused mean+variance serving at arbitrary m (BASELINE config 5).

    lax.map over query chunks bounds the per-chunk Pallas scratch (the
    (batch, 128) partial-sum blocks) regardless of m.
    """
    m = xstar.shape[0]
    nb = pl.cdiv(m, batch)
    m_pad = nb * batch
    xs = jnp.pad(jnp.asarray(xstar, jnp.float32), ((0, m_pad - m), (0, 0)))
    hs = jnp.pad(jnp.asarray(hstar, jnp.float32), ((0, m_pad - m), (0, 0)))
    xs = xs.reshape(nb, batch, xs.shape[1])
    hs = hs.reshape(nb, batch, hs.shape[1])
    mean, var = jax.lax.map(
        lambda ch: serve_meanvar_pallas(
            spred, x, ch[0], ch[1], interpret=interpret,
            rhs_precision=rhs_precision, quad_precision=quad_precision,
            include_nugget=include_nugget),
        (xs, hs),
    )
    return mean.reshape(m_pad)[:m], var.reshape(m_pad)[:m]
