"""Lane-packed bf16x6 operands: fp32-accurate distance GEMM in ONE MXU pass.

The hot op of both Pallas kernels (ops/kernel_matrix.py build, ops/serve.py
serving) is the scaled-distance matrix

    D2[i, j] = |a_i|^2 + |b_j|^2 - 2 <a_i, b_j>,   a = x/delta, b = x*/delta.

On the MXU a k-contraction always costs a full 128-lane pass, and fp32
accuracy (Precision.HIGHEST) costs SIX bf16 passes — so with d ~ 8 real
features padded to 128 lanes, 6 x 16 = 96x of the MXU work is padding.

This module exploits both wastes at once. HIGHEST's bf16x6 algorithm
splits each operand 3 ways (v = v0 + v1 + v2, 8 mantissa bits each) and
sums the six dominant cross products {00, 01, 10, 11, 02, 20}; since the
products of bf16 pairs are EXACT in fp32 and the MXU accumulates in fp32,
the six passes differ only in which split feeds the array. Lay the six
term-pairs out side-by-side in the lane dimension instead:

    A lanes: [ t0 t0 t1 t1 t0 t2 | n0 n1 n2 | 1 1 1 ]      t = -sqrt2 * a
    B lanes: [ u0 u1 u0 u1 u2 u0 | 1  1  1  | m0 m1 m2 ]   u = +sqrt2 * b

(n = |a_i|^2 split 3 ways, m = |b_j|^2 split 3 ways.) One bf16 dot over
these 6d+6 lanes then returns D2 itself, fp32-accurate, in a SINGLE MXU
pass — including the norm terms, so the kernels no longer need fp32 input
refs at all. Requires 6d+6 <= 128, i.e. d <= 20 (callers fall back to the
HIGHEST fp32 path above that; GP emulation inputs are essentially always
d <= 20).

Accuracy: identical term set to XLA's bf16x6, plus exact norm accumulation
in the same fp32 accumulator — max |D2_packed - D2_fp64| measured at
~1e-6 for O(1) operands (tests/test_pallas_kernels.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LANE = 128
_SQRT2 = 1.4142135623730951

# split-index pattern of bf16x6: products a_s[i] * b_s[j] for these pairs
_A_IDX = (0, 0, 1, 1, 0, 2)
_B_IDX = (0, 1, 0, 1, 2, 0)


def packed_width(d: int) -> int:
    """Lanes used by the packing for d features (before padding to 128)."""
    return 6 * d + 6


def _split3(v):
    """3-way bf16 split: v ~= v0 + v1 + v2 with ~8 mantissa bits each.

    Each residual subtraction is exact in fp32 (the rounded part is close
    to the remainder), so the three parts carry ~24 bits together.

    The optimization barriers are LOAD-BEARING on TPU, and must sit on the
    bf16 values THEMSELVES: XLA's excess-precision rule rewrites the
    convert round-trip f32(bf16(v)) -> v, folding the residual
    v - f32(bf16(v)) to zero (measured: split residual 0.0039 ~ 2^-8 on
    hardware, i.e. the packing silently degraded to one bf16 part; a
    barrier on the subtraction result is TOO LATE — the convert chain is
    folded before it). Same hazard family as ops/compensated.py.
    """
    v = jnp.asarray(v, jnp.float32)
    v0 = jax.lax.optimization_barrier(v.astype(jnp.bfloat16))
    r1 = v - v0.astype(jnp.float32)
    v1 = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    v2 = (r1 - v1.astype(jnp.float32)).astype(jnp.bfloat16)
    return v0, v1, v2


def _pack(scaled, sign: float, idx, norm_first: bool):
    """Shared body: rows (n, d) -> packed (n, 6d+6) bf16."""
    scaled = jnp.asarray(scaled, jnp.float32)
    n = scaled.shape[0]
    t = _split3(sign * _SQRT2 * scaled)
    norm = jnp.sum(scaled * scaled, axis=1, keepdims=True)  # fp32 |v|^2
    n0, n1, n2 = _split3(norm)
    ones = jnp.ones((n, 3), jnp.bfloat16)
    norms = jnp.concatenate([n0, n1, n2], axis=1)
    cross = jnp.concatenate([t[i] for i in idx], axis=1)
    tail = [norms, ones] if norm_first else [ones, norms]
    return jnp.concatenate([cross, *tail], axis=1)


def pack_dist_a(scaled):
    """A-side packing of delta-scaled rows; pair with pack_dist_b."""
    return _pack(scaled, -1.0, _A_IDX, norm_first=True)


def pack_dist_b(scaled):
    """B-side packing of delta-scaled rows.

    dot(pack_dist_a(a), pack_dist_b(b).T) == D2(a, b) to fp32 accuracy.
    """
    return _pack(scaled, +1.0, _B_IDX, norm_first=False)


def pad_lanes(packed, lanes: int = _LANE):
    """Zero-pad the packed lane dim to the MXU width (padding contributes
    exact zeros to the accumulator)."""
    w = packed.shape[1]
    if w > lanes:
        raise ValueError(f"packed width {w} > {lanes}; use the fp32 path")
    return jnp.pad(packed, ((0, 0), (0, lanes - w)))
