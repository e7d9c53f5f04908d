"""Iterative multinomial NUTS over GP hyperparameters.

North-star component (BASELINE.json: "NUTS/HMC over kernel hyperparameters,
chains sharded across hosts"). Built as a batched transition kernel for the
shared `adaptive_mcmc` driver (hmc.py), so NUTS chains get the same
cross-chain dual-averaging + mass-matrix warmup and the same shard_map
`chains`-axis scaling as HMC.

Algorithm: dynamic trajectory doubling with multinomial (progressive)
sampling and fine-grained U-turn detection, in the ITERATIVE formulation
(Phan et al., the NumPyro scheme): a trajectory of up to 2^max_depth - 1
leapfrog steps is built as a sequence of doublings; within each doubling
subtree the recursive algorithm's per-power-of-two-block U-turn checks are
reproduced with an O(max_depth) checkpoint buffer:

  leaf index i (0-based within the subtree):
    i even -> store (z, r) at checkpoint slot popcount(i >> 1)
    i odd  -> check U-turn between the current leaf and every checkpoint in
              [idx_max - trailing_ones(i) + 1, idx_max], idx_max =
              popcount(i >> 1) — exactly the aligned blocks the recursion
              would close at leaf i.

Everything is fixed-shape and lax.while_loop-based, so the whole kernel
vmaps over chains (lanes run in lockstep, masked once their trajectory
stops) and jits once.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu.inference.hmc import HMCConfig, adaptive_mcmc


def _trailing_ones(n):
    m = n + 1
    return jax.lax.population_count(jnp.bitwise_and(m, -m) - 1)


def _popcount(n):
    return jax.lax.population_count(n)


def make_nuts_step(logdensity, max_depth: int = 8,
                   divergence_threshold: float = 1000.0):
    """Batched NUTS transition kernel: (z, key, eps, inv_mass) -> ...

    Returns a function with the adaptive_mcmc step contract; accept_stat is
    the Stan-style mean Metropolis statistic over all visited leaves.
    """
    ld_grad = jax.value_and_grad(logdensity)

    def step_one(z0, key, eps, inv_mass):
        dim = z0.shape[0]
        dtype = z0.dtype
        k_mom, k_tree = jax.random.split(key)
        r0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
        ld0, g0 = ld_grad(z0)
        h0 = 0.5 * jnp.sum(inv_mass * r0 * r0) - ld0

        def turning(z_a, r_a, z_b, r_b):
            """U-turn between ordered states a (earlier) and b (later)."""
            dz = z_b - z_a
            return jnp.logical_or(
                jnp.dot(dz, inv_mass * r_a) < 0.0,
                jnp.dot(dz, inv_mass * r_b) < 0.0,
            )

        def leapfrog(z, r, g, direction):
            e = direction * eps
            r = r + 0.5 * e * g
            z = z + e * (inv_mass * r)
            ld, g = ld_grad(z)
            r = r + 0.5 * e * g
            return z, r, g, ld

        # trajectory state ---------------------------------------------------
        init = dict(
            z_minus=z0, r_minus=r0, g_minus=g0,
            z_plus=z0, r_plus=r0, g_plus=g0,
            z_prop=z0, logw=jnp.asarray(0.0, dtype),   # w relative to exp(-h0)
            depth=jnp.asarray(0, jnp.int32),
            stopped=jnp.asarray(False),
            diverged=jnp.asarray(False),
            sum_acc=jnp.asarray(0.0, dtype),
            n_leaves=jnp.asarray(0.0, dtype),
            key=k_tree,
        )

        def outer_cond(s):
            return jnp.logical_and(s["depth"] < max_depth,
                                   jnp.logical_not(s["stopped"]))

        def outer_body(s):
            key, k_dir, k_acc, k_sub = jax.random.split(s["key"], 4)
            go_right = jax.random.bernoulli(k_dir)
            direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
            z_start = jnp.where(go_right, s["z_plus"], s["z_minus"])
            r_start = jnp.where(go_right, s["r_plus"], s["r_minus"])
            g_start = jnp.where(go_right, s["g_plus"], s["g_minus"])
            n_sub = jnp.asarray(1, jnp.int32) << s["depth"]

            # --- build subtree of n_sub leaves iteratively ----------------
            sub_init = dict(
                z=z_start, r=r_start, g=g_start,
                z_prop=z_start, logw=jnp.asarray(-jnp.inf, dtype),
                leaf=jnp.asarray(0, jnp.int32),
                turned=jnp.asarray(False), div=jnp.asarray(False),
                z_first=z_start, r_first=r_start,   # first leaf of subtree
                z_ck=jnp.zeros((max_depth, dim), dtype),
                r_ck=jnp.zeros((max_depth, dim), dtype),
                sum_acc=jnp.asarray(0.0, dtype),
                key=k_sub,
            )

            def sub_cond(t):
                ok = jnp.logical_not(jnp.logical_or(t["turned"], t["div"]))
                return jnp.logical_and(t["leaf"] < n_sub, ok)

            def sub_body(t):
                key, k_mult = jax.random.split(t["key"])
                z, r, g, ld = leapfrog(t["z"], t["r"], t["g"], direction)
                h = 0.5 * jnp.sum(inv_mass * r * r) - ld
                dh = h - h0
                dh = jnp.where(jnp.isfinite(dh), dh, jnp.inf)
                div = dh > divergence_threshold
                logw_leaf = -dh
                logw_new = jnp.logaddexp(t["logw"], logw_leaf)
                take = (
                    jax.random.uniform(k_mult, dtype=dtype)
                    < jnp.exp(logw_leaf - logw_new)
                )
                z_prop = jnp.where(take, z, t["z_prop"])
                leaf = t["leaf"]
                is_first = leaf == 0
                z_first = jnp.where(is_first, z, t["z_first"])
                r_first = jnp.where(is_first, r, t["r_first"])
                # --- checkpoint store / U-turn checks ---------------------
                idx_max = _popcount(leaf >> 1)
                even = (leaf & 1) == 0
                z_ck = jnp.where(
                    even,
                    t["z_ck"].at[idx_max].set(z),
                    t["z_ck"],
                )
                r_ck = jnp.where(
                    even,
                    t["r_ck"].at[idx_max].set(r),
                    t["r_ck"],
                )
                idx_min = idx_max - (_trailing_ones(leaf) - 1)

                def check_turn(_):
                    slots = jnp.arange(max_depth)
                    active = jnp.logical_and(slots >= idx_min, slots <= idx_max)
                    # ordered by direction: checkpoint is EARLIER, (z, r) later
                    def one(slot):
                        za = z_ck[slot] * 1.0
                        ra = r_ck[slot]
                        dz = (z - za) * direction
                        return jnp.logical_or(
                            jnp.dot(dz, inv_mass * ra) < 0.0,
                            jnp.dot(dz, inv_mass * r) < 0.0,
                        )
                    turns = jax.vmap(one)(slots)
                    return jnp.any(jnp.logical_and(turns, active))

                turned = jnp.where(even, False, check_turn(None))
                acc = jnp.minimum(1.0, jnp.exp(-dh))
                return dict(
                    z=z, r=r, g=g, z_prop=z_prop,
                    logw=logw_new, leaf=leaf + 1,
                    turned=turned, div=div,
                    z_first=z_first, r_first=r_first,
                    z_ck=z_ck, r_ck=r_ck,
                    sum_acc=t["sum_acc"] + acc,
                    key=key,
                )

            t = jax.lax.while_loop(sub_cond, sub_body, sub_init)
            sub_ok = jnp.logical_not(jnp.logical_or(t["turned"], t["div"]))

            # --- merge subtree into trajectory ----------------------------
            # biased progressive sampling
            take_sub = (
                jax.random.uniform(k_acc, dtype=dtype)
                < jnp.exp(jnp.minimum(t["logw"] - s["logw"], 0.0))
            )
            z_prop = jnp.where(jnp.logical_and(sub_ok, take_sub),
                               t["z_prop"], s["z_prop"])
            logw = jnp.where(sub_ok, jnp.logaddexp(s["logw"], t["logw"]),
                             s["logw"])
            z_minus = jnp.where(go_right, s["z_minus"], t["z"])
            r_minus = jnp.where(go_right, s["r_minus"], t["r"])
            g_minus = jnp.where(go_right, s["g_minus"], t["g"])
            z_plus = jnp.where(go_right, t["z"], s["z_plus"])
            r_plus = jnp.where(go_right, t["r"], s["r_plus"])
            g_plus = jnp.where(go_right, t["g"], s["g_plus"])
            traj_turn = turning(z_minus, r_minus, z_plus, r_plus)
            stopped = jnp.logical_or(
                jnp.logical_not(sub_ok), traj_turn
            )
            return dict(
                z_minus=jnp.where(sub_ok, z_minus, s["z_minus"]),
                r_minus=jnp.where(sub_ok, r_minus, s["r_minus"]),
                g_minus=jnp.where(sub_ok, g_minus, s["g_minus"]),
                z_plus=jnp.where(sub_ok, z_plus, s["z_plus"]),
                r_plus=jnp.where(sub_ok, r_plus, s["r_plus"]),
                g_plus=jnp.where(sub_ok, g_plus, s["g_plus"]),
                z_prop=z_prop, logw=logw,
                depth=s["depth"] + 1,
                stopped=stopped,
                diverged=jnp.logical_or(s["diverged"], t["div"]),
                sum_acc=s["sum_acc"] + t["sum_acc"],
                n_leaves=s["n_leaves"] + t["leaf"].astype(dtype),
                key=key,
            )

        s = jax.lax.while_loop(outer_cond, outer_body, init)
        accept_stat = s["sum_acc"] / jnp.maximum(s["n_leaves"], 1.0)
        return s["z_prop"], accept_stat, s["diverged"]

    def step(z, key, eps, inv_mass):
        keys = jax.random.split(key, z.shape[0])
        return jax.vmap(
            lambda zz, kk: step_one(zz, kk, eps, inv_mass)
        )(z, keys)

    return step


def nuts_sample(
    key,
    logdensity,
    z0,
    cfg: HMCConfig = HMCConfig(),
    *,
    max_depth: int = 8,
    axis_name: Optional[str] = None,
):
    """NUTS with the shared cross-chain adaptive warmup (see hmc.py).

    cfg.n_leapfrog is ignored (trajectory length is dynamic, capped at
    2^max_depth - 1 leapfrog steps).
    """
    step = make_nuts_step(
        logdensity, max_depth=max_depth,
        divergence_threshold=cfg.divergence_threshold,
    )
    return adaptive_mcmc(key, step, jnp.asarray(z0), cfg, axis_name=axis_name)


def nuts_continue(
    key,
    logdensity,
    z,
    eps,
    inv_mass,
    n_samples: int,
    *,
    max_depth: int = 8,
    divergence_threshold: float = 1000.0,
    axis_name: Optional[str] = None,
):
    """NUTS sampling-only continuation with a frozen adapted metric.

    Exact-resume counterpart to nuts_sample (see hmc.mcmc_continue):
    chaining k dispatches of this reproduces one long sampling scan, which
    is how production-length chains run on hardware that bounds a single
    device execution (docs/samplers.md long-chain table).
    Returns (samples, stats, next_key).
    """
    from gp_emu_uqsa_tpu.inference.hmc import mcmc_continue

    step = make_nuts_step(
        logdensity, max_depth=max_depth,
        divergence_threshold=divergence_threshold,
    )
    return mcmc_continue(key, step, jnp.asarray(z), eps, inv_mass, n_samples,
                         axis_name=axis_name)
