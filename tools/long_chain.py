"""Production-length sampler chains on hardware via chunked dispatches.

VERDICT r4 weak #5 / next-step #6: the remote-TPU relay kills any single
device execution over ~20-40 s, so on-chip sampler evidence was limited to
32+32-draw runs. This harness strings a >=512-draw chain out of many small
dispatches, each safely under the ceiling:

  dispatch 0:                adaptive warmup (nuts_sample / hmc_sample,
                             depth-capped) -> (z, eps, inv_mass)
  dispatches 1..K:           sampling-only continuation segments
                             (nuts_continue / hmc_continue) with the frozen
                             adapted metric

Between dispatches the full chain state round-trips through
utils.checkpoint.save_hmc_state/load_hmc_state and each segment's draws
land on disk, so the run RESUMES from the last completed segment after any
interruption (relay crash, preemption, rerun) — the checkpoint/resume
subsystem exercised as production would.

Worst-case per-dispatch on-device time at the default config (n=1024, d=8,
64 chains, measured ~39 ms per 64-chain batched leapfrog on v5e):
  warmup:   24 draws x <=15 leapfrogs (depth 4)  ~ 14 s worst case
  segment:   8 draws x <=31 leapfrogs (depth 5)  ~ 10 s worst case
Typical post-warmup trajectories are depth 3-4, so segments usually run
in 2-5 s.

Run: python tools/long_chain.py [nuts|hmc] [target_draws]
Writes LONGCHAIN_<sampler>.json at the repo root and prints a summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def long_chain(sampler: str = "nuts", n: int = 1024, d: int = 8,
               n_chains: int = 64, n_warmup: int = 24,
               warmup_max_depth: int = 4, max_depth: int = 5,
               n_leapfrog: int = 8, segment_draws: int = 8,
               target_draws: int = 512, ckpt_dir: str | None = None,
               message: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from gp_emu_uqsa_tpu.inference.hmc import (
        HMCConfig, ess, hmc_continue, hmc_sample, make_gp_logdensity,
        split_rhat,
    )
    from gp_emu_uqsa_tpu.inference.nuts import nuts_continue, nuts_sample
    from gp_emu_uqsa_tpu.utils.checkpoint import load_hmc_state, save_hmc_state

    ckpt_dir = ckpt_dir or os.path.join(REPO, f"_longchain_{sampler}")
    os.makedirs(ckpt_dir, exist_ok=True)
    state_path = os.path.join(ckpt_dir, "state")

    from gp_emu_uqsa_tpu.utils.roofline import gp_test_posterior

    x, y, h, mle_cfg = gp_test_posterior(n, d)
    ld = make_gp_logdensity(x, y, h, mle_cfg)

    n_segments = -(-target_draws // segment_draws)
    # resume position comes from the CHECKPOINT's segments_done, not the
    # segment files: a crash between np.save(seg_k) and save_hmc_state
    # would otherwise make the rerun replay segment k bit-exactly but
    # save it as segment k+1 — duplicated draws in the final chain
    # (code-review r5b finding #1). With meta as the authority, that
    # crash window just re-runs segment k from its pre-segment state and
    # overwrites seg_k.npy with identical content.
    start_seg = 0
    if os.path.exists(state_path + ".npz"):
        try:
            import json as _json

            start_seg = int(_json.loads(
                open(state_path + ".json").read()).get("segments_done", 0))
        except (OSError, ValueError):
            start_seg = 0

    if start_seg == 0 or not os.path.exists(state_path + ".npz"):
        # --- warmup dispatch ---------------------------------------------
        cfg = HMCConfig(n_warmup=n_warmup, n_samples=1,
                        n_leapfrog=n_leapfrog)
        z0 = jnp.zeros((n_chains, d), jnp.float32)
        t0 = time.perf_counter()
        if sampler == "nuts":
            warm = jax.jit(lambda k: nuts_sample(
                k, ld, z0, cfg, max_depth=warmup_max_depth))
        else:
            warm = jax.jit(lambda k: hmc_sample(k, ld, z0, cfg))
        samples, stats = warm(jax.random.key(0))
        z = samples[:, -1]
        float(z[-1, -1])
        warm_s = time.perf_counter() - t0
        save_hmc_state(state_path, z, stats["step_size"], stats["inv_mass"],
                       jax.random.key(1),
                       meta={"sampler": sampler, "segments_done": 0,
                             "warmup_seconds": warm_s})
        start_seg = 0
        if message:
            print(f"[warmup] {n_warmup} draws in {warm_s:.1f}s "
                  f"(incl. compile), eps={float(stats['step_size']):.4g}",
                  flush=True)

    z, eps, im, key, meta = load_hmc_state(state_path)
    cfg_seg = HMCConfig(n_leapfrog=n_leapfrog)
    # EVERY operand of the timed jit travels as an array arg — including
    # the posterior's x/y/h, which make_gp_logdensity otherwise
    # closure-captures and re-stages per dispatch through the
    # remote-device link (CLAUDE.md timing rule; code-review r5b #2)
    if sampler == "nuts":
        seg_fn = jax.jit(lambda k, z, eps, im, x, y, h: nuts_continue(
            k, make_gp_logdensity(x, y, h, mle_cfg), z, eps, im,
            segment_draws, max_depth=max_depth))
    else:
        seg_fn = jax.jit(lambda k, z, eps, im, x, y, h: hmc_continue(
            k, make_gp_logdensity(x, y, h, mle_cfg), z, eps, im,
            segment_draws, cfg_seg))

    seg_times = []
    accepts = []
    for seg in range(start_seg, n_segments):
        t0 = time.perf_counter()
        zs, seg_stats, key = seg_fn(key, z, eps, im, x, y, h)
        z = zs[:, -1]
        float(z[-1, -1])              # host sync: one dispatch per segment
        dt = time.perf_counter() - t0
        seg_times.append(dt)
        accepts.append(float(seg_stats["accept_rate"]))
        np.save(os.path.join(ckpt_dir, f"seg{seg}.npy"), np.asarray(zs))
        save_hmc_state(state_path, z, eps, im, key,
                       meta={"sampler": sampler, "segments_done": seg + 1})
        if message:
            print(f"[seg {seg + 1}/{n_segments}] {segment_draws} draws in "
                  f"{dt:.2f}s accept={accepts[-1]:.3f}", flush=True)

    draws = np.concatenate(
        [np.load(os.path.join(ckpt_dir, f"seg{k}.npy"))
         for k in range(n_segments)], axis=1)
    e = ess(draws)
    rhat = np.asarray(split_rhat(jnp.asarray(draws)))
    total_sampling_s = float(np.sum(seg_times)) if seg_times else None
    out = {
        "sampler": sampler,
        "device": str(__import__("jax").devices()[0]),
        "n_train": n, "d": d, "n_chains": n_chains,
        "draws_per_chain": int(draws.shape[1]),
        "total_draws": int(draws.shape[0] * draws.shape[1]),
        "segments": n_segments, "segment_draws": segment_draws,
        "max_depth": max_depth if sampler == "nuts" else None,
        "n_leapfrog": n_leapfrog if sampler == "hmc" else None,
        "resumed_from_segment": start_seg,
        "seconds_sampling_this_run": (round(total_sampling_s, 2)
                                      if total_sampling_s else None),
        "max_segment_seconds": (round(max(seg_times), 2)
                                if seg_times else None),
        "samples_per_s_per_chip": (
            round(n_chains * segment_draws * len(seg_times)
                  / total_sampling_s, 1)
            if seg_times and total_sampling_s else None),
        "min_ess": round(float(np.min(e)), 1),
        "median_ess": round(float(np.median(e)), 1),
        "min_ess_per_s": (round(float(np.min(e)) * len(seg_times)
                                / n_segments / total_sampling_s, 2)
                          if seg_times and total_sampling_s else None),
        "rhat_max": round(float(np.max(rhat)), 4),
        "mean_accept": round(float(np.mean(accepts)), 3) if accepts else None,
    }
    return out


if __name__ == "__main__":
    sampler = sys.argv[1] if len(sys.argv) > 1 else "nuts"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    res = long_chain(sampler=sampler, target_draws=target)
    path = os.path.join(REPO, f"LONGCHAIN_{sampler}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
