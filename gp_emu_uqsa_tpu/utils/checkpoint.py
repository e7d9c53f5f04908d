"""Checkpoint/resume for emulators and HMC chain state.

The reference's checkpoint mechanism is the written-back beliefs file
(SURVEY.md S7.4) — we keep that for compatibility (Emulator.updated_beliefs)
and add a binary checkpoint for the things text files can't hold losslessly:
exact hyperparameters, RNG keys, HMC chain positions / step size / mass
matrix, so a preempted run resumes bit-exactly.

Format: a single .npz (portable, no orbax dependency for host-side state)
plus a JSON sidecar of metadata. Arrays are pulled to host; restoring
re-device-puts lazily on first use.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu.kernels import GPParams


def save_emulator(path, emul, *, extra: dict | None = None) -> None:
    """Checkpoint an Emulator's trained state + data provenance."""
    path = Path(path)
    arrays = {
        "x_all": np.asarray(emul.splits.x_all),
        "y_all": np.asarray(emul.splits.y_all),
        "order": np.asarray(emul.splits.order),
    }
    if emul.params is not None:
        arrays["log_delta"] = np.asarray(emul.params.log_delta)
        arrays["log_sigma2"] = np.asarray(emul.params.log_sigma2)
        arrays["log_nugget"] = np.asarray(emul.params.log_nugget)
    meta = {
        "tv_config": list(emul.splits.tv_config),
        "v_ranges": [list(r) for r in emul.splits.v_ranges],
        "minmax": emul.splits.minmax,
        "n_folded": emul.n_folded,
        "mode": emul.mle_config.mode,
        "family": emul.mle_config.family,
        "nugget": emul.mle_config.nugget,
        "train_nugget": emul.mle_config.train_nugget,
        "include_const": emul.spec.include_const,
        "linear_dims": list(emul.spec.linear_dims),
        "power_terms": [list(t) for t in emul.spec.power_terms],
        "active": emul.active,
        "extra": extra or {},
    }
    np.savez(path.with_suffix(".npz"), **arrays)
    path.with_suffix(".json").write_text(json.dumps(meta, indent=1))


def load_emulator(path):
    """Restore an Emulator checkpoint; refits the posterior state."""
    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import BasisSpec, basis_matrix
    from gp_emu_uqsa_tpu.dataio import DataSplits
    from gp_emu_uqsa_tpu.emulator import Emulator
    from gp_emu_uqsa_tpu.inference import MLEConfig

    path = Path(path)
    arrays = np.load(path.with_suffix(".npz"))
    meta = json.loads(path.with_suffix(".json").read_text())
    splits = DataSplits(
        arrays["x_all"], arrays["y_all"], arrays["order"],
        meta["minmax"], tuple(meta["tv_config"]),
        [tuple(r) for r in meta["v_ranges"]],
    )
    spec = BasisSpec(
        meta["include_const"], tuple(meta["linear_dims"]),
        tuple(tuple(t) for t in meta.get("power_terms", [])),
    )
    family = meta.get("family", "gaussian")
    emul = Emulator(
        splits, spec, meta["active"],
        MLEConfig(
            mode=meta["mode"], family=family,
            nugget=meta.get("nugget", 1e-8),
            train_nugget=meta.get("train_nugget", False),
        ),
        n_folded=meta["n_folded"],
    )
    if "log_delta" in arrays:
        emul.params = GPParams(
            jnp.asarray(arrays["log_delta"]),
            jnp.asarray(arrays["log_sigma2"]),
            jnp.asarray(arrays["log_nugget"]),
        )
        x, y, h = emul.train_view()
        emul.state = gp.fit(emul.params, x, y, h, mode=meta["mode"],
                            family=family)
    return emul


def save_hmc_state(path, z, step_size, inv_mass, key, *, meta=None) -> None:
    """Checkpoint HMC chain state for preemption-safe resume."""
    path = Path(path)
    np.savez(
        path.with_suffix(".npz"),
        z=np.asarray(z),
        step_size=np.asarray(step_size),
        inv_mass=np.asarray(inv_mass),
        key=np.asarray(jax.random.key_data(key)),
    )
    path.with_suffix(".json").write_text(json.dumps(meta or {}))


def load_hmc_state(path):
    path = Path(path)
    d = np.load(path.with_suffix(".npz"))
    key = jax.random.wrap_key_data(jnp.asarray(d["key"]))
    meta = json.loads(path.with_suffix(".json").read_text())
    return (
        jnp.asarray(d["z"]), jnp.asarray(d["step_size"]),
        jnp.asarray(d["inv_mass"]), key, meta,
    )
