"""Multi-host runtime initialization (SURVEY.md S6 'Multi-host runtime').

The reference is single-process; multi-host here is JAX-native:
`jax.distributed.initialize()` + a mesh spanning all hosts' devices. No
custom transport — XLA collectives ride ICI within a slice and DCN across
hosts. This module is the thin, idempotent entry point.
"""
from __future__ import annotations

import os
from typing import Optional

_initialized = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed if a multi-host env is detected/specified.

    Autodetects standard TPU-pod env vars (handled inside JAX) when args
    are None; a plain single-host run is a no-op. Returns a summary dict.
    Safe to call more than once.
    """
    global _initialized
    import jax

    want_multi = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    )
    if want_multi and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "initialized_distributed": _initialized,
    }
