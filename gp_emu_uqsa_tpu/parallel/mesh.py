"""Device-mesh construction for the GP engine's parallel axes.

The engine's parallelism vocabulary (SURVEY.md S3 parallelism inventory):
  chains   - HMC chains / MLE restarts (the data-parallel analog)
  data     - prediction points / validation batches (batch sharding)
  mr, mc   - 2D model axes for sharded dense linear algebra
             (block-cyclic kernel build + distributed Cholesky)

`make_mesh` builds a Mesh over the available devices with a chosen shape;
axes of size 1 are legal and let the same program run single-chip.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict[str, int] | None = None, *, devices=None) -> Mesh:
    """Build a Mesh. shape maps axis name -> size; default all on 'chains'.

    Example: make_mesh({"chains": 4, "data": 2}) on 8 devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"chains": len(devices)}
    sizes = list(shape.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {int(np.prod(sizes))} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, axis: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis))
