"""Device-mesh setup and sharding helpers.

Replaces the reference's SLURM-array file sharding (SURVEY.md §5.8 — the
reference has no collective backend at all) with a jax.sharding Mesh:
  * axis "data"  — frames / proposals / scenes fan out (the reference's
    array-job dimension);
  * axis "model" — the retrieval feature bank and template banks shard here;
    top-k NN search runs shard-local and reduces over ICI.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched multi-host (env-driven,
    idempotent). Single-host / single-chip runs are a no-op."""
    if os.environ.get("FREEPOSE_COORDINATOR"):
        try:
            jax.distributed.initialize(
                coordinator_address=os.environ["FREEPOSE_COORDINATOR"],
                num_processes=int(os.environ.get("FREEPOSE_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("FREEPOSE_PROCESS_ID", "0")),
            )
        except RuntimeError:
            pass  # already initialized


@lru_cache(maxsize=None)
def make_mesh(data: int | None = None, model: int | None = None) -> Mesh:
    """Create a (data, model) mesh over all addressable devices.

    Defaults: all devices on the model axis (bank sharding dominates memory),
    data = 1. Pass explicit sizes for mixed layouts (e.g. data=2, model=4 on
    a v5p-8).
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    if data is None and model is None:
        data, model = 1, n
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def pad_bank_rows(bank: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Zero-pad bank rows to a multiple of the model-axis size (real banks —
    e.g. the 46,037-mesh Objaverse bank — don't divide evenly). Zero rows
    score ≤ 0 against normalized queries and never enter the top-k for
    normalized banks."""
    n_shards = mesh.shape["model"]
    n = bank.shape[0]
    pad = (-n) % n_shards
    if pad:
        bank = np.concatenate([bank, np.zeros((pad,) + bank.shape[1:], bank.dtype)])
    return bank


def shard_bank(bank, mesh: Mesh):
    """Place a [M, D] feature bank sharded along rows over the model axis
    (rows must be a multiple of the axis size — see pad_bank_rows)."""
    if bank.shape[0] % mesh.shape["model"]:
        bank = pad_bank_rows(np.asarray(bank), mesh)
    return jax.device_put(bank, NamedSharding(mesh, P("model", None)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch(x, mesh: Mesh):
    """Shard a leading batch dimension over the data axis."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))
