"""Device mesh + sharding rules.

The reference scales with DDP scaffolding only (SURVEY.md §2.2); the TPU-native
equivalent is a 2-D ``(data, model)`` mesh: batches shard over ``data`` (XLA
emits the psum gradient reduction), and the GPT's stacked layer weights
optionally shard Megatron-style over ``model`` (column-parallel c_attn/c_fc,
row-parallel c_proj) — GSPMD inserts the matching all-reduces over ICI.

30L/1024d fits a single chip, so tensor parallelism is a capability (mesh
model axis = 1 collapses every rule to replication), exercised by the
multi-chip CPU-mesh tests and the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def gpt_param_specs(params) -> dict:
    """PartitionSpec pytree for the GPT param tree (megatron-style over
    'model'; stacked layer dim always leading and unsharded)."""

    def spec_for(path: str, leaf) -> P:
        if "core/blocks/attn/c_attn/w" in path:
            return P(None, None, "model")          # (L, D, 3D) column
        if "core/blocks/attn/c_attn/b" in path:
            return P(None, "model")
        if "core/blocks/attn/c_proj/w" in path:
            return P(None, "model", None)          # (L, D, D) row
        if "core/blocks/mlp/c_fc/w" in path:
            return P(None, None, "model")
        if "core/blocks/mlp/c_fc/b" in path:
            return P(None, "model")
        if "core/blocks/mlp/c_proj/w" in path:
            return P(None, "model", None)
        return P()  # replicated

    return _map_with_path(params, spec_for)


def _map_with_path(tree, fn, path=""):
    if isinstance(tree, dict):
        return {k: _map_with_path(v, fn, f"{path}/{k}") for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [_map_with_path(v, fn, f"{path}/{i}") for i, v in enumerate(tree)]
        return type(tree)(out) if isinstance(tree, tuple) else out
    return fn(path, tree)


def shard_tree(tree, specs, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up (the TPU-native analogue of the reference's NCCL
    process-group init owned by the Coqui trainer; SURVEY.md §2.2).

    On Cloud TPU pods, ``jax.distributed.initialize()`` auto-discovers
    coordinates; arguments are for manual clusters. After this, ``make_mesh``
    spans all hosts' devices and per-host data loading uses
    ``jax.process_index()`` to shard the sample space.
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
    except Exception:
        pass  # single-process run
