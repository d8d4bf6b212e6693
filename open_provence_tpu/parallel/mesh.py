"""Device mesh + sharding helpers.

This is new first-class surface the reference lacks (SURVEY §2.4, §5.8): the
reference trains single-GPU; multi-device here means a
``jax.sharding.Mesh`` over ICI with pjit-sharded steps and XLA collectives.

Axes:
* ``data``  — batch (pair) dimension; gradients all-reduce over it,
* ``model`` — optional tensor-parallel axis for the larger checkpoints
  (attention heads / MLP intermediate sharding).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data: int | None = None,
    model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"Mesh {data}x{model} needs {data * model} devices, have {n}"
        )
    mesh_devices = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pair/batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(path: tuple[str, ...], leaf) -> P:
    """Partition spec for a parameter leaf under (data, model).

    Tensor-parallel layout for the ModernBERT tree:
    * attn.Wqkv kernel [H, 3H]   → shard output dim over model (head split)
    * attn.Wo kernel [H, H]      → shard input dim over model
    * mlp.Wi kernel [H, 2I]      → shard output dim over model
    * mlp.Wo kernel [I, H]       → shard input dim over model
    * embeddings / norms / heads → replicated
    """
    names = [str(p) for p in path]
    joined = "/".join(names)
    if getattr(leaf, "ndim", 0) == 2:
        if "attn/Wqkv/kernel" in joined or "mlp/Wi/kernel" in joined:
            return P(None, MODEL_AXIS)
        if "attn/Wo/kernel" in joined or "mlp/Wo/kernel" in joined:
            return P(MODEL_AXIS, None)
    return P()


def shard_params(params, mesh: Mesh, *, tensor_parallel: bool = False):
    """Place params on the mesh — replicated, or TP-sharded when requested."""

    def _place(path, leaf):
        spec = param_sharding_rules(tuple(k.key for k in path), leaf) if tensor_parallel else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_place, params)
