"""Device mesh + sharding layer.

The reference has NO parallelism of any kind (single CUDA GPU, DataParallel
commented out — SURVEY §2 #26/#27). The TPU-native equivalent is a thin
jax.sharding layer:

- 1-D ``('data',)`` mesh: data parallelism over replay batches (Q-updates),
  frames×objects (AssessNet scoring), and sequences (eval sweeps). Gradients
  reduce over ICI via the psum XLA inserts under jit+sharding.
- 2-D ``('data', 'model')`` mesh: adds tensor parallelism for AssessNet —
  conv/dense kernels shard on their output-channel axis, so every conv runs
  as a channel-sharded matmul with XLA-inserted collectives.

No custom communication layer is justified by this workload; everything
rides jit + NamedSharding.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        elif len(axis_names) == 2:
            # favour the data axis; model axis gets the largest divisor ≤ 4
            model = 1
            for cand in (4, 2, 1):
                if n % cand == 0 and cand <= n:
                    model = cand
                    break
            shape = (n // model, model)
        else:
            raise ValueError("provide an explicit shape for >2 axes")
    mesh_devices = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard every array's leading dim over the given mesh axis."""
    def _shard(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_shard, tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def assess_param_shardings(mesh: Mesh, variables, model_axis: str = "model"):
    """Tensor-parallel sharding rule for AssessNet variables.

    Conv kernels [kh, kw, cin, cout] and dense kernels [cin, cout] shard on
    cout over the model axis; biases/scales/stats shard on their channel dim
    when divisible, else replicate. XLA turns the channel-sharded convs into
    per-shard matmuls with all-gathers on the activations.
    """
    model_size = mesh.shape[model_axis]

    def rule(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim >= 2 and leaf.shape[-1] % model_size == 0:
            spec = P(*([None] * (leaf.ndim - 1)), model_axis)
        elif leaf.ndim == 1 and leaf.shape[0] % model_size == 0:
            spec = P(model_axis)
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, variables)


def apply_shardings(tree, shardings):
    return jax.tree.map(jax.device_put, tree, shardings)
