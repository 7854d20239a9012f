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
- Sequence parallelism (frame axis): :func:`frame_sharded_score_clip` shards
  a clip's T axis over the mesh for the fused QA scoring pass — the TPU
  answer to clips that outgrow one chip (SURVEY §5 long-context).

No custom communication layer is justified by this workload; everything
rides jit + NamedSharding + shard_map.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
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


@functools.lru_cache(maxsize=None)
def _sharded_score(mesh: Mesh, axis: str, impl: str, folded: bool):
    """shard_map-wrapped scoring fn, cached per (mesh, axis, impl, folded).

    Building the shard_map wrapper (over a fresh functools.partial) on every
    call defeats JAX's trace cache — each call re-traced AND re-compiled the
    whole ResNet program (~13 s/call measured on the CPU mesh), turning the
    production sequence-parallel path into a recompile per chunk. Caching
    the callable restores the compile-once-per-shape contract the docstring
    promises. Mesh is hashable, so the cache key is exact.
    """
    from ivosw_tpu.models.assess import score_clip, score_clip_folded

    score = score_clip_folded if folded else score_clip
    # jit the shard_map wrapper: eager shard_map dispatch re-traces every
    # call (measured 13 s/call vs 2.4 s single-device on the CPU mesh);
    # under jit the call hits the C++ fast path and compiles once per shape
    return jax.jit(
        shard_map(
            functools.partial(score, impl=impl),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )
    )


def frame_sharded_score_clip(
    mesh: Mesh,
    assess_variables,
    frames,
    probs,
    obj_valid,
    axis: str = "data",
    impl: str = "auto",
):
    """Sequence-parallel fused QA scoring: shard the clip's frame axis.

    The reference scores frames through a per-object host loop on one GPU
    (`utils/utils_agent.py:103-121`); its only answer to long clips is to
    subsample them (SURVEY §5). The TPU-native answer is to shard T over
    ICI-connected chips: scoring is per-(frame, object) independent, so
    under ``shard_map`` each chip crops+encodes its own frame slab with
    replicated AssessNet params and the only communication is the [T, O]
    result gather XLA inserts at the output. T is padded device-side to a
    multiple of the mesh axis and the pad rows dropped.

    frames: [T, H, W, 3]; probs: [T, O, H, W] (background already dropped);
    obj_valid: [O]. Returns [T, O] scores identical (bf16 tolerance) to the
    single-device :func:`ivosw_tpu.models.assess.score_clip`.
    """
    from ivosw_tpu.models.assess import score_clip, score_clip_folded

    # BN-folded trees carry the fused 4-channel stem and no batch_stats —
    # same routing rule as interact/recommend.py::predict_clip_quality
    folded = "conv_stem" in assess_variables.get("params", {})

    n = mesh.shape[axis]
    t = frames.shape[0]
    pad = (-t) % n
    if pad:
        frames = jnp.pad(frames, [(0, pad)] + [(0, 0)] * 3)
        probs = jnp.pad(probs, [(0, pad)] + [(0, 0)] * 3)

    sharded = _sharded_score(mesh, axis, impl, folded)
    frames = jax.device_put(frames, NamedSharding(mesh, P(axis, None, None, None)))
    probs = jax.device_put(probs, NamedSharding(mesh, P(axis, None, None, None)))
    return sharded(assess_variables, frames, probs, obj_valid)[:t]
