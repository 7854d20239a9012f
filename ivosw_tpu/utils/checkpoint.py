"""Checkpoint I/O: Orbax-native with torch ``.pt`` import fallback.

Capability parity with the reference's weights-only save/load helpers
(``utils/misc.py:42-115``), upgraded per the rebuild plan: native checkpoints
carry params (and can carry opt-state / step counters), while reference
``agent.pt`` / ``assess_net.pt`` files import transparently through
:mod:`ivosw_tpu.utils.torch_import` for parity runs.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_pytree(path: str, tree: Any) -> None:
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_pytree(path: str, device: bool = True) -> Optional[Any]:
    """Restore a pytree with every leaf as a HOST numpy array.

    Restoring as `jax.Array` replays the sharding recorded at save time,
    which fails outright when the checkpoint moves across topologies (e.g.
    saved on the tunnelled TPU, restored on a CPU mesh: the recorded device
    is absent and Orbax's sharding deserialization raises). So: restore
    topology-free numpy leaves, then upload the tree ONCE onto the default
    device. The upload matters — leaving numpy leaves makes every jit call
    re-transfer the full parameter set, and on the tunnelled TPU that
    turned a ~0.1 s scoring pass into ~30 s (host↔device transfers are
    the bottleneck here, CLAUDE.md).

    ``device=False`` returns the raw numpy tree — callers that need host
    metadata (e.g. a resume step counter) MUST read it before uploading:
    a device round-trip for a scalar right after a large upload is the
    exact op observed to wedge the tunnel (train_vos resume, 2026-08-19).
    """
    if not os.path.exists(path):
        return None
    import jax
    import numpy as np

    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    tree = ckptr.restore(path, restore_args=restore_args)
    if not device:
        return tree
    return upload_pytree(tree)


def upload_pytree(tree: Any, group_mb: int = 32) -> Any:
    """Host→device upload, serialized in ~``group_mb``-sized groups.

    A single ``jax.device_put`` over a ~100 MB checkpoint tree bursts every
    leaf transfer at once; on the tunnelled TPU that wedged the client
    deterministically (5/5 resume attempts, 2026-08-19: the first fetch
    after the burst blocked forever at zero CPU). Grouped uploads bound the
    outstanding transfer volume: after each group we fetch ONE scalar from
    the group's last leaf (``bench.py::_sync`` — `block_until_ready` does
    not synchronize over this tunnel) before issuing the next group.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves, treedef = jax.tree.flatten(tree)
    out, pending = [], 0
    for x in leaves:
        y = jax.device_put(x)
        out.append(y)
        pending += getattr(x, "nbytes", 0)
        if pending >= group_mb * 2**20 and getattr(y, "size", 0) > 0:
            np.asarray(jnp.reshape(y, (-1,))[0])  # drain the group
            pending = 0
    last = next((y for y in reversed(out) if getattr(y, "size", 0) > 0), None)
    if last is not None:
        np.asarray(jnp.reshape(last, (-1,))[0])
    return jax.tree.unflatten(treedef, out)


# ----------------------------------------------------------------- agent --
def save_agent_checkpoint(agent, ckpt_dir: str, epoch: Optional[int] = None) -> str:
    """Save policy-net params (+ opt state + step) as an Orbax checkpoint."""
    name = "agent" if epoch is None else f"agent_epoch_{epoch}"
    path = os.path.join(ckpt_dir, name + ".orbax")
    save_pytree(
        path,
        {
            "params": agent.params,
            "opt_state": agent.opt_state,
            "steps_done": agent.steps_done,
        },
    )
    return path


def load_agent_params(ckpt_dir: str):
    """Agent params from weights/agent.orbax, else from reference agent.pt."""
    path = os.path.join(ckpt_dir, "agent.orbax")
    tree = load_pytree(path)
    if tree is not None:
        return tree["params"]
    from ivosw_tpu.utils.torch_import import load_agent_checkpoint_pt

    return load_agent_checkpoint_pt(os.path.join(ckpt_dir, "agent.pt"))


def latest_agent_epoch(ckpt_dir: str) -> Optional[int]:
    """Highest N for which ``agent_epoch_N.orbax`` exists in ckpt_dir, else None.

    Used to resume a killed agent-training stage from its newest epoch
    snapshot (hosts are ephemeral — see scripts/run_round4.sh)."""
    import re

    best = None
    if os.path.isdir(ckpt_dir):
        for entry in os.listdir(ckpt_dir):
            m = re.fullmatch(r"agent_epoch_(\d+)\.orbax", entry)
            if m:
                n = int(m.group(1))
                best = n if best is None else max(best, n)
    return best


def clear_agent_epoch_snapshots(ckpt_dir: str) -> int:
    """Delete ``agent_epoch_N.orbax`` resume snapshots; returns count removed.

    Called right after the completion marker (plain ``agent.orbax``) is
    written: epoch snapshots must only ever exist for an IN-FLIGHT run.
    Leftover snapshots from a completed run made a later forced retrain
    compute ``start_epoch = last + 1 > num_epochs``, run ZERO epochs and
    silently rewrite ``agent.orbax`` from the stale snapshot (ADVICE r4)."""
    import re
    import shutil

    removed = 0
    if os.path.isdir(ckpt_dir):
        for entry in os.listdir(ckpt_dir):
            if re.fullmatch(r"agent_epoch_\d+\.orbax", entry):
                shutil.rmtree(os.path.join(ckpt_dir, entry), ignore_errors=True)
                removed += 1
    return removed


def restore_agent(agent, ckpt_dir: str, name: str = "agent") -> bool:
    """Full restore (params + opt state + step counter) when available.

    ``name`` selects the checkpoint file (``<name>.orbax``), e.g. an epoch
    snapshot ``agent_epoch_3``. target_params is a deep COPY of params:
    dqn_update_step donates the params buffers, so aliasing the two trees
    would leave target_params pointing at donated (deleted) arrays after the
    first update."""
    import jax
    import jax.numpy as jnp

    tree = load_pytree(os.path.join(ckpt_dir, name + ".orbax"))
    if tree is None:
        if name != "agent":
            return False  # epoch snapshots have no .pt fallback
        params = load_agent_params(ckpt_dir)
        if params is None:
            return False
        agent.params = params
        agent.target_params = jax.tree.map(jnp.copy, params)
        return True
    agent.params = tree["params"]
    agent.target_params = jax.tree.map(jnp.copy, tree["params"])
    # Orbax round-trips optax NamedTuple states as plain dicts; rebuild the
    # typed structure from a freshly-initialised template (leaf order is
    # stable: tuples by index, dict keys sorted = NamedTuple field order
    # for adam's count/mu/nu)
    template = agent.optimizer.init(agent.params)
    leaves = jax.tree.leaves(tree["opt_state"])
    agent.opt_state = jax.tree.unflatten(jax.tree.structure(template), leaves)
    agent.steps_done = int(tree["steps_done"])
    return True


# ------------------------------------------------------------- assessnet --
def save_assess_checkpoint(variables, ckpt_dir: str, epoch: Optional[int] = None) -> str:
    name = "assess_net" if epoch is None else f"assess_net_epoch_{epoch}"
    path = os.path.join(ckpt_dir, name + ".orbax")
    save_pytree(path, variables)
    return path


def load_assess_variables_ckpt(ckpt_dir: str):
    tree = load_pytree(os.path.join(ckpt_dir, "assess_net.orbax"))
    if tree is not None:
        return tree
    from ivosw_tpu.utils.torch_import import load_assess_checkpoint_pt

    return load_assess_checkpoint_pt(os.path.join(ckpt_dir, "assess_net.pt"))
