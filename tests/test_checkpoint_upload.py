"""Grouped host→device checkpoint upload (tunnel-wedge mitigation).

The single-burst ``jax.device_put(tree)`` restore wedged the tunnelled TPU
deterministically on HD-checkpoint resume (2026-08-19, faulthandler trace at
``train_vos.py`` ``int(tree["step"])``). ``load_pytree(device=False)`` +
``upload_pytree`` is the fix: host metadata is read before any device op and
the upload is serialized in bounded groups, each drained by a 4-byte fetch.
"""

import jax
import numpy as np

from ivosw_tpu.utils.checkpoint import load_pytree, save_pytree, upload_pytree


def test_load_pytree_host_mode_and_grouped_upload(tmp_path):
    tree = {
        "params": {"w": np.arange(12.0).reshape(3, 4), "b": np.ones((5,))},
        "step": np.int64(7),
    }
    path = str(tmp_path / "ckpt.orbax")
    save_pytree(path, tree)

    host = load_pytree(path, device=False)
    # every leaf stays numpy: reading step must not touch the device
    assert all(isinstance(x, np.ndarray) for x in jax.tree.leaves(host))
    assert int(host["step"]) == 7

    # default load still lands on device (eval paths rely on this: numpy
    # params re-upload ResNet-50 through the tunnel on EVERY jit call)
    dev = load_pytree(path)
    assert all(isinstance(x, jax.Array) for x in jax.tree.leaves(dev))

    # group_mb=0 forces a drain after every leaf — the worst-case sync path
    up = upload_pytree(host, group_mb=0)
    assert jax.tree.structure(up) == jax.tree.structure(host)
    for a, b in zip(jax.tree.leaves(up), jax.tree.leaves(host)):
        assert isinstance(a, jax.Array)
        np.testing.assert_array_equal(np.asarray(a), b)
