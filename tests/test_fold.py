"""BN/stem folding parity: AssessNet(fold=True) == standard inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivosw_tpu.models.assess import ROI_SIZE, AssessNet, init_assess_variables
from ivosw_tpu.models.fold import fold_assess_variables


@pytest.fixture(scope="module")
def variables():
    v = init_assess_variables(jax.random.PRNGKey(0))
    # fresh init has mean=0/var=1 stats — perturb everything so the fold
    # actually has non-trivial affines to absorb
    key = jax.random.PRNGKey(1)

    def perturb(path, x):
        nonlocal key
        key, sub = jax.random.split(key)
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if name.endswith("mean"):
            return x + jax.random.normal(sub, x.shape) * 0.2
        if name.endswith("var"):
            return x * jnp.exp(jax.random.normal(sub, x.shape) * 0.3)
        if name.endswith("scale"):
            return x * jnp.exp(jax.random.normal(sub, x.shape) * 0.2)
        if name.endswith("bias"):
            return x + jax.random.normal(sub, x.shape) * 0.1
        return x

    return jax.tree_util.tree_map_with_path(perturb, v)


def test_folded_tree_matches_module_init(variables):
    folded = fold_assess_variables(variables)
    ref = AssessNet(fold=True).init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, ROI_SIZE, ROI_SIZE, 3), jnp.float32),
        jnp.zeros((1, ROI_SIZE, ROI_SIZE, 1), jnp.float32),
        train=False,
    )
    ref_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(folded)}
    assert ref_paths == got_paths


def test_folded_forward_parity(variables):
    rng = np.random.default_rng(0)
    tf_roi = jnp.asarray(rng.random((3, ROI_SIZE, ROI_SIZE, 3)), jnp.float32)
    tp_roi = jnp.asarray(rng.random((3, ROI_SIZE, ROI_SIZE, 1)), jnp.float32)

    base = AssessNet().apply(variables, tf_roi, tp_roi, train=False)
    folded = fold_assess_variables(variables)
    fast = AssessNet(fold=True).apply(folded, tf_roi, tp_roi, train=False)

    # both paths run the trunk in bf16; folding changes rounding order only
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(fast), rtol=0.05, atol=0.05
    )


def test_predict_clip_quality_dispatches_folded(variables):
    """predict_clip_quality routes folded trees to the folded encoder and
    matches the standard path on the full bbox→crop→score pipeline."""
    from ivosw_tpu.interact.recommend import predict_clip_quality

    rng = np.random.default_rng(2)
    t, o, h, w = 4, 2, 48, 64
    frames = rng.random((t, h, w, 3), dtype=np.float32)
    probs = np.zeros((t, o + 1, h, w), dtype=np.float32)
    probs[:, 1, 8:30, 10:40] = 0.9
    probs[:, 2, 20:44, 30:60] = 0.8

    base_q, base_s = predict_clip_quality(variables, frames, probs, o, chunk=4)
    folded = fold_assess_variables(variables)
    fast_q, fast_s = predict_clip_quality(folded, frames, probs, o, chunk=4)

    np.testing.assert_allclose(base_s, fast_s, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(base_q, fast_q, rtol=0.05, atol=0.05)


def test_fold_exact_in_f32(variables):
    """With an f32 trunk the fold is mathematically exact (tight tol).

    Precision is pinned to HIGHEST: TPU's default f32 convs run multi-pass
    bf16 internally, and folding the BN scale into the kernels changes
    which values get bf16-rounded — a backend artifact, not fold error
    (observed 2.4e-2 at default precision on v5e, <2e-4 at HIGHEST)."""
    import jax

    rng = np.random.default_rng(1)
    tf_roi = jnp.asarray(rng.random((2, ROI_SIZE, ROI_SIZE, 3)), jnp.float32)
    tp_roi = jnp.asarray(rng.random((2, ROI_SIZE, ROI_SIZE, 1)), jnp.float32)

    with jax.default_matmul_precision("highest"):
        base = AssessNet(dtype=jnp.float32).apply(
            variables, tf_roi, tp_roi, train=False
        )
        folded = fold_assess_variables(variables)
        fast = AssessNet(dtype=jnp.float32, fold=True).apply(
            folded, tf_roi, tp_roi, train=False
        )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(fast), rtol=2e-4, atol=2e-4
    )
