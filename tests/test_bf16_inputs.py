"""bf16 input residency (cfg.assess_net.bf16_inputs).

The scoring path's big inputs (per-sequence frames, adapter prob maps) may
be kept device-resident in bf16: the encoder consumes bf16 crops either
way, so the cast only moves rounding from crop time to storage time while
halving the frame upload and every per-round HBM read. These tests pin the
two safety claims made in config.py: scores drift within bf16 tolerance,
and masks/metrics (computed before the cast) do not move at all.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_labels_invariant_and_probs_dtype(jnp):
    from ivosw_tpu.models.vos.layers import labels_and_probs

    rng = np.random.default_rng(0)
    prob_maps = jnp.asarray(rng.random((3, 2, 16, 24)), jnp.float32)
    labels32, all_p32 = labels_and_probs(prob_maps)
    labels16, all_p16 = labels_and_probs(prob_maps, dtype=jnp.bfloat16)
    assert all_p32.dtype == jnp.float32
    assert all_p16.dtype == jnp.bfloat16
    # masks are computed from the f32 prob_maps BEFORE the cast
    np.testing.assert_array_equal(np.asarray(labels32), np.asarray(labels16))
    np.testing.assert_allclose(
        np.asarray(all_p16, np.float32), np.asarray(all_p32), atol=4e-3
    )


def test_score_clip_bf16_inputs_close(jnp):
    import jax

    from ivosw_tpu.models.assess import init_assess_variables, score_clip_folded
    from ivosw_tpu.models.fold import fold_assess_variables

    rng = np.random.default_rng(1)
    t, o, h, w = 3, 2, 48, 64
    frames = jnp.asarray(rng.random((t, h, w, 3)), jnp.float32)
    probs = jnp.asarray(rng.random((t, o, h, w)), jnp.float32)
    obj_valid = jnp.ones((o,), jnp.float32)
    folded = fold_assess_variables(init_assess_variables(jax.random.PRNGKey(0)))

    s32 = np.asarray(score_clip_folded(folded, frames, probs, obj_valid))
    s16 = np.asarray(
        score_clip_folded(
            folded,
            frames.astype(jnp.bfloat16),
            probs.astype(jnp.bfloat16),
            obj_valid,
        )
    )
    assert np.isfinite(s16).all()
    # the encoder is bf16 either way; storage-dtype drift stays small
    np.testing.assert_allclose(s16, s32, atol=3e-2)


def test_backbone_factory_threads_qa_dtype(jnp):
    from ivosw_tpu.core.config import Config
    from ivosw_tpu.data.registry import SequenceRegistry
    from ivosw_tpu.eval.backbones import build_backbone

    registry = SequenceRegistry.synthetic(
        ["bf-a"], num_frames=2, image_size=(24, 32), num_objects=1, seed=0
    )
    cfg = Config(vos="tapnet")
    cfg.assess_net.bf16_inputs = True
    adapter = build_backbone(cfg, registry)
    assert adapter.qa_dtype == jnp.bfloat16
    cfg.assess_net.bf16_inputs = False
    adapter = build_backbone(cfg, registry)
    assert adapter.qa_dtype == jnp.float32
