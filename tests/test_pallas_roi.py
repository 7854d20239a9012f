"""Pallas ROI kernel: interpreter-mode parity with the XLA einsum crop."""

import numpy as np
import pytest


def test_roi_crop_pallas_interpret_parity():
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip(
            "interpret-mode executes op-by-op; pathological over the TPU "
            "tunnel — run via scripts/test_cpu.sh"
        )
    import jax.numpy as jnp

    from ivosw_tpu.kernels.roi_pallas import roi_crop_pallas
    from ivosw_tpu.ops.roi import mask_to_yxhw, roi_crop

    rng = np.random.default_rng(0)
    b, h, w, c = 3, 96, 128, 4
    img = rng.random((b, h, w, c)).astype(np.float32)
    mask = np.zeros((b, h, w), np.float32)
    mask[0, 10:60, 12:100] = 1.0
    mask[1, 40:90, 5:70] = 1.0
    # item 2: empty mask -> whole-image box
    yxhw = mask_to_yxhw(jnp.asarray(mask), min_side=32.0)

    ref = np.asarray(roi_crop(jnp.asarray(img), yxhw, 64, dtype=jnp.float32))
    out = np.asarray(
        roi_crop_pallas(jnp.asarray(img), yxhw, 64, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_assess_fused_crop_matches_separate():
    """assess_forward's fused C=4 crop equals separate 3ch+1ch crops."""
    import jax.numpy as jnp

    from ivosw_tpu.ops.roi import mask_to_yxhw, roi_crop

    rng = np.random.default_rng(1)
    b, h, w = 2, 80, 112
    tf = rng.random((b, h, w, 3)).astype(np.float32)
    tp = rng.random((b, h, w)).astype(np.float32)
    tb = mask_to_yxhw(jnp.asarray((tp > 0.5).astype(np.float32)), scale=1.5)

    fused = np.asarray(
        roi_crop(
            jnp.concatenate([jnp.asarray(tf), jnp.asarray(tp)[..., None]], -1),
            tb,
            64,
            dtype=jnp.float32,
        )
    )
    f_sep = np.asarray(roi_crop(jnp.asarray(tf), tb, 64, dtype=jnp.float32))
    p_sep = np.asarray(roi_crop(jnp.asarray(tp)[..., None], tb, 64, dtype=jnp.float32))
    np.testing.assert_allclose(fused[..., :3], f_sep, atol=1e-5)
    np.testing.assert_allclose(fused[..., 3:], p_sep, atol=1e-5)
