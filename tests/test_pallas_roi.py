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


def test_roi_crop_pairs_pallas_interpret_parity():
    """Pair-indexed T×O pallas kernel == einsum fallback path."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("interpret mode: run via scripts/test_cpu.sh")
    import jax.numpy as jnp

    from ivosw_tpu.kernels.roi_pallas import roi_crop_pairs, roi_crop_pairs_pallas
    from ivosw_tpu.ops.roi import mask_to_yxhw

    rng = np.random.default_rng(2)
    t, o, h, w = 3, 2, 96, 128
    frames = rng.random((t, h, w, 3)).astype(np.float32)
    probs = np.zeros((t, o, h, w), np.float32)
    probs[0, 0, 10:60, 12:100] = 0.9
    probs[1, 1, 40:90, 5:70] = 0.8
    probs[2, 0, 20:30, 20:40] = 0.7
    # (2, 1) stays empty -> whole-image box path

    tm = (probs > 0.5).astype(np.float32).reshape(t * o, h, w)
    yxhw = mask_to_yxhw(jnp.asarray(tm), scale=1.5)

    tf_ref, tp_ref = roi_crop_pairs(
        jnp.asarray(frames), jnp.asarray(probs), yxhw, 64
    )  # einsum path (pallas not enabled in tests)
    out = np.asarray(
        roi_crop_pairs_pallas(
            jnp.asarray(frames), jnp.asarray(probs), yxhw, 64, interpret=True
        )
    )
    np.testing.assert_allclose(out[..., :3], np.asarray(tf_ref), atol=2e-5)
    np.testing.assert_allclose(out[..., 3:], np.asarray(tp_ref), atol=2e-5)


def test_roi_crop_pairs_pallas_bf16_parity():
    """The bf16 block path (the production scoring dtype) must match the
    bf16 einsum fallback within bf16 rounding, and return bf16 crops —
    score_clip requests bf16, so the pallas path must honour it."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("interpret mode: run via scripts/test_cpu.sh")
    import jax.numpy as jnp

    from ivosw_tpu.kernels.roi_pallas import (
        roi_crop_pairs_einsum,
        roi_crop_pairs_pallas,
    )
    from ivosw_tpu.ops.roi import mask_to_yxhw

    rng = np.random.default_rng(3)
    t, o, h, w = 2, 2, 96, 128
    frames = rng.random((t, h, w, 3)).astype(np.float32)
    probs = np.zeros((t, o, h, w), np.float32)
    probs[0, 0, 10:60, 12:100] = 0.9
    probs[1, 1, 40:90, 5:70] = 0.8
    tm = (probs > 0.5).astype(np.float32).reshape(t * o, h, w)
    yxhw = mask_to_yxhw(jnp.asarray(tm), scale=1.5)

    tf_ref, tp_ref = roi_crop_pairs_einsum(
        jnp.asarray(frames), jnp.asarray(probs), yxhw, 64, dtype=jnp.bfloat16
    )
    out = roi_crop_pairs_pallas(
        jnp.asarray(frames), jnp.asarray(probs), yxhw, 64,
        dtype=jnp.bfloat16, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out[..., :3], np.float32),
        np.asarray(tf_ref, np.float32),
        atol=1.6e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 3:], np.float32),
        np.asarray(tp_ref, np.float32),
        atol=1.6e-2,
    )


def test_score_clip_uses_dispatcher(monkeypatch):
    """score_clip's bbox+crop must flow through
    kernels.roi_pallas.roi_crop_pairs_from_probs (the single pallas/einsum
    dispatch point for the whole stage)."""
    import jax
    import jax.numpy as jnp

    from ivosw_tpu.kernels import roi_pallas
    from ivosw_tpu.models import assess

    calls = {"n": 0}
    orig = roi_pallas.roi_crop_pairs_from_probs

    def spy(*args, **kwargs):
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(roi_pallas, "roi_crop_pairs_from_probs", spy)
    variables = assess.init_assess_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    probs = jnp.asarray(rng.random((2, 1, 64, 64)), jnp.float32)
    # bypass the jit cache so tracing happens with the spy in place
    scores = assess.score_clip.__wrapped__(
        variables, frames, probs, jnp.ones((1,), jnp.float32)
    )
    assert calls["n"] == 1
    assert np.asarray(scores).shape == (2, 1)


def _fusedbox_fixture():
    rng = np.random.default_rng(7)
    t, o, h, w = 3, 2, 96, 128
    frames = rng.random((t, h, w, 3)).astype(np.float32)
    probs = np.zeros((t, o, h, w), np.float32)
    probs[0, 0, 10:60, 12:100] = 0.9
    probs[1, 1, 40:90, 5:70] = 0.8
    probs[2, 0, 20:30, 20:40] = 0.7  # small mask -> min-side expansion
    # (2, 1) stays empty -> whole-image box path
    # threshold-edge pixels: exactly 0.5 must be EXCLUDED (> 0.5, strict)
    probs[0, 0, 0:3, 0:3] = 0.5
    return frames, probs


def test_roi_crop_pairs_fusedbox_interpret_parity():
    """Fused in-kernel bbox kernel == mask_to_yxhw + einsum path, f32 and
    bf16, including empty-mask, min-side and threshold-edge cases."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("interpret mode: run via scripts/test_cpu.sh")
    import jax.numpy as jnp

    from ivosw_tpu.kernels.roi_pallas import (
        roi_crop_pairs_einsum,
        roi_crop_pairs_pallas_fusedbox,
    )
    from ivosw_tpu.ops.roi import mask_to_yxhw

    frames, probs = _fusedbox_fixture()
    t, o, h, w = probs.shape[0], probs.shape[1], probs.shape[2], probs.shape[3]
    tm = (probs > 0.5).reshape(t * o, h, w)
    yxhw = mask_to_yxhw(jnp.asarray(tm), scale=1.5)

    for dtype, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 1.6e-2)):
        tf_ref, tp_ref = roi_crop_pairs_einsum(
            jnp.asarray(frames), jnp.asarray(probs), yxhw, 64, dtype=dtype
        )
        out = roi_crop_pairs_pallas_fusedbox(
            jnp.asarray(frames), jnp.asarray(probs), 64,
            dtype=dtype, interpret=True,
        )
        assert out.dtype == dtype
        np.testing.assert_allclose(
            np.asarray(out[..., :3], np.float32),
            np.asarray(tf_ref, np.float32),
            atol=atol,
        )
        np.testing.assert_allclose(
            np.asarray(out[..., 3:], np.float32),
            np.asarray(tp_ref, np.float32),
            atol=atol,
        )


def test_roi_crop_pairs_from_probs_impl_parity():
    """The dispatch point: impl='pallas' (interpret) == impl='einsum'."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("interpret mode: run via scripts/test_cpu.sh")
    import jax.numpy as jnp

    from ivosw_tpu.kernels import roi_pallas

    frames, probs = _fusedbox_fixture()
    tf_e, tp_e = roi_pallas.roi_crop_pairs_from_probs(
        jnp.asarray(frames), jnp.asarray(probs), 64,
        dtype=jnp.bfloat16, impl="einsum",
    )
    # route impl='pallas' through the interpreter on CPU
    orig = roi_pallas.roi_crop_pairs_pallas_fusedbox
    try:
        roi_pallas.roi_crop_pairs_pallas_fusedbox = (
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        )
        tf_p, tp_p = roi_pallas.roi_crop_pairs_from_probs(
            jnp.asarray(frames), jnp.asarray(probs), 64,
            dtype=jnp.bfloat16, impl="pallas",
        )
    finally:
        roi_pallas.roi_crop_pairs_pallas_fusedbox = orig
    np.testing.assert_allclose(
        np.asarray(tf_p, np.float32), np.asarray(tf_e, np.float32), atol=1.6e-2
    )
    np.testing.assert_allclose(
        np.asarray(tp_p, np.float32), np.asarray(tp_e, np.float32), atol=1.6e-2
    )
    with pytest.raises(NotImplementedError):
        roi_pallas.roi_crop_pairs_from_probs(
            jnp.asarray(frames), jnp.asarray(probs), 64, impl="nope"
        )


def test_roi_crop_pairs_pallas_compiles_on_tpu():
    """Opportunistic real-TPU Mosaic compile check: skips cleanly when the
    remote compile service hangs or errors (known image quirk)."""
    import subprocess
    import sys

    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU backend")

    script = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "from ivosw_tpu.kernels.roi_pallas import roi_crop_pairs_pallas\n"
        "from ivosw_tpu.ops.roi import mask_to_yxhw\n"
        "rng = np.random.default_rng(0)\n"
        "frames = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)\n"
        "probs = jnp.asarray(rng.random((2, 1, 64, 64)), jnp.float32)\n"
        "tm = (probs > 0.5).astype(jnp.float32).reshape(2, 64, 64)\n"
        "yxhw = mask_to_yxhw(tm, scale=1.5)\n"
        "out = roi_crop_pairs_pallas(frames, probs, yxhw, 64)\n"
        "jax.block_until_ready(out)\n"
        "print('PALLAS_TPU_OK', np.asarray(out).mean())\n"
    )
    import os

    env = dict(os.environ)
    # conftest pins the (pre-imported, too-late) platform env to cpu for this
    # process; the child must really target the TPU
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("JAX_PLATFORMS", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=240,
            cwd="/root/repo",
            env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("Mosaic remote compile hung (known image quirk)")
    if "PALLAS_TPU_OK" not in proc.stdout:
        pytest.skip(f"Mosaic compile failed: {proc.stderr[-400:]}")


def test_roi_crop_pairs_pallas_premat_interpret_parity():
    """Precomputed-matrix kernel variant == einsum path (f32) and returns
    the requested dtype (bf16)."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("interpret mode: run via scripts/test_cpu.sh")
    import jax.numpy as jnp

    from ivosw_tpu.kernels.roi_pallas import (
        roi_crop_pairs_einsum,
        roi_crop_pairs_pallas_premat,
    )
    from ivosw_tpu.ops.roi import mask_to_yxhw

    rng = np.random.default_rng(5)
    t, o, h, w = 3, 2, 96, 128
    frames = rng.random((t, h, w, 3)).astype(np.float32)
    probs = np.zeros((t, o, h, w), np.float32)
    probs[0, 0, 10:60, 12:100] = 0.9
    probs[1, 1, 40:90, 5:70] = 0.8
    probs[2, 0, 20:30, 20:40] = 0.7

    tm = (probs > 0.5).astype(np.float32).reshape(t * o, h, w)
    yxhw = mask_to_yxhw(jnp.asarray(tm), scale=1.5)

    tf_ref, tp_ref = roi_crop_pairs_einsum(
        jnp.asarray(frames), jnp.asarray(probs), yxhw, 64
    )
    out = np.asarray(
        roi_crop_pairs_pallas_premat(
            jnp.asarray(frames), jnp.asarray(probs), yxhw, 64, interpret=True
        )
    )
    np.testing.assert_allclose(out[..., :3], np.asarray(tf_ref), atol=2e-5)
    np.testing.assert_allclose(out[..., 3:], np.asarray(tp_ref), atol=2e-5)

    out_bf = roi_crop_pairs_pallas_premat(
        jnp.asarray(frames),
        jnp.asarray(probs),
        yxhw,
        64,
        dtype=jnp.bfloat16,
        interpret=True,
    )
    assert out_bf.dtype == jnp.bfloat16


def test_pallas_auto_dispatch_policy(monkeypatch, tmp_path):
    """``impl="auto"`` resolves via the Mosaic health probe (VERDICT r3 #6):
    env=1 forces pallas, env=0 forces einsum, unset consults mosaic_healthy()
    — and the on-disk verdict cache round-trips."""
    import jax

    from ivosw_tpu.kernels import roi_pallas

    # pretend we're on a TPU backend so the policy (not the backend check)
    # is what's under test
    monkeypatch.setattr(roi_pallas.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(roi_pallas, "_HEALTH_FILE", str(tmp_path / "health"))

    calls = []

    def fake_probe(timeout=180.0):
        calls.append(1)
        return ""  # healthy

    monkeypatch.setattr(roi_pallas, "probe_mosaic", fake_probe)

    monkeypatch.setenv("IVOSW_ENABLE_PALLAS", "1")
    assert roi_pallas._pallas_enabled() and not calls  # forced: no probe

    monkeypatch.setenv("IVOSW_ENABLE_PALLAS", "0")
    assert not roi_pallas._pallas_enabled() and not calls

    monkeypatch.delenv("IVOSW_ENABLE_PALLAS")
    monkeypatch.setattr(roi_pallas, "_health_memo", None)
    assert roi_pallas._pallas_enabled() and len(calls) == 1  # probed once
    assert roi_pallas._pallas_enabled() and len(calls) == 1  # memoised

    # a fresh "process" (memo cleared) reads the disk verdict, no re-probe
    monkeypatch.setattr(roi_pallas, "_health_memo", None)
    assert roi_pallas._pallas_enabled() and len(calls) == 1

    # unhealthy probe -> einsum fallback, also cached
    monkeypatch.setattr(roi_pallas, "_health_memo", None)
    monkeypatch.setattr(roi_pallas, "_HEALTH_FILE", str(tmp_path / "health2"))
    monkeypatch.setattr(
        roi_pallas, "probe_mosaic", lambda timeout=180.0: "skipped: hung"
    )
    assert not roi_pallas._pallas_enabled()


def test_auto_dispatch_platform_correct_on_cpu_lowering(monkeypatch):
    """MULTICHIP_r04 regression: pallas policy ON (TPU default backend,
    forced-healthy) while the program lowers for CPU devices must take the
    einsum branch — the dispatch is lowering-time (`jax.lax.
    platform_dependent`), not a trace-time `jax.default_backend()` check.
    Before the fix this crashed in the pallas CPU lowering rule ("Only
    interpret mode is supported on CPU backend") — the exact
    `dryrun_multichip` failure (assess_train_step → roi_crop_best →
    pl.pallas_call on a CPU mesh under a TPU default backend)."""
    import jax
    import jax.numpy as jnp

    from ivosw_tpu.kernels import roi_pallas

    monkeypatch.setattr(roi_pallas.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("IVOSW_ENABLE_PALLAS", "1")  # forced: no Mosaic probe
    assert roi_pallas._pallas_enabled()

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # (1) the exact dryrun crash path, reproduced at lowering time with
        # abstract avals (no 256² ResNet compile needed — the old code's
        # crash was raised by the pallas_call CPU lowering rule itself)
        from ivosw_tpu.models.assess import init_assess_variables
        from ivosw_tpu.train.train_assess import (
            assess_train_step,
            make_assess_optimizer,
        )

        opt = make_assess_optimizer(0.9, 5e-4)
        var_shapes = jax.eval_shape(
            lambda: init_assess_variables(jax.random.PRNGKey(0))
        )
        opt_shapes = jax.eval_shape(lambda v: opt.init(v["params"]), var_shapes)
        batch = {
            "img": jax.ShapeDtypeStruct((2, 24, 32, 3), jnp.float32),
            "prob": jax.ShapeDtypeStruct((2, 24, 32), jnp.float32),
            "label": jax.ShapeDtypeStruct((2, 24, 32), jnp.int32),
        }
        assess_train_step.lower(
            var_shapes, opt_shapes, batch, jnp.float32(1e-4), opt
        )

        # (2) executed end-to-end on CPU, the auto dispatch must equal the
        # explicit einsum path bit-for-bit (it IS the einsum branch there)
        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.random((2, 24, 32, 3)), jnp.float32)
        probs = jnp.asarray(rng.random((2, 2, 24, 32)), jnp.float32)
        tf_a, tp_a = roi_pallas.roi_crop_pairs_from_probs(
            frames, probs, 16, impl="auto"
        )
        tf_e, tp_e = roi_pallas.roi_crop_pairs_from_probs(
            frames, probs, 16, impl="einsum"
        )
        np.testing.assert_array_equal(np.asarray(tf_a), np.asarray(tf_e))
        np.testing.assert_array_equal(np.asarray(tp_a), np.asarray(tp_e))
