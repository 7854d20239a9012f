"""Phase decomposition of the fused QA+agent round (VERDICT r2, Weak #2).

The bench headline times ONE fused program; this script breaks the round
into its pipeline stages — bbox reduction, ROI crop, encoder trunk, Q-pass —
by timing nested prefixes of the computation on the real chip, and writes
``results/profile_fused.json`` naming the top time sinks. Differencing
jitted prefixes is the reliable decomposition on this image: the axon
tunnel breaks ``jax.block_until_ready`` (CLAUDE.md), so device-time
attribution must come from whole-program timings with a one-scalar fetch,
not host-side trace spans.

Optionally (``--trace``) also captures a raw ``jax.profiler`` trace under
``/tmp/ivosw_trace`` for manual inspection.

Usage: python scripts/profile_fused.py [--trace] [--folded]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, O, H, W = 64, 3, 480, 854
ITERS = 8


def _sync(jnp, out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import numpy as np

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ivosw_tpu.kernels.roi_pallas import roi_crop_pairs
    from ivosw_tpu.models.assess import (
        ROI_SIZE,
        AssessNet,
        init_assess_variables,
        mean_object_quality,
    )
    from ivosw_tpu.models.brain import brain_forward, init_brain_params
    from ivosw_tpu.models.fold import fold_assess_variables
    from ivosw_tpu.ops.roi import mask_to_yxhw

    folded = "--folded" in argv or True  # production path; --live-bn to disable
    if "--live-bn" in argv:
        folded = False
    # --pallas: profile the fused-bbox pallas path (bbox lives inside the
    # crop kernel, so the bbox prefix is skipped and the crop phase IS the
    # whole box+crop stage); writes profile_fused_pallas.json
    pallas = "--pallas" in argv

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((T, H, W, 3)), jnp.float32)
    probs_np = np.zeros((T, O, H, W), dtype=np.float32)
    for t in range(T):
        for o in range(O):
            y = (t * 5 + o * 40) % (H - 160)
            x = (t * 7 + o * 60) % (W - 200)
            probs_np[t, o, y : y + 150, x : x + 190] = 0.9
    probs = jnp.asarray(probs_np)
    obj_valid = jnp.ones((O,), jnp.float32)
    counts = jnp.zeros((T,), jnp.float32)

    variables = init_assess_variables(jax.random.PRNGKey(0))
    if folded:
        variables = fold_assess_variables(variables)
    brain_params = init_brain_params(jax.random.PRNGKey(1))
    model = AssessNet(dtype=jnp.bfloat16, fold=folded)

    # ----- nested prefixes of the fused round ------------------------------
    def stage_bbox(frames, probs):
        t, o = probs.shape[0], probs.shape[1]
        tm = (probs > 0.5).astype(jnp.float32).reshape(t * o, H, W)
        return mask_to_yxhw(tm, scale=1.5)

    def stage_crop(frames, probs):
        if pallas:
            from ivosw_tpu.kernels.roi_pallas import roi_crop_pairs_from_probs

            return roi_crop_pairs_from_probs(
                frames, probs, ROI_SIZE, dtype=jnp.bfloat16, impl="pallas"
            )
        yxhw = stage_bbox(frames, probs)
        return roi_crop_pairs(frames, probs, yxhw, ROI_SIZE, dtype=jnp.bfloat16)

    def stage_encode(frames, probs):
        tf_roi, tp_roi = stage_crop(frames, probs)
        q = model.apply(variables, tf_roi, tp_roi, train=False)
        return q.reshape(probs.shape[0], probs.shape[1]) * obj_valid[None, :]

    def stage_full(frames, probs):
        scores = stage_encode(frames, probs)
        quality = mean_object_quality(scores, obj_valid)
        state = jnp.stack([quality, counts], axis=1)[None]
        return brain_forward(brain_params, state)[0]

    def timed(fn):
        f = jax.jit(fn)
        _sync(jnp, f(frames, probs))  # compile + warm
        _sync(jnp, f(frames, probs))
        tic = time.perf_counter()
        for _ in range(ITERS):
            out = f(frames, probs)
        _sync(jnp, out)
        return (time.perf_counter() - tic) / ITERS * 1e3  # ms

    ms = {
        "bbox": 0.0 if pallas else timed(stage_bbox),
        "bbox+crop": timed(stage_crop),
        "bbox+crop+encoder": timed(stage_encode),
        "full_round": timed(stage_full),
    }

    # bare encoder on synthetic crops: isolates XLA's ResNet-50 conv
    # efficiency from the crop stage — if this matches the in-program
    # encoder attribution, the encoder time is XLA's conv ceiling at these
    # shapes, not a fusion artefact of the crop pipeline
    crops_f = jnp.asarray(
        rng.random((T * O, ROI_SIZE, ROI_SIZE, 3)), jnp.bfloat16
    )
    crops_p = jnp.asarray(rng.random((T * O, ROI_SIZE, ROI_SIZE, 1)), jnp.bfloat16)

    def bare_encoder(crops_f, crops_p):
        return model.apply(variables, crops_f, crops_p, train=False)

    f = jax.jit(bare_encoder)
    _sync(jnp, f(crops_f, crops_p))
    _sync(jnp, f(crops_f, crops_p))
    tic = time.perf_counter()
    for _ in range(ITERS):
        out = f(crops_f, crops_p)
    _sync(jnp, out)
    ms["bare_encoder"] = (time.perf_counter() - tic) / ITERS * 1e3
    # The encoder prefix program can time SLOWER than the full fused round
    # (measured: 61 vs 30 ms): truncating at the [T, O] score output forces
    # a different layout/fusion choice than the full program, so the honest
    # encoder attribution is full_round minus the cheap front phases, not
    # the prefix difference.
    encoder_plus_q = ms["full_round"] - ms["bbox+crop"]
    phases = {
        "bbox_reduction_ms": round(ms["bbox"], 2),
        "roi_crop_ms": round(ms["bbox+crop"] - ms["bbox"], 2),
        "encoder_plus_q_ms": round(encoder_plus_q, 2),
        "encoder_prefix_program_ms": round(
            ms["bbox+crop+encoder"] - ms["bbox+crop"], 2
        ),
        "bare_encoder_ms": round(ms["bare_encoder"], 2),
        "full_round_ms": round(ms["full_round"], 2),
    }
    # MFU estimate: ResNet-50 fwd ≈ 5.4 GFLOP at 256² per (frame, object)
    # pair + crop contraction FLOPs; v5e bf16 peak ≈ 197 TFLOP/s. The Q-pass
    # (T×2 BiLSTM) is negligible FLOPs, so attribute encoder_plus_q to the
    # encoder.
    pairs = T * O
    encoder_tflop = pairs * 5.4e9 / 1e12
    phases["encoder_tflops_per_s"] = round(encoder_tflop / (encoder_plus_q / 1e3), 1)
    out = {
        "clip": {"T": T, "O": O, "H": H, "W": W},
        "crop_impl": "pallas-fusedbox" if pallas else "einsum",
        "encoder": "folded" if folded else "live-bn",
        "device": str(jax.devices()[0]),
        "phases_ms": phases,
        "note": (
            "phase times are differences of jitted prefixes (whole-program "
            "timing with one-scalar sync; tunnel breaks block_until_ready); "
            "XLA may fuse differently inside the full program, so treat "
            "per-phase numbers as upper bounds on each stage's cost"
        ),
    }
    if "--trace" in argv:
        from ivosw_tpu.utils.misc import profile_trace

        full = jax.jit(stage_full)
        with profile_trace("/tmp/ivosw_trace"):
            _sync(jnp, full(frames, probs))
        out["trace_dir"] = "/tmp/ivosw_trace"

    os.makedirs("results", exist_ok=True)
    name = "profile_fused_pallas.json" if pallas else "profile_fused.json"
    with open(os.path.join("results", name), "w") as fp:
        json.dump(out, fp, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
