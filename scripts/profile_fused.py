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

Usage: python scripts/profile_fused.py [--trace] [--folded] [--stages]

``--stages`` times the folded encoder stage-by-stage (stem / res2..res5 /
head) as independent jitted programs on fresh-init params at the exact
intermediate shapes, with analytic FLOP counts → per-stage TFLOP/s, and
writes ``results/profile_encoder_stages.json``. This names WHICH convs sit
below the ~28% whole-encoder MFU (VERDICT r2 Weak #2) so optimisation
effort lands on the right stage.
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


def _stage_flops_gf(stage: str, batch: int) -> float:
    """Analytic forward GFLOPs (2·MACs) of one encoder stage at 256² input.

    Conv MACs = k²·Cin·Cout·Hout·Wout, enumerated from the module configs
    (resnet.py RESNET50_BLOCKS + the folded 4-channel stem)."""
    def conv(k, cin, cout, hw):
        return k * k * cin * cout * hw * hw * 2

    if stage == "stem":  # 7×7/s2 C=4→64 at 256→128
        return batch * conv(7, 4, 64, 128) / 1e9
    specs = {  # (width, blocks, in_ch, spatial_out)
        "res2": (64, 3, 64, 64),
        "res3": (128, 4, 256, 32),
        "res4": (256, 6, 512, 16),
        "res5": (512, 3, 1024, 8),
    }
    width, blocks, cin, hw = specs[stage]
    total = 0
    for i in range(blocks):
        b_in = cin if i == 0 else width * 4
        # bottleneck: 1×1 in→w at the INPUT spatial size (stride lives in
        # the 3×3), 3×3 w→w at the OUT size, 1×1 w→4w, plus the block-0
        # downsample 1×1 in→4w at the OUT size
        in_hw = hw * 2 if (i == 0 and stage != "res2") else hw
        total += conv(1, b_in, width, in_hw)
        total += conv(3, width, width, hw)
        total += conv(1, width, width * 4, hw)
        if i == 0:
            total += conv(1, b_in, width * 4, hw)
    return batch * total / 1e9


def _profile_stages(jax, jnp, np, iters=8, batch=192):
    """Per-stage timings of the folded encoder as independent programs."""
    import flax.linen as nn

    from ivosw_tpu.models.resnet import ResStage

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    out = {}

    def timed(mod, x):
        variables = mod.init(key, x)
        f = jax.jit(lambda v, x: mod.apply(v, x))
        _sync(jnp, f(variables, x))
        _sync(jnp, f(variables, x))
        tic = time.perf_counter()
        for _ in range(iters):
            y = f(variables, x)
        _sync(jnp, y)
        return (time.perf_counter() - tic) / iters * 1e3

    rng = np.random.default_rng(0)

    # stem: folded 4-channel conv (assess.py conv_stem) incl. the maxpool
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                        use_bias=True, dtype=dtype, name="conv_stem")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    x = jnp.asarray(rng.random((batch, 256, 256, 4)), dtype)
    ms = timed(Stem(), x)
    out["stem"] = {"ms": round(ms, 2), "gflop": round(_stage_flops_gf("stem", batch), 1),
                   "tflops_per_s": round(_stage_flops_gf("stem", batch) / ms, 1)}

    shapes = {"res2": (64, 64, 3, 1), "res3": (64, 256, 4, 2),
              "res4": (32, 512, 6, 2), "res5": (16, 1024, 3, 2)}
    widths = {"res2": 64, "res3": 128, "res4": 256, "res5": 512}
    for stage, (hw, cin, blocks, strides) in shapes.items():
        x = jnp.asarray(rng.random((batch, hw, hw, cin)), dtype)
        mod = ResStage(widths[stage], blocks, strides, dtype=dtype, fold=True,
                       name=stage)
        ms = timed(mod, x)
        gf = _stage_flops_gf(stage, batch)
        out[stage] = {"ms": round(ms, 2), "gflop": round(gf, 1),
                      "tflops_per_s": round(gf / ms, 1)}
    out["sum_ms"] = round(sum(v["ms"] for v in out.values() if isinstance(v, dict)), 2)
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import numpy as np

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    if "--stages" in argv:
        stages = _profile_stages(jax, jnp, np)
        os.makedirs("results", exist_ok=True)
        payload = {"batch": 192, "device": str(jax.devices()[0]),
                   "encoder": "folded", "stages": stages,
                   "note": ("independent fresh-init programs per stage; "
                            "sum_ms ≈ bare_encoder_ms modulo inter-stage "
                            "fusion the split forbids")}
        with open("results/profile_encoder_stages.json", "w") as fp:
            json.dump(payload, fp, indent=2)
        print(json.dumps(payload, indent=2))
        return

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
    # MFU estimate: the folded encoder is 10.78 GFLOP per (frame, object)
    # pair at 256² counting FMA as 2 FLOPs (the convention hardware peak
    # uses; torchvision's "4.1 GFLOPs" for resnet50@224 counts MACs —
    # enumerated per conv by _stage_flops_gf). v5e bf16 peak ≈ 197 TFLOP/s.
    # The Q-pass (T×2 BiLSTM) is negligible FLOPs, so attribute
    # encoder_plus_q to the encoder. NB: rounds 1-2 used 5.4 GF/pair (the
    # MAC count), understating MFU 2× — VERDICT r2's "~21% MFU" inherits
    # that; the same measurement is ~56% MFU under the correct count.
    pairs = T * O
    encoder_tflop = pairs * sum(
        _stage_flops_gf(s, 1) for s in ("stem", "res2", "res3", "res4", "res5")
    ) * 1e9 / 1e12
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
    from bench import _pause_pipeline

    with _pause_pipeline():
        main()
