"""Pallas TPU kernel: fused separable ROI crop.

The XLA path (:func:`ivosw_tpu.ops.roi.roi_crop`) computes the separable
bilinear crop as two einsums, materialising the [B, 256, W, C] intermediate
in HBM (~1.7 MB per image) and cropping the frame and prob map in separate
calls. This kernel fuses the whole thing per image:

  grid = (B,); per program: the full [H, W, C] image block (≈3.3 MB bf16 at
  480p with C=4, comfortably inside the ~16 MB VMEM), builds the two
  interpolation matrices Ry [S, H] / Rx [S, W] IN-KERNEL from 4 scalars
  (SMEM), and runs both contractions on the MXU with the intermediate held
  in VMEM — zero HBM traffic for the intermediate, one pass over the image.

The frame (3 ch) and prob map (1 ch) are cropped together as C=4, which also
removes a second kernel launch + image re-read per scoring pass.

Numerics match ops.roi.roi_crop (float32) — parity-tested; grid_sample
zeros-padding semantics are inherited from the hat-function weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ivosw_tpu.ops.roi import yxhw_to_minmax

ROI_S = 256


def _kernel(box_ref, img_ref, out_ref, *, h, w, c, s):
    # box_ref: [B, 4] scalar-prefetch SMEM (ymin, ymax, xmin, xmax)
    i = pl.program_id(0)
    ymin, ymax = box_ref[i, 0], box_ref[i, 1]
    xmin, xmax = box_ref[i, 2], box_ref[i, 3]

    # TPU iota is integer-only; cast after generation
    steps = (
        jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32) / (s - 1)
    )
    ycoords = ymin + (ymax - ymin) * steps  # [S, 1]
    xcoords = xmin + (xmax - xmin) * steps

    hsrc = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1).astype(jnp.float32)
    wsrc = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(ycoords - hsrc))  # [S, H]
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(xcoords - wsrc))  # [S, W]

    # per-channel 2-D MXU dots (C is small and static; Mosaic prefers 2-D);
    # full f32 precision — the default would drop multiplicands to bf16
    hi = jax.lax.Precision.HIGHEST
    rx_t = rx.T  # [W, S]
    for ch in range(c):
        img_c = img_ref[0, ch]  # [H, W]
        tmp = jnp.dot(ry, img_c, precision=hi, preferred_element_type=jnp.float32)
        out_ref[0, ch] = jnp.dot(
            tmp, rx_t, precision=hi, preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def roi_crop_pallas(
    images: jnp.ndarray, yxhw: jnp.ndarray, out_size: int = ROI_S, interpret: bool = False
) -> jnp.ndarray:
    """images: [B, H, W, C] float32 → [B, out_size, out_size, C]."""
    b, h, w, c = images.shape
    ymin, ymax, xmin, xmax = yxhw_to_minmax(yxhw)
    boxes = jnp.stack([ymin, ymax, xmin, xmax], axis=1).astype(jnp.float32)
    img_chw = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.float32)  # [B,C,H,W]
    s = out_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # boxes live in SMEM, indexed by program id
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, c, h, w), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, s, s), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, s=s),
        out_shape=jax.ShapeDtypeStruct((b, c, s, s), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * h * w * c + 2 * b * s * s * w * c,
            bytes_accessed=b * (h * w * c + s * s * c) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(boxes, img_chw)
    return jnp.transpose(out, (0, 2, 3, 1))  # back to NHWC


def probe_mosaic(timeout: float = 180.0) -> str:
    """Compile the production pallas kernels on tiny shapes in a SUBPROCESS.

    This image's Mosaic remote-compile service hangs or 500s INTERMITTENTLY
    (healthy some sessions); a hang inside the calling process would stall a
    whole eval run, so health is probed out-of-process. Returns '' when
    healthy, else a skip reason. Used by bench.py and by the ``auto``
    dispatch below."""
    import os
    import subprocess
    import sys

    if jax.default_backend() != "tpu":
        return "skipped: not a TPU backend"
    probe = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_ivosw_bench')\n"
        "from ivosw_tpu.kernels.roi_pallas import (\n"
        "    roi_crop_pairs_pallas, roi_crop_pairs_pallas_fusedbox)\n"
        "from ivosw_tpu.ops.roi import mask_to_yxhw\n"
        "rng = np.random.default_rng(0)\n"
        "frames = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)\n"
        "probs = jnp.asarray(rng.random((2, 1, 64, 64)), jnp.float32)\n"
        "tm = (probs > 0.5).astype(jnp.float32).reshape(2, 64, 64)\n"
        "out = roi_crop_pairs_pallas(frames, probs, mask_to_yxhw(tm, scale=1.5), 64)\n"
        "out2 = roi_crop_pairs_pallas_fusedbox(frames, probs, 64, dtype=jnp.bfloat16)\n"
        "jax.block_until_ready((out, out2))\n"
        "print('PALLAS_PROBE_OK')\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("JAX_PLATFORMS", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", probe],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return "skipped: Mosaic remote compile hung"
    if "PALLAS_PROBE_OK" not in proc.stdout:
        return f"skipped: probe failed: {proc.stderr[-200:]}"
    return ""


_HEALTH_TTL_S = 1800.0
_HEALTH_FILE = "/tmp/ivosw_mosaic_health"
_health_memo: bool | None = None


def mosaic_healthy() -> bool:
    """Probe-once Mosaic health, memoised in-process + on disk (30 min TTL).

    The disk cache matters: pipeline stages are separate python processes
    (host-leak mitigation, CLAUDE.md) and must not each pay a probe — least
    of all the up-to-3-minute timeout of an UNHEALTHY service. Intermittent
    health is why the cache expires rather than pinning one verdict."""
    global _health_memo
    import os
    import time

    if _health_memo is not None:
        return _health_memo
    try:
        with open(_HEALTH_FILE) as f:
            verdict, ts = f.read().split()
        if time.time() - float(ts) < _HEALTH_TTL_S:
            _health_memo = verdict == "ok"
            return _health_memo
    except (OSError, ValueError):
        pass
    reason = probe_mosaic()
    _health_memo = reason == ""
    tmp = f"{_HEALTH_FILE}.{os.getpid()}"
    try:
        with open(tmp, "w") as f:
            f.write(f"{'ok' if _health_memo else 'bad'} {time.time()}")
        os.replace(tmp, _HEALTH_FILE)
    except OSError:
        pass
    return _health_memo


def _pallas_enabled() -> bool:
    """TRACE-TIME Pallas policy (VERDICT r3 #6: default-on where safe).

    IVOSW_ENABLE_PALLAS=1 forces the policy on for TPU lowerings (no probe —
    the caller asserts health); =0 forces the einsum path; unset → pallas iff
    the out-of-process Mosaic health probe passes, einsum fallback otherwise,
    so production runs get the measured-fastest path (fused-bbox crop 7.36 ms
    vs 8.27 ms bf16 einsum, BENCH_r03) without the env var.

    This answers "SHOULD the TPU lowering use pallas?", never "is this
    program lowering for a TPU?" — that second question is decided at
    lowering time by :func:`_dispatch_by_platform`. Keying the branch choice
    on ``jax.default_backend()`` here was the MULTICHIP_r04 crash: the
    driver's default backend is the live TPU while ``dryrun_multichip``
    lowers onto a CPU mesh, so pallas was selected for a CPU computation
    ("Only interpret mode is supported on CPU backend")."""
    import os

    env = os.environ.get("IVOSW_ENABLE_PALLAS")
    if env == "1":
        return True
    if env == "0":
        return False
    if jax.default_backend() != "tpu":
        # no TPU in the process → the TPU branch can never lower; skip the
        # (up to 3-minute) Mosaic probe entirely
        return False
    return mosaic_healthy()


def _dispatch_by_platform(pallas_fn, einsum_fn):
    """LOWERING-TIME dispatch: pallas only where the program actually lowers
    for a TPU; the XLA einsum path on every other platform (CPU meshes under
    a TPU default backend, pure-CPU hosts, ...).

    ``jax.lax.platform_dependent`` resolves per lowering platform, so one
    traced program does the right thing on a mixed host — the exact case the
    trace-time ``jax.default_backend()`` gate got wrong (MULTICHIP_r04).
    When the trace-time policy says "no pallas" the TPU branch is not even
    staged, so nothing Mosaic-shaped reaches the compiler."""
    if not _pallas_enabled():
        return einsum_fn()
    return jax.lax.platform_dependent(tpu=pallas_fn, default=einsum_fn)


def roi_crop_best(images, yxhw, out_size: int = ROI_S):
    """Pallas on TPU lowerings when enabled, XLA-einsum fallback otherwise.

    Policy via IVOSW_ENABLE_PALLAS / the Mosaic health probe (this image's
    remote Mosaic compile service is unreliable — hangs/500s observed on
    kernels the interpreter validates fine); platform selection is
    lowering-time (:func:`_dispatch_by_platform`), so CPU-mesh programs are
    always einsum. The einsum path already runs the crop on the MXU.
    """
    from ivosw_tpu.ops.roi import roi_crop

    return _dispatch_by_platform(
        # cast keeps both branches' output aval identical (pallas computes f32)
        lambda: roi_crop_pallas(images, yxhw, out_size).astype(images.dtype),
        lambda: roi_crop(images, yxhw, out_size, dtype=images.dtype),
    )


# ------------------------------------------------- flagship T×O pair crop --
def _interp_mats(box_ref, i, h, w, s):
    ymin, ymax = box_ref[i, 0], box_ref[i, 1]
    xmin, xmax = box_ref[i, 2], box_ref[i, 3]
    steps = (
        jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32) / (s - 1)
    )
    ycoords = ymin + (ymax - ymin) * steps
    xcoords = xmin + (xmax - xmin) * steps
    hsrc = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1).astype(jnp.float32)
    wsrc = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(ycoords - hsrc))  # [S, H]
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(xcoords - wsrc))  # [S, W]
    return ry, rx


def _pair_kernel(box_ref, frame_ref, prob_ref, out_ref, *, h, w, s, dtype):
    """grid = (T*O,): pair i crops its frame's 3 channels AND its prob map
    in ONE step — the interpolation matrices are built once per pair (the
    old per-channel grid rebuilt them 4×) and the frame block stays resident
    across the O consecutive pairs that share it (identical block index →
    Mosaic skips the re-fetch). bf16 blocks halve both the VMEM footprint
    and the HBM traffic; dots accumulate in f32 either way."""
    i = pl.program_id(0)
    ry, rx = _interp_mats(box_ref, i, h, w, s)  # f32 [S,H] / [S,W]
    # f32 → 6-pass HIGHEST dots (exact parity with the einsum path);
    # bf16 → single-pass MXU dots with f32 accumulation
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    ry = ry.astype(dtype)
    rx = rx.astype(dtype)
    # contract over W via dot_general dimension numbers — a materialised
    # rx.T ([W, S] transpose on the VPU) is a catastrophic Mosaic slow path
    dn = (((1,), (1,)), ((), ()))

    def crop2d(img):
        tmp = jnp.dot(
            ry, img, precision=prec, preferred_element_type=jnp.float32
        ).astype(dtype)  # [S, W]
        return jax.lax.dot_general(
            tmp, rx, dn, precision=prec, preferred_element_type=jnp.float32
        ).astype(dtype)  # [S, S]

    for ch in range(3):
        out_ref[0, ch] = crop2d(frame_ref[0, ch])
    out_ref[0, 3] = crop2d(prob_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("out_size", "dtype", "interpret"))
def roi_crop_pairs_pallas(
    frames: jnp.ndarray,  # [T, H, W, 3]
    probs: jnp.ndarray,  # [T, O, H, W]
    yxhw: jnp.ndarray,  # [T*O, 4]
    out_size: int = ROI_S,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """All T×O (frame, object) ROI crops fused: → [T*O, S, S, 4] (rgb+prob).

    Pair i crops frame i//O with object i%O's box; the BlockSpec index maps
    route frame/prob blocks per grid step, so the [T*O, H, W] frame broadcast
    (~GBs of HBM at DAVIS scale) never exists. One pallas call handles frame
    channels and prob map together; at 480p the bf16 working set
    (frame 2.6 MB + prob 0.9 MB + out 0.5 MB + matrices ~2 MB, double-
    buffered) fits the ~16 MB VMEM budget. f32 also fits at ≤272p test
    shapes (used by the parity tests); the production scoring path is bf16.
    """
    t, h, w, _ = frames.shape
    o = probs.shape[1]
    s = out_size
    ymin, ymax, xmin, xmax = yxhw_to_minmax(yxhw)
    boxes = jnp.stack([ymin, ymax, xmin, xmax], axis=1).astype(jnp.float32)
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2)).astype(dtype)

    kern = functools.partial(_pair_kernel, h=h, w=w, s=s, dtype=dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t * o,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, h, w),
                lambda i, *_: (i // o, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h, w),
                lambda i, *_: (i // o, i % o, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, s, s), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    itemsize = jnp.dtype(dtype).itemsize
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t * o, 4, s, s), dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * (s * h * w + s * s * w) * 4,
            # frame blocks are fetched once per FRAME (reused across its O
            # pairs); prob blocks once per pair
            bytes_accessed=(t * 3 + t * o) * h * w * itemsize
            + t * o * 4 * s * s * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(boxes, frames_chw, probs.astype(dtype))
    return jnp.transpose(out, (0, 2, 3, 1))


def _bbox_minmax_inkernel(prob, h, w, scale, min_side):
    """In-kernel f32 ROI box from a [H, W] probability block.

    Exact transcription of ``ops.roi.mask_to_yxhw`` composed with
    ``yxhw_to_minmax`` — same op sequence in f32 so boxes match the XLA
    path bit-for-bit. The threshold is ``prob > 0.5`` on the f32 block,
    matching what score_clip feeds mask_to_yxhw (reference box rules:
    models/assessment.py:110-161)."""
    mask = (prob > 0.5).astype(jnp.bfloat16)  # exact 0/1; half the VMEM
    rows = jnp.max(mask, axis=1, keepdims=True).astype(jnp.float32)  # [H,1]
    cols = jnp.max(mask, axis=0, keepdims=True).astype(jnp.float32)  # [1,W]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(rows > 0, iota_h, big))
    ymax = jnp.max(jnp.where(rows > 0, iota_h, -big))
    xmin = jnp.min(jnp.where(cols > 0, iota_w, big))
    xmax = jnp.max(jnp.where(cols > 0, iota_w, -big))
    any_fg = jnp.max(rows) > 0

    # empty mask => whole image (reference: ymax = H, xmax = W)
    ymin = jnp.where(any_fg, ymin, 0.0)
    ymax = jnp.where(any_fg, ymax, jnp.float32(h))
    xmin = jnp.where(any_fg, xmin, 0.0)
    xmax = jnp.where(any_fg, xmax, jnp.float32(w))

    def expand(lo, hi):
        res = min_side - (hi - lo)
        half = jnp.floor(res / 2.0)
        lo2 = jnp.where(res > 0, lo - half, lo)
        hi2 = jnp.where(res > 0, hi + half, hi)
        return lo2, hi2

    ymin, ymax = expand(ymin, ymax)
    xmin, xmax = expand(xmin, xmax)

    orig_h = ymax - ymin + 1.0
    orig_w = xmax - xmin + 1.0
    grow = (scale - 1.0) / 2.0
    ymin = jnp.maximum(-5.0, ymin - grow * orig_h)
    ymax = jnp.minimum(jnp.float32(h) + 5.0, ymax + grow * orig_h)
    xmin = jnp.maximum(-5.0, xmin - grow * orig_w)
    xmax = jnp.minimum(jnp.float32(w) + 5.0, xmax + grow * orig_w)

    # yxhw_to_minmax composition, kept as the same f32 op sequence
    y = (ymax + ymin) / 2.0
    x = (xmax + xmin) / 2.0
    hh = ymax - ymin + 1.0
    ww = xmax - xmin + 1.0
    return y - hh / 2.0, y + hh / 2.0, x - ww / 2.0, x + ww / 2.0


def _mats_from_scalars(ymin, ymax, xmin, xmax, h, w, s):
    steps = (
        jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32) / (s - 1)
    )
    ycoords = ymin + (ymax - ymin) * steps
    xcoords = xmin + (xmax - xmin) * steps
    hsrc = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1).astype(jnp.float32)
    wsrc = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(ycoords - hsrc))  # [S, H]
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(xcoords - wsrc))  # [S, W]
    return ry, rx


def _pair_kernel_fusedbox(
    frame_ref, prob_ref, out_ref, *, h, w, s, dtype, scale, min_side
):
    """grid = (T*O,): bbox + matrices + crop fused — the prob block is read
    ONCE from HBM and serves both the box reductions and the crop contraction.
    The standalone bbox pass over the full [T, O, H, W] tensor (~5 ms of the
    480p scoring round, profile_fused.json) disappears entirely. The prob
    block streams in as f32 so the >0.5 threshold is exact (identical boxes
    to the XLA mask_to_yxhw path); the dot inputs are cast to ``dtype``
    in-register."""
    prob = prob_ref[0, 0]  # [H, W] f32
    ymin, ymax, xmin, xmax = _bbox_minmax_inkernel(prob, h, w, scale, min_side)
    ry, rx = _mats_from_scalars(ymin, ymax, xmin, xmax, h, w, s)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    ry = ry.astype(dtype)
    rx = rx.astype(dtype)
    dn = (((1,), (1,)), ((), ()))

    def crop2d(img):
        tmp = jnp.dot(
            ry, img, precision=prec, preferred_element_type=jnp.float32
        ).astype(dtype)  # [S, W]
        return jax.lax.dot_general(
            tmp, rx, dn, precision=prec, preferred_element_type=jnp.float32
        ).astype(dtype)  # [S, S]

    for ch in range(3):
        out_ref[0, ch] = crop2d(frame_ref[0, ch])
    out_ref[0, 3] = crop2d(prob.astype(dtype))


@functools.partial(
    jax.jit, static_argnames=("out_size", "dtype", "interpret", "scale", "min_side")
)
def roi_crop_pairs_pallas_fusedbox(
    frames: jnp.ndarray,  # [T, H, W, 3]
    probs: jnp.ndarray,  # [T, O, H, W] float32
    out_size: int = ROI_S,
    dtype=jnp.float32,
    interpret: bool = False,
    scale: float = 1.5,
    min_side: float = 128.0,
) -> jnp.ndarray:
    """T×O pair crops with the ROI boxes computed IN-KERNEL from the prob
    blocks: → [T*O, S, S, 4]. vs roi_crop_pairs_pallas, this removes (a) the
    separate XLA bbox program reading the full prob tensor, and (b) the
    materialised bf16 copy of ``probs`` (the kernel streams the f32 planes
    and casts in-register) — at 480p/64f/3obj that is ~470 MB less HBM
    traffic per scoring round."""
    t, h, w, _ = frames.shape
    o = probs.shape[1]
    s = out_size
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2)).astype(dtype)

    kern = functools.partial(
        _pair_kernel_fusedbox, h=h, w=w, s=s, dtype=dtype,
        scale=scale, min_side=min_side,
    )
    grid_spec = pl.GridSpec(
        grid=(t * o,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, h, w), lambda i: (i // o, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, h, w),
                lambda i: (i // o, i % o, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, s, s), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    itemsize = jnp.dtype(dtype).itemsize
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t * o, 4, s, s), dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * (s * h * w + s * s * w) * 4,
            bytes_accessed=t * 3 * h * w * itemsize  # frames, reused across O
            + t * o * h * w * 4  # f32 prob planes, once each
            + t * o * 4 * s * s * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames_chw, probs.astype(jnp.float32))
    return jnp.transpose(out, (0, 2, 3, 1))


def roi_crop_pairs_from_probs(
    frames, probs, out_size: int = ROI_S, dtype=jnp.float32, impl: str = "auto"
):
    """Flagship scoring-path crop: prob maps → ROI boxes → (tf_roi, tp_roi).

    The single dispatch point for the whole box+crop stage. impl:
    ``"pallas"`` — fused-bbox kernel (boxes computed in-kernel, prob tensor
    read once; caller asserts a TPU lowering); ``"einsum"`` — XLA
    mask_to_yxhw reductions + pair-indexed einsums; ``"auto"`` — policy via
    IVOSW_ENABLE_PALLAS / the Mosaic probe, platform resolved at LOWERING
    time (:func:`_dispatch_by_platform`) so CPU-mesh programs never see a
    pallas call. All paths share box semantics exactly (f32 ``> 0.5``
    threshold, reference expansion rules)."""

    def _pallas():
        out = roi_crop_pairs_pallas_fusedbox(frames, probs, out_size, dtype=dtype)
        return out[..., :3], out[..., 3:]

    def _einsum():
        from ivosw_tpu.ops.roi import mask_to_yxhw

        t, o = probs.shape[0], probs.shape[1]
        h, w = frames.shape[1], frames.shape[2]
        yxhw = mask_to_yxhw((probs > 0.5).reshape(t * o, h, w), scale=1.5)
        return roi_crop_pairs_einsum(frames, probs, yxhw, out_size, dtype=dtype)

    if impl == "auto":
        # branch avals must match: the einsum path leaves its f32 MXU
        # accumulations un-rounded while the pallas kernel emits ``dtype``;
        # the consumers (bf16 encoder) cast to ``dtype`` anyway, so rounding
        # here changes nothing downstream
        return _dispatch_by_platform(
            _pallas, lambda: tuple(x.astype(dtype) for x in _einsum())
        )
    if impl == "pallas":
        return _pallas()
    if impl != "einsum":
        raise NotImplementedError(impl)
    return _einsum()


def _pair_kernel_premat(ry_ref, rx_ref, frame_ref, prob_ref, out_ref, *, dtype):
    """Variant with the interpolation matrices computed OUTSIDE the kernel
    (batched XLA iota/abs/max over all pairs) and streamed in as per-pair
    blocks: the kernel body is four pure MXU dots — no VPU matrix build or
    f32→bf16 casts on the per-pair critical path. Costs one extra HBM read
    of Ry/Rx (~131 MB bf16 at 480p ≈ 0.17 ms at HBM speed)."""
    ry = ry_ref[0]  # [S, H]
    rx = rx_ref[0]  # [S, W]
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    dn = (((1,), (1,)), ((), ()))

    def crop2d(img):
        tmp = jnp.dot(
            ry, img, precision=prec, preferred_element_type=jnp.float32
        ).astype(dtype)
        return jax.lax.dot_general(
            tmp, rx, dn, precision=prec, preferred_element_type=jnp.float32
        ).astype(dtype)

    for ch in range(3):
        out_ref[0, ch] = crop2d(frame_ref[0, ch])
    out_ref[0, 3] = crop2d(prob_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("out_size", "dtype", "interpret"))
def roi_crop_pairs_pallas_premat(
    frames: jnp.ndarray,  # [T, H, W, 3]
    probs: jnp.ndarray,  # [T, O, H, W]
    yxhw: jnp.ndarray,  # [T*O, 4]
    out_size: int = ROI_S,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Like :func:`roi_crop_pairs_pallas` but with host-of-kernel matrices
    (see :func:`_pair_kernel_premat`). → [T*O, S, S, 4]."""
    from ivosw_tpu.ops.roi import _interp_matrix

    t, h, w, _ = frames.shape
    o = probs.shape[1]
    s = out_size
    ymin, ymax, xmin, xmax = yxhw_to_minmax(yxhw)
    ry_all = _interp_matrix(ymin, ymax, h, s).astype(dtype)  # [T*O, S, H]
    rx_all = _interp_matrix(xmin, xmax, w, s).astype(dtype)  # [T*O, S, W]
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2)).astype(dtype)

    kern = functools.partial(_pair_kernel_premat, dtype=dtype)
    grid_spec = pl.GridSpec(
        grid=(t * o,),
        in_specs=[
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 3, h, w), lambda i: (i // o, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, h, w),
                lambda i: (i // o, i % o, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, s, s), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    itemsize = jnp.dtype(dtype).itemsize
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t * o, 4, s, s), dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * (s * h * w + s * s * w) * 4,
            bytes_accessed=(t * 3 + t * o) * h * w * itemsize
            + t * o * (s * h + s * w + 4 * s * s) * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ry_all, rx_all, frames_chw, probs.astype(dtype))
    return jnp.transpose(out, (0, 2, 3, 1))


def roi_crop_pairs(frames, probs, yxhw, out_size: int = ROI_S, dtype=jnp.float32):
    """Flagship T×O pair crop: pallas kernel when enabled, pair-indexed
    einsums otherwise (same dtype policy on both paths, parity-tested).
    Returns (tf_roi [T*O, S, S, 3], tp_roi [T*O, S, S, 1]).

    dtype=float32 (default) keeps full-precision MXU contractions; bfloat16
    is the scoring-path fast mode — half the HBM traffic and single-pass MXU
    dots (f32 accumulation), feeding an encoder that is bf16 anyway."""

    def _pallas():
        out = roi_crop_pairs_pallas(frames, probs, yxhw, out_size, dtype=dtype)
        return out[..., :3], out[..., 3:]

    return _dispatch_by_platform(
        _pallas,
        # .astype(dtype): match the pallas branch's aval (see
        # roi_crop_pairs_from_probs — einsum accumulations stay f32)
        lambda: tuple(
            x.astype(dtype)
            for x in roi_crop_pairs_einsum(frames, probs, yxhw, out_size, dtype=dtype)
        ),
    )


def roi_crop_pairs_einsum(
    frames, probs, yxhw, out_size: int = ROI_S, dtype=jnp.float32
):
    """XLA path of the flagship pair crop (the default; see roi_crop_pairs)."""
    t, h, w, _ = frames.shape
    o = probs.shape[1]
    s = out_size

    from ivosw_tpu.ops.roi import _interp_matrix

    ymin, ymax, xmin, xmax = yxhw_to_minmax(yxhw)
    ry = _interp_matrix(ymin, ymax, h, s).reshape(t, o, s, h).astype(dtype)
    rx = _interp_matrix(xmin, xmax, w, s).reshape(t, o, s, w).astype(dtype)
    frames = frames.astype(dtype)
    probs = probs.astype(dtype)
    # float32 → HIGHEST (the TPU default would silently drop multiplicands
    # to bf16); explicit bf16 → single-pass MXU dots with f32 accumulation
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    kw = dict(precision=precision, preferred_element_type=jnp.float32)
    # frame crop: contract each frame ONCE per pair via pair-indexed
    # interpolation matrices — no [T*O, H, W, 3] broadcast in HBM
    tmp_f = jnp.einsum("tosh,thwc->toswc", ry, frames, **kw).astype(dtype)
    tf_roi = jnp.einsum("toxw,toswc->tosxc", rx, tmp_f, **kw)
    tmp_p = jnp.einsum("tosh,tohw->tosw", ry, probs, **kw).astype(dtype)
    tp_roi = jnp.einsum("toxw,tosw->tosx", rx, tmp_p, **kw)
    return (
        tf_roi.reshape(t * o, s, s, 3),
        tp_roi.reshape(t * o, s, s, 1),
    )
