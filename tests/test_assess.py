"""AssessNet tests: ROI geometry goldens, grid_sample parity via torch,
encoder import parity vs torchvision resnet50, fused clip scoring."""

import numpy as np
import pytest


# ---------------------------------------------------------------- ROI box ---
def _ref_yxhw(np_mask, scale=1.5):
    """Hand NumPy restatement of the reference box rules
    (models/assessment.py:110-161) used as the golden oracle."""
    out = np.zeros((np_mask.shape[0], 4), dtype=np.float32)
    for b in range(np_mask.shape[0]):
        ys, xs = np.where(np_mask[b] >= 0.49)
        if ys.size == 0:
            ymin, ymax = 0, np_mask.shape[1]
            xmin, xmax = 0, np_mask.shape[2]
        else:
            ymin, ymax = ys.min(), ys.max()
            xmin, xmax = xs.min(), xs.max()
        if (ymax - ymin) < 128:
            res = 128.0 - (ymax - ymin)
            ymin -= int(res / 2)
            ymax += int(res / 2)
        if (xmax - xmin) < 128:
            res = 128.0 - (xmax - xmin)
            xmin -= int(res / 2)
            xmax += int(res / 2)
        oh, ow = ymax - ymin + 1, xmax - xmin + 1
        ymin = np.maximum(-5, ymin - (scale - 1) / 2.0 * oh)
        ymax = np.minimum(np_mask.shape[1] + 5, ymax + (scale - 1) / 2.0 * oh)
        xmin = np.maximum(-5, xmin - (scale - 1) / 2.0 * ow)
        xmax = np.minimum(np_mask.shape[2] + 5, xmax + (scale - 1) / 2.0 * ow)
        out[b] = [
            (ymax + ymin) / 2.0,
            (xmax + xmin) / 2.0,
            ymax - ymin + 1,
            xmax - xmin + 1,
        ]
    return out


def test_mask_to_yxhw_golden():
    import jax.numpy as jnp

    from ivosw_tpu.ops.roi import mask_to_yxhw

    rng = np.random.default_rng(0)
    masks = np.zeros((4, 240, 427), dtype=np.float32)
    masks[0, 50:90, 100:160] = 1.0          # small box -> min-128 expansion
    masks[1, 10:200, 30:400] = 1.0          # large box
    masks[2] = 0.0                          # empty -> whole image
    masks[3, 120:124, 200:204] = 1.0        # tiny blob
    got = np.asarray(mask_to_yxhw(masks, scale=1.5))
    want = _ref_yxhw(masks, scale=1.5)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # bool fast path (score_clip passes `probs > 0.5` directly so the bbox
    # reductions never read a materialised f32 plane): identical boxes
    got_bool = np.asarray(mask_to_yxhw(jnp.asarray(masks >= 0.49), scale=1.5))
    np.testing.assert_array_equal(got_bool, got)


def test_roi_crop_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from ivosw_tpu.ops.roi import mask_to_yxhw, roi_crop, roi_theta

    rng = np.random.default_rng(1)
    h, w, s = 120, 214, 64
    img = rng.random((2, h, w, 3)).astype(np.float32)
    mask = np.zeros((2, h, w), dtype=np.float32)
    mask[0, 20:70, 40:120] = 1.0
    mask[1, 5:100, 10:60] = 1.0

    yxhw = np.asarray(mask_to_yxhw(mask, scale=1.5, min_side=32.0))
    ours = np.asarray(roi_crop(img, yxhw, out_size=s, dtype=np.float32))

    theta = np.asarray(roi_theta(yxhw, (h, w)))
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    grid = F.affine_grid(torch.from_numpy(theta), (2, 1, s, s), align_corners=True)
    ref = F.grid_sample(timg, grid, align_corners=True).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=1e-4)


# ------------------------------------------------------------- AssessNet ---
def test_assess_forward_shapes():
    import jax

    from ivosw_tpu.models.assess import assess_forward, init_assess_variables

    variables = init_assess_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tf = rng.random((2, 96, 96, 3)).astype(np.float32)
    tp = rng.random((2, 96, 96)).astype(np.float32)
    q = np.asarray(assess_forward(variables, tf, tp))
    assert q.shape == (2, 1)
    assert np.isfinite(q).all()


def _torch_resnet50_trunk(torch):
    """Minimal torch ResNet-50 trunk with torchvision state_dict naming
    (conv1/bn1/layer{1..4}.{i}.conv{j}/bn{j}/downsample.{0,1}) — test oracle
    for the checkpoint importer; torchvision itself isn't installed here."""
    nn = torch.nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride):
            super().__init__()
            cout = width * 4
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idty = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idty)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cfg = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
            cin = 64
            for li, (width, blocks, stride) in enumerate(cfg, start=1):
                layers = []
                for b in range(blocks):
                    layers.append(Bottleneck(cin, width, stride if b == 0 else 1))
                    cin = width * 4
                setattr(self, f"layer{li}", nn.Sequential(*layers))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    return Trunk()


def test_assess_torch_encoder_parity():
    """Random-weight torch ResNet-50 assembled the reference way
    (conv1(f)+conv1_p(p) fused stem, global pool, fc) must match our flax
    encoder after weight conversion."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from ivosw_tpu.models.assess import AssessNet
    from ivosw_tpu.utils.torch_import import assess_variables_from_torch

    torch.manual_seed(0)
    resnet = _torch_resnet50_trunk(torch).eval()
    # randomise BN stats so stat import is actually exercised
    with torch.no_grad():
        for m in resnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    conv1_p = torch.nn.Conv2d(1, 64, 7, stride=2, padding=3, bias=False)
    fc1 = torch.nn.Linear(2048, 1)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def torch_forward(tf_roi, tp_roi):
        f = (tf_roi - mean) / std
        x = resnet.conv1(f) + conv1_p(tp_roi)
        x = resnet.relu(resnet.bn1(x))
        x = resnet.maxpool(x)
        x = resnet.layer4(resnet.layer3(resnet.layer2(resnet.layer1(x))))
        pooled = F.avg_pool2d(x, x.shape[-1]).flatten(1)
        return fc1(pooled)

    # assemble a reference-layout state_dict: Encoder.<res-stage naming>
    sd = {}
    ren = {"layer1": "res2", "layer2": "res3", "layer3": "res4", "layer4": "res5"}
    for k, v in resnet.state_dict().items():
        if k.startswith("fc.") or "num_batches_tracked" in k:
            continue
        for old, new in ren.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        sd["Encoder." + k] = v
    sd["Encoder.conv1_p.weight"] = conv1_p.weight
    sd["fc1.weight"] = fc1.weight
    sd["fc1.bias"] = fc1.bias

    import jax.numpy as jnp

    variables = assess_variables_from_torch(sd)
    rng = np.random.default_rng(2)
    tf = rng.random((2, 64, 64, 3)).astype(np.float32)
    tp = rng.random((2, 64, 64, 1)).astype(np.float32)

    with torch.no_grad():
        q_ref = torch_forward(
            torch.from_numpy(tf.transpose(0, 3, 1, 2)),
            torch.from_numpy(tp.transpose(0, 3, 1, 2)),
        ).numpy()

    model = AssessNet(dtype=jnp.float32)
    q_ours = np.asarray(model.apply(variables, tf, tp, train=False))
    np.testing.assert_allclose(q_ours, q_ref, atol=2e-3)


def test_score_clip_fused_vs_loop():
    """One fused T×O pass must equal per-pair forwards (reference loop)."""
    import jax

    from ivosw_tpu.models.assess import (
        assess_forward,
        init_assess_variables,
        mean_object_quality,
        score_clip,
    )

    variables = init_assess_variables(jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    t, o, h, w = 3, 2, 96, 96
    frames = rng.random((t, h, w, 3)).astype(np.float32)
    probs = rng.random((t, o, h, w)).astype(np.float32)
    obj_valid = np.array([1.0, 1.0], dtype=np.float32)

    fused = np.asarray(score_clip(variables, frames, probs, obj_valid))

    loop = np.zeros((t, o), dtype=np.float32)
    for i in range(o):
        loop[:, i] = np.asarray(
            assess_forward(variables, frames, probs[:, i])
        )[:, 0]
    np.testing.assert_allclose(fused, loop, atol=2e-2)

    mq = np.asarray(mean_object_quality(fused, obj_valid))
    np.testing.assert_allclose(mq, fused.mean(axis=1), atol=1e-6)


def test_score_clip_chunked_matches_monolithic():
    """chunk= must not change the scores: the interleaved per-chunk geometry
    (perf_probe.json v4, ~10 % faster on v5e) is a pure scheduling change.
    Covers a chunk that divides T, one that leaves a ragged tail, and the
    folded variant."""
    import jax

    from ivosw_tpu.models.assess import (
        init_assess_variables,
        score_clip,
        score_clip_folded,
    )
    from ivosw_tpu.models.fold import fold_assess_variables

    variables = init_assess_variables(jax.random.PRNGKey(1))
    folded = fold_assess_variables(variables)
    rng = np.random.default_rng(7)
    t, o, h, w = 5, 2, 96, 96
    frames = rng.random((t, h, w, 3)).astype(np.float32)
    probs = rng.random((t, o, h, w)).astype(np.float32)
    obj_valid = np.array([1.0, 1.0], dtype=np.float32)

    mono = np.asarray(score_clip(variables, frames, probs, obj_valid))
    for chunk in (2, 3, 5, 64):
        part = np.asarray(
            score_clip(variables, frames, probs, obj_valid, chunk=chunk)
        )
        # bf16 encoder + per-chunk MXU batch tiling shifts accumulation
        # order; observed <=1e-6 on CPU, up to ~1e-2 on TPU (same band as
        # the fused-vs-loop comparison above)
        np.testing.assert_allclose(mono, part, atol=2e-2)

    mono_f = np.asarray(score_clip_folded(folded, frames, probs, obj_valid))
    part_f = np.asarray(
        score_clip_folded(folded, frames, probs, obj_valid, chunk=2)
    )
    np.testing.assert_allclose(mono_f, part_f, atol=2e-2)


def test_init_from_imagenet_trunk_equivalence(tmp_path):
    """init_from_imagenet(path) on a torchvision-named resnet50 state_dict
    must produce the same trunk/conv1/bn1 (params AND batch stats) as the
    proven reference-layout importer, a zero conv1_p (stem == pretrained RGB
    stem at init), and a fresh fc1."""
    torch = pytest.importorskip("torch")
    import jax

    from ivosw_tpu.models.assess import init_from_imagenet
    from ivosw_tpu.utils.torch_import import assess_variables_from_torch

    torch.manual_seed(1)
    resnet = _torch_resnet50_trunk(torch).eval()
    with torch.no_grad():
        for m in resnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    tv_sd = {k: v for k, v in resnet.state_dict().items()}
    # torchvision resnet50 also carries a 1000-class head: must be ignored
    tv_sd["fc.weight"] = torch.zeros(1000, 2048)
    tv_sd["fc.bias"] = torch.zeros(1000)
    path = tmp_path / "resnet50_imagenet.pt"
    torch.save(tv_sd, str(path))

    new_vars = init_from_imagenet(str(path), seed=0)
    assert new_vars is not None

    # reference-layout oracle through the round-1-proven importer
    sd = {}
    ren = {"layer1": "res2", "layer2": "res3", "layer3": "res4", "layer4": "res5"}
    for k, v in resnet.state_dict().items():
        if k.startswith("fc.") or "num_batches_tracked" in k:
            continue
        for old, new in ren.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        sd["Encoder." + k] = v
    sd["Encoder.conv1_p.weight"] = torch.zeros(64, 1, 7, 7)
    sd["fc1.weight"] = torch.zeros(1, 2048)
    sd["fc1.bias"] = torch.zeros(1)
    ref_vars = assess_variables_from_torch(sd)

    for group in ("params", "batch_stats"):
        for key in ("conv1", "bn1", "trunk"):
            if key not in ref_vars[group]:
                continue
            ref_leaves, _ = jax.tree.flatten(ref_vars[group][key])
            new_leaves, _ = jax.tree.flatten(new_vars[group][key])
            assert len(ref_leaves) == len(new_leaves)
            for r, n in zip(ref_leaves, new_leaves):
                np.testing.assert_allclose(np.asarray(r), np.asarray(n))

    assert not np.asarray(new_vars["params"]["conv1_p"]["kernel"]).any()
    # fresh head: non-zero random init, not the torchvision classifier
    fc1 = np.asarray(new_vars["params"]["fc1"]["kernel"])
    assert fc1.shape == (2048, 1) and np.abs(fc1).sum() > 0

    # missing file falls back to None
    assert init_from_imagenet(str(tmp_path / "nope.pt")) is None
