"""QA pipeline tests: data generation dumps, dataset enumeration,
augmentations, and the fused AssessNet train step."""

import os

import numpy as np
import pytest

from ivosw_tpu.core.config import Config
from ivosw_tpu.data.registry import SequenceRegistry
from ivosw_tpu.models.vos.fake import FakeVOS
from ivosw_tpu.train import generate_qa_data, train_assess


@pytest.fixture(scope="module")
def registry():
    return SequenceRegistry.synthetic(
        ["qa-a", "qa-b"],
        num_frames=5,
        image_size=(64, 48),
        num_objects=2,
        split="train",
        seed=2,
    )


@pytest.fixture(scope="module")
def dump_dir(registry, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qa_dumps")
    cfg = generate_qa_data.configure(Config())
    cfg.davis_interactive.max_nb_interactions = 2
    stats = generate_qa_data.run(
        cfg,
        registry=registry,
        adapter=FakeVOS(registry, max_quality=0.8),
        samples=[("qa-a", 1), ("qa-b", 1)],
        save_result_dir=str(tmp),
    )
    # 2 seqs × 2 rounds × 5 frames × 2 objects prob maps
    assert stats["dumped_prob_maps"] == 40
    return str(tmp)


def test_dump_layout(dump_dir):
    path = os.path.join(dump_dir, "interaction-1", "scribble-1", "qa-a", "probs", "1")
    assert os.path.isdir(path)
    assert sorted(os.listdir(path)) == [f"{i:05d}.png" for i in range(5)]


def test_qa_dataset_enumeration_and_load(registry, dump_dir):
    from ivosw_tpu.data.qa_dataset import QARegressionDataset

    ds = QARegressionDataset(registry, dump_dir)
    assert len(ds) == 40
    s = ds.load(0)
    assert s["img"].shape == (48, 64, 3)
    assert s["prob"].shape == (48, 64)
    assert set(np.unique(s["label"])) <= {0, 1}
    assert 0.0 <= s["prob"].max() <= 1.0

    batches = list(ds.batches(8))
    assert len(batches) == 5
    assert batches[0]["img"].shape == (8, 48, 64, 3)


def test_augment_pipeline_preserves_labels(registry):
    from ivosw_tpu.data.augment import QAAugmentPipeline

    anns = registry.load_annotations("qa-a")
    img = registry.load_images("qa-a")[0]
    label = (anns[0] == 1).astype(np.uint8)
    sample = {"img": img, "prob": label.astype(np.float32), "label": label}
    aug = QAAugmentPipeline(size_wh=(64, 48), seed=3)
    for _ in range(5):
        out = aug(dict(sample))
        assert out["img"].shape == (48, 64, 3)
        assert out["label"].max() == 1, "object label must survive augmentation"
        assert out["img"].dtype == np.float32


def test_assess_train_step_runs_and_learns(registry, dump_dir):
    """A few fused steps on one batch must run finite and reduce the loss."""
    import jax
    import jax.numpy as jnp

    from ivosw_tpu.data.qa_dataset import QARegressionDataset
    from ivosw_tpu.models.assess import init_assess_variables
    from ivosw_tpu.train.train_assess import assess_train_step, make_assess_optimizer

    ds = QARegressionDataset(registry, dump_dir)
    batch = next(ds.batches(4, shuffle=False))
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = init_assess_variables(jax.random.PRNGKey(0))
    optimizer = make_assess_optimizer(0.9, 5e-4)
    opt_state = optimizer.init(variables["params"])

    losses = []
    for _ in range(6):
        variables, opt_state, loss, diff, n_valid = assess_train_step(
            variables, opt_state, device_batch, jnp.float32(1e-3), optimizer
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert n_valid > 0
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_train_assess_driver(registry, dump_dir, tmp_path):
    cfg = Config()
    cfg.assess_net.train_batch_size = 4
    cfg.assess_net.lr = 1e-3
    cfg.ckpt_dir = str(tmp_path / "weights")
    stats = train_assess.run(
        cfg, registry=registry, save_result_dir=dump_dir, num_epochs=1
    )
    assert np.isfinite(stats["loss_avg"])
    # epoch==num_epochs triggers a checkpoint
    assert os.path.exists(os.path.join(cfg.ckpt_dir, "assess_net.orbax"))


def test_train_assess_resume(registry, dump_dir, tmp_path, monkeypatch):
    """Mid-train snapshot/resume: a run killed mid-epoch continues from the
    snapshot (same remaining batch sequence, fresh augmentation draws) and
    finishes the full schedule — the OOM-survival path of the HD assess
    stage (the tunnel client's host-memory leak kills long stages)."""
    cfg = Config()
    cfg.assess_net.train_batch_size = 4
    cfg.assess_net.lr = 1e-3
    cfg.ckpt_dir = str(tmp_path / "weights")
    resume = str(tmp_path / "assess_resume.orbax")

    real_step = train_assess.assess_train_step
    calls = {"n": 0}

    def dying_step(*args, **kwargs):
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated OOM kill")
        calls["n"] += 1
        return real_step(*args, **kwargs)

    monkeypatch.setattr(train_assess, "assess_train_step", dying_step)
    with pytest.raises(KeyboardInterrupt):
        train_assess.run(
            cfg, registry=registry, save_result_dir=dump_dir,
            num_epochs=2, resume_path=resume, save_every=1,
        )
    assert os.path.exists(resume)  # snapshot survived the kill
    monkeypatch.setattr(train_assess, "assess_train_step", real_step)

    from ivosw_tpu.utils.checkpoint import load_pytree

    snap = load_pytree(resume, device=False)
    assert int(snap["epoch"]) == 1 and int(snap["step"]) == 3

    stats = train_assess.run(
        cfg, registry=registry, save_result_dir=dump_dir,
        num_epochs=2, resume_path=resume, save_every=1,
    )
    assert np.isfinite(stats["loss_avg"])
    assert not os.path.exists(resume)  # removed on completion
    assert os.path.exists(os.path.join(cfg.ckpt_dir, "assess_net.orbax"))
