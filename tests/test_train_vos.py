"""TAPNet native trainer: loss decreases and trained weights beat random
init on held-out synthetic clips."""

import os

import numpy as np
import pytest

from ivosw_tpu.core.config import Config
from ivosw_tpu.data.registry import SequenceRegistry
from ivosw_tpu.train import train_vos


@pytest.fixture(scope="module")
def registry():
    return SequenceRegistry.synthetic(
        ["tv-a", "tv-b", "tv-c"],
        num_frames=6,
        image_size=(64, 48),
        num_objects=1,
        split="train",
        seed=9,
    )


def test_tapnet_training_learns(registry, tmp_path):
    cfg = Config(seed=0)
    cfg.data.subset = "train"
    cfg.ckpt_dir = str(tmp_path / "weights")

    import jax.numpy as jnp

    from ivosw_tpu.interact.robot import ScribbleRobot
    from ivosw_tpu.models.vos.tapnet import init_tapnet_params
    from ivosw_tpu.train.train_vos import sample_windows, tapnet_window_loss
    from ivosw_tpu.utils.misc import set_random_seed

    rng = set_random_seed(0)
    robot = ScribbleRobot(seed=0)
    stream = sample_windows(registry, registry.subset("train"), rng, 3, robot)
    eval_batch = {k: jnp.asarray(v) for k, v in next(stream).items()}

    params0 = init_tapnet_params(0, hw=(48, 64))
    loss_before = float(tapnet_window_loss(params0, eval_batch))

    stats = train_vos.run(
        cfg, registry=registry, num_steps=40, window=3, lr=3e-4,
        params=params0, save_every=40,
    )
    loss_after = float(tapnet_window_loss(stats["params"], eval_batch))
    assert loss_after < loss_before, (loss_before, loss_after)
    assert (tmp_path / "weights" / "tapnet.orbax").exists()


@pytest.mark.parametrize("family", ["matchnet", "ipnet"])
def test_other_families_learn(registry, tmp_path, family):
    import jax.numpy as jnp

    from ivosw_tpu.interact.robot import ScribbleRobot
    from ivosw_tpu.train.train_vos import _family, sample_windows
    from ivosw_tpu.utils.misc import set_random_seed

    init_fn, loss_fn, _ = _family(family)
    rng = set_random_seed(0)
    robot = ScribbleRobot(seed=0)
    stream = sample_windows(registry, registry.subset("train"), rng, 3, robot)
    eval_batch = {k: jnp.asarray(v) for k, v in next(stream).items()}

    params0 = init_fn(0, hw=(48, 64))
    loss_before = float(loss_fn(params0, eval_batch))

    cfg = Config(seed=0, vos=family)
    cfg.data.subset = "train"
    cfg.ckpt_dir = str(tmp_path / f"w_{family}")
    stats = train_vos.run(
        cfg, registry=registry, num_steps=25, window=3, lr=3e-4,
        params=params0, save_every=25,
    )
    loss_after = float(loss_fn(stats["params"], eval_batch))
    assert loss_after < loss_before, (family, loss_before, loss_after)


def test_trained_tapnet_improves_segmentation(registry, tmp_path):
    """J on round-1 segmentation: trained params must beat random init."""
    import jax.numpy as jnp

    from ivosw_tpu.interact.robot import ScribbleRobot
    from ivosw_tpu.models.vos.tapnet import TAPNetAdapter, init_tapnet_params
    from ivosw_tpu.ops.metrics import batched_jaccard

    cfg = Config(seed=1)
    cfg.data.subset = "train"
    cfg.ckpt_dir = str(tmp_path / "w2")
    params0 = init_tapnet_params(1, hw=(48, 64))
    stats = train_vos.run(
        cfg, registry=registry, num_steps=60, window=3, lr=3e-4,
        params=params0, save_every=60,
    )

    frames = registry.load_images("tv-a")
    gt = registry.load_annotations("tv-a")
    robot = ScribbleRobot(seed=0)
    scrib = robot.interact("tv-a", np.zeros_like(gt), gt, 1, frame=2)

    def round1_j(params):
        adapter = TAPNetAdapter(params, encode_chunk=6)
        state = adapter.begin_sequence(frames, 1)
        masks, _, _ = adapter.segment(state, scrib, 2, 1)
        return batched_jaccard(gt, masks, nb_objects=1).mean()

    j_random = round1_j(init_tapnet_params(7, hw=(48, 64)))
    j_trained = round1_j(stats["params"])
    assert j_trained > j_random, (j_random, j_trained)


def test_round2_windows_have_reference_channel_recipe(registry):
    """Round-2 episodes: [prev, pos, neg] channels, active alpha ramp,
    second memory entry; round-1 episodes keep [0.5, pos, 0]."""
    from ivosw_tpu.interact.robot import ScribbleRobot
    from ivosw_tpu.train.train_vos import sample_windows
    from ivosw_tpu.utils.misc import set_random_seed

    rng = set_random_seed(3)
    robot = ScribbleRobot(seed=3)
    seqs = registry.subset("train")

    r1 = next(sample_windows(registry, seqs, rng, 4, robot, round2_prob=0.0))
    assert float(r1["mem2_valid"]) == 0.0
    np.testing.assert_allclose(r1["alpha"], 1.0)
    # round-1 recipe: prev channel 0.5 everywhere, neg channel zero
    np.testing.assert_allclose(r1["interaction"][..., 0], 0.5)
    np.testing.assert_allclose(r1["interaction"][..., 2], 0.0)
    assert not r1["interaction2"].any()

    r2 = next(sample_windows(registry, seqs, rng, 4, robot, round2_prob=1.0))
    assert float(r2["mem2_valid"]) == 1.0
    # alpha ramps down toward the second annotated frame (K-1)
    assert r2["alpha"][0] == 1.0 and r2["alpha"][-1] < 1.0
    assert (np.diff(r2["alpha"]) <= 0).all()
    # prev channel is the degraded previous-round map, not the 0.5 fill
    np.testing.assert_allclose(
        r2["interaction"][..., 0], r2["prev_round"][:, 0]
    )


def test_trained_tapnet_round2_beats_round1(tmp_path):
    """The monotone-curve property: with round-2-aware training, a second
    corrective interaction improves mean J over round 1 on every clip.

    Uses 2-object clips so round-1 quality has headroom (~0.85); on the
    easier 1-object fixture round 1 saturates ≥0.95 and the property is
    numerically unobservable."""
    from ivosw_tpu.interact.robot import ScribbleRobot
    from ivosw_tpu.models.vos.tapnet import TAPNetAdapter, init_tapnet_params
    from ivosw_tpu.ops.metrics import batched_jaccard

    reg2 = SequenceRegistry.synthetic(
        ["tv-a", "tv-b", "tv-c"],
        num_frames=6,
        image_size=(64, 48),
        num_objects=2,
        split="train",
        seed=9,
    )
    cfg = Config(seed=2)
    cfg.data.subset = "train"
    cfg.ckpt_dir = str(tmp_path / "w3")
    params0 = init_tapnet_params(2, hw=(48, 64))
    stats = train_vos.run(
        cfg, registry=reg2, num_steps=150, window=3, lr=3e-4,
        params=params0, save_every=150, round2_prob=0.6,
    )

    for seq in ["tv-a", "tv-b", "tv-c"]:
        frames = reg2.load_images(seq)
        gt = reg2.load_annotations(seq)
        robot = ScribbleRobot(seed=1)
        adapter = TAPNetAdapter(stats["params"], encode_chunk=6)
        state = adapter.begin_sequence(frames, 2)

        scrib1 = robot.interact(seq, np.zeros_like(gt), gt, 2, frame=2)
        masks1, _, state = adapter.segment(state, scrib1, 2, 1)
        j_per = batched_jaccard(gt, masks1, nb_objects=2)

        # round 2: corrective scribbles on the worst frame
        worst = int(np.argmin(j_per))
        scrib2 = robot.interact(seq, masks1, gt, 2, frame=worst)
        masks2, _, state = adapter.segment(state, scrib2, worst, 2)
        j1 = j_per.mean()
        j2 = batched_jaccard(gt, masks2, nb_objects=2).mean()
        assert j2 > j1, (seq, j1, j2)


@pytest.mark.parametrize("family", ["matchnet", "ipnet"])
def test_trained_family_round2_beats_round1(tmp_path, family):
    """Round-2-aware training must put each family's cross-round machinery
    (matchnet: global-map running max; ipnet: Get_weight fusion) on the
    training path: a second corrective interaction improves mean J over
    round 1 — mirroring test_trained_tapnet_round2_beats_round1."""
    from ivosw_tpu.interact.robot import ScribbleRobot
    from ivosw_tpu.ops.metrics import batched_jaccard
    from ivosw_tpu.train.train_vos import _family

    if family == "matchnet":
        from ivosw_tpu.models.vos.matchnet import MatchNetAdapter as Adapter
    else:
        from ivosw_tpu.models.vos.ipnet import IPNetAdapter as Adapter

    reg2 = SequenceRegistry.synthetic(
        ["tv-a", "tv-b", "tv-c"],
        num_frames=6,
        image_size=(64, 48),
        num_objects=2,
        split="train",
        seed=9,
    )
    import jax

    init_fn, _, _ = _family(family)
    cfg = Config(seed=2, vos=family)
    cfg.data.subset = "train"
    cfg.ckpt_dir = str(tmp_path / f"w3_{family}")
    params0 = init_fn(2, hw=(48, 64))
    # HIGHEST precision: TPU's default f32 convs run multi-pass bf16; at
    # this 150-step micro scale that lands a measurably different optimum
    # (observed: ipnet improved on only 1/3 clips on v5e at default
    # precision). Pinning makes the training outcome backend-stable; the
    # full-scale behaviour is guarded by the committed results matrices.
    with jax.default_matmul_precision("highest"):
        stats = train_vos.run(
            cfg, registry=reg2, num_steps=150, window=3, lr=3e-4,
            params=params0, save_every=150, round2_prob=0.6,
        )

        improved = 0
        for seq in ["tv-a", "tv-b", "tv-c"]:
            frames = reg2.load_images(seq)
            gt = reg2.load_annotations(seq)
            robot = ScribbleRobot(seed=1)
            adapter = Adapter(stats["params"], encode_chunk=6)
            state = adapter.begin_sequence(frames, 2)

            scrib1 = robot.interact(seq, np.zeros_like(gt), gt, 2, frame=2)
            masks1, _, state = adapter.segment(state, scrib1, 2, 1)
            j_per = batched_jaccard(gt, masks1, nb_objects=2)

            worst = int(np.argmin(j_per))
            scrib2 = robot.interact(seq, masks1, gt, 2, frame=worst)
            masks2, _, state = adapter.segment(state, scrib2, worst, 2)
            j1 = j_per.mean()
            j2 = batched_jaccard(gt, masks2, nb_objects=2).mean()
            if j2 > j1:
                improved += 1
    # demand improvement on a majority of clips (the un-tuned 150-step
    # budget leaves one clip of slack vs tapnet's all-3 requirement)
    assert improved >= 2, (family, improved)


def test_resume_matches_uninterrupted_run(registry, tmp_path, monkeypatch):
    """Mid-stage snapshot/resume: kill a run after 3 steps, resume it, and
    the final params must be BITWISE identical to an uninterrupted run
    (the resume fast-forwards the deterministic window stream, so the
    pipeline's bit-reproducibility survives interruption)."""
    import jax
    import jax.numpy as jnp

    from ivosw_tpu.models.vos.tapnet import init_tapnet_params

    def make_cfg(name):
        cfg = Config(seed=0)
        cfg.data.subset = "train"
        cfg.ckpt_dir = str(tmp_path / name)
        return cfg

    steps, every = 8, 2
    ref = train_vos.run(
        make_cfg("straight"), registry=registry, num_steps=steps, window=3,
        lr=3e-4, params=init_tapnet_params(0, hw=(48, 64)), save_every=every,
        resume_path=str(tmp_path / "straight_partial.orbax"),
    )

    rp = str(tmp_path / "partial.orbax")
    calls = {"n": 0}
    orig = train_vos.vos_train_step

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            raise KeyboardInterrupt
        return orig(*a, **k)

    monkeypatch.setattr(train_vos, "vos_train_step", bomb)
    with pytest.raises(KeyboardInterrupt):
        train_vos.run(
            make_cfg("interrupted"), registry=registry, num_steps=steps,
            window=3, lr=3e-4, params=init_tapnet_params(0, hw=(48, 64)),
            save_every=every, resume_path=rp,
        )
    monkeypatch.setattr(train_vos, "vos_train_step", orig)
    assert os.path.exists(rp)  # the step-2 snapshot survived the kill

    resumed = train_vos.run(
        make_cfg("interrupted"), registry=registry, num_steps=steps,
        window=3, lr=3e-4, params=init_tapnet_params(0, hw=(48, 64)),
        save_every=every, resume_path=rp,
    )
    assert not os.path.exists(rp)  # completion removes the snapshot
    assert (tmp_path / "interrupted" / "tapnet.orbax").exists()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(jnp.asarray(a), jnp.asarray(b)),
        ref["params"],
        resumed["params"],
    )


def test_pretrain_assess_pretext(registry, tmp_path):
    """Synthetic-degradation QA pretext: degradations span the quality
    axis, the trainer runs and checkpoints, and the loss is finite."""
    import numpy as np

    from ivosw_tpu.ops.metrics import batched_jaccard
    from ivosw_tpu.train.pretrain_assess import degrade_mask

    rng = np.random.default_rng(0)
    mask = np.zeros((48, 64), np.float32)
    mask[10:30, 20:50] = 1.0
    js = []
    for _ in range(60):
        d = (degrade_mask(mask, rng) > 0.8).astype(np.int32)
        js.append(
            float(
                np.asarray(
                    batched_jaccard(mask[None].astype(np.int32), d[None], 1)
                ).reshape(-1)[0]
            )
        )
    js = np.asarray(js)
    assert js.min() < 0.2 and js.max() > 0.8, (js.min(), js.max())
    assert js.std() > 0.2  # real spread, not two clusters at the ends

    from ivosw_tpu.train import pretrain_assess

    cfg = Config(seed=0)
    cfg.data.subset = "train"
    cfg.ckpt_dir = str(tmp_path / "qa_pre")
    cfg.assess_net.train_batch_size = 2
    cfg.assess_net.lr = 1e-4
    stats = pretrain_assess.run(cfg, registry=registry, num_steps=3)
    assert np.isfinite(stats["loss_avg"])
    assert (tmp_path / "qa_pre" / "assess_pretext.orbax").exists()
