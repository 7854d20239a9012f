"""TAPNet native trainer: loss decreases and trained weights beat random
init on held-out synthetic clips."""

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
