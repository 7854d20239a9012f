"""YouTube-VOS converter → json registry → eval driver, end-to-end."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def ytbvos_src(tmp_path):
    """Fabricate a YouTube-VOS-style source tree + scribble directory."""
    from PIL import Image

    src = tmp_path / "ytbvos_src"
    scb = tmp_path / "scb"
    rng = np.random.default_rng(0)
    seqs = ["0a1b2c", "3d4e5f"]
    for seq in seqs:
        (src / "train" / "JPEGImages" / seq).mkdir(parents=True)
        (src / "train" / "CleanedAnnotations" / seq).mkdir(parents=True)
        (scb / seq).mkdir(parents=True)
        # youtube-style sparse frame numbering to exercise renumbering
        for j, fnum in enumerate([5, 10, 15, 20]):
            h, w = 48, 64
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            ann = np.zeros((h, w), dtype=np.uint8)
            ann[10 + j : 30 + j, 20:44] = 1
            img[10 + j : 30 + j, 20:44] = [180, 70, 70]
            Image.fromarray(img).save(
                src / "train" / "JPEGImages" / seq / f"{fnum:05d}.jpg"
            )
            p = Image.fromarray(ann, mode="P")
            p.putpalette([0, 0, 0, 255, 0, 0] + [0] * 762)
            p.save(src / "train" / "CleanedAnnotations" / seq / f"{fnum:05d}.png")
        with open(scb / seq / "001.json", "w") as fp:
            json.dump({"sequence": seq, "scribbles": [[] for _ in range(4)]}, fp)
    with open(scb / "val.txt", "w") as fp:
        fp.write("\n".join(seqs) + "\n")
    return str(src), str(scb), str(tmp_path / "dst")


def test_converter_and_registry(ytbvos_src):
    from ivosw_tpu.data.registry import SequenceRegistry
    from ivosw_tpu.data.ytbvos_prepare import create_dataset, create_json

    src, scb, dst = ytbvos_src
    seqs = create_dataset(src, dst, scb)
    assert len(seqs) == 2
    # renumbered zero-based filenames
    files = sorted(os.listdir(os.path.join(dst, "JPEGImages", "480p", seqs[0])))
    assert files == ["00000.jpg", "00001.jpg", "00002.jpg", "00003.jpg"]

    json_path = create_json(dst)
    with open(json_path) as fp:
        data = json.load(fp)
    info = data["sequences"][seqs[0]]
    assert info["num_frames"] == 4
    assert info["image_size"] == [64, 48]  # (w, h), reference convention
    assert info["num_objects"] == 1
    assert info["num_scribbles"] == 3

    registry = SequenceRegistry.from_json(json_path, root=dst)
    assert registry.subset("val") == sorted(seqs)
    frames = registry.load_images(seqs[0])
    assert frames.shape == (4, 48, 64, 3)


def test_eval_on_converted_ytbvos(ytbvos_src, tmp_path):
    from ivosw_tpu.core.config import Config
    from ivosw_tpu.data.registry import SequenceRegistry
    from ivosw_tpu.data.ytbvos_prepare import create_dataset, create_json
    from ivosw_tpu.eval.eval_agent import evaluate
    from ivosw_tpu.models.vos.fake import FakeVOS

    src, scb, dst = ytbvos_src
    create_dataset(src, dst, scb)
    json_path = create_json(dst)
    registry = SequenceRegistry.from_json(json_path, root=dst)

    cfg = Config(phase="eval", setting="wild", method="random", dataset="ytbvos")
    summary = evaluate(
        cfg,
        registry,
        FakeVOS(registry, max_quality=0.8),
        subset="val",
        max_nb_interactions=2,
        report_save_dir=str(tmp_path / "out"),
    )
    assert len(summary["curve"]["J_AND_F"]) == 2
    assert 0 < summary["auc"] <= 1
