"""Round-1 human scribble loading: DAVIS ships Scribbles/<seq>/00N.json;
the session must prefer them over robot bootstrapping."""

import json
import os

import numpy as np


def _mini_davis_with_scribbles(tmp_path):
    from PIL import Image

    root = str(tmp_path / "davis")
    rng = np.random.default_rng(0)
    seq = "scrib-seq"
    os.makedirs(f"{root}/JPEGImages/480p/{seq}")
    os.makedirs(f"{root}/Annotations/480p/{seq}")
    os.makedirs(f"{root}/Scribbles/{seq}")
    for t in range(4):
        h, w = 48, 64
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        ann = np.zeros((h, w), dtype=np.uint8)
        ann[10:30, 20:44] = 1
        Image.fromarray(img).save(f"{root}/JPEGImages/480p/{seq}/{t:05d}.jpg")
        p = Image.fromarray(ann, mode="P")
        p.putpalette([0, 0, 0, 255, 0, 0] + [0] * 762)
        p.save(f"{root}/Annotations/480p/{seq}/{t:05d}.png")
    os.makedirs(f"{root}/ImageSets/2017", exist_ok=True)
    with open(f"{root}/ImageSets/2017/val.txt", "w") as fp:
        fp.write(seq + "\n")
    # human scribble files: scribble 1 annotates frame 2, scribble 2 frame 0
    for idx, frame in ((1, 2), (2, 0), (3, 1)):
        scribbles = [[] for _ in range(4)]
        scribbles[frame].append(
            {
                "path": [[0.4, 0.4], [0.6, 0.5]],
                "object_id": 1,
                "start_time": 0,
                "end_time": 1000,
            }
        )
        with open(f"{root}/Scribbles/{seq}/{idx:03d}.json", "w") as fp:
            json.dump({"sequence": seq, "scribbles": scribbles}, fp)
    return root, seq


def test_session_uses_human_scribbles(tmp_path):
    from ivosw_tpu.data.registry import SequenceRegistry
    from ivosw_tpu.data.scribbles import annotated_frames
    from ivosw_tpu.interact.session import InteractiveSession

    root, seq = _mini_davis_with_scribbles(tmp_path)
    registry = SequenceRegistry.from_davis_root(root)

    first_frames = []
    with InteractiveSession(registry, subset="val", max_nb_interactions=1) as sess:
        while sess.next():
            _, scribbles, first = sess.get_scribbles()
            assert first
            first_frames.append(annotated_frames(sess.sample_last_scribble)[0])
            gt = registry.load_annotations(seq)
            sess.submit_masks(gt)
    # frames come from the three human scribble files, not the robot
    assert first_frames == [2, 0, 1]
