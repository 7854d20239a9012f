"""davisinteractive compat shim: reference-style driver loop runs unchanged."""

import numpy as np


def test_reference_style_loop_via_shim(tmp_path):
    # fabricate a DAVIS-layout tree
    import os

    from PIL import Image

    root = str(tmp_path / "davis")
    rng = np.random.default_rng(0)
    for seq in ["mini"]:
        os.makedirs(f"{root}/JPEGImages/480p/{seq}", exist_ok=True)
        os.makedirs(f"{root}/Annotations/480p/{seq}", exist_ok=True)
        for t in range(4):
            h, w = 48, 64
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            ann = np.zeros((h, w), dtype=np.uint8)
            ann[10 + 2 * t : 30 + 2 * t, 15 : 40] = 1
            img[10 + 2 * t : 30 + 2 * t, 15 : 40] = [200, 60, 60]
            Image.fromarray(img).save(f"{root}/JPEGImages/480p/{seq}/{t:05d}.jpg")
            p = Image.fromarray(ann, mode="P")
            p.putpalette([0, 0, 0, 255, 0, 0] + [0] * 762)
            p.save(f"{root}/Annotations/480p/{seq}/{t:05d}.png")
    os.makedirs(f"{root}/ImageSets/2017", exist_ok=True)
    with open(f"{root}/ImageSets/2017/val.txt", "w") as fp:
        fp.write("mini\n")

    # --- reference-style driver code, only the import changed ---
    from ivosw_tpu.compat.davisinteractive import (
        Davis,
        DavisInteractiveSession,
        batched_jaccard,
        scribbles as scribble_utils,
    )

    davis = Davis(davis_root=root)
    assert Davis.dataset["mini"]["num_objects"] == 1
    gt_masks = davis.load_annotations("mini")

    rounds = 0
    with DavisInteractiveSession(
        host="localhost",
        davis_root=root,
        subset="val",
        metric_to_optimize="J_AND_F",
        max_nb_interactions=2,
        max_time=None,
        report_save_dir=str(tmp_path / "report"),
    ) as sess:
        sess.connector.service.robot.min_nb_nodes = 4
        while sess.next():
            sequence, scribbles, first = sess.get_scribbles(only_last=False)
            af = scribble_utils.annotated_frames(sess.sample_last_scribble)
            assert len(af) > 0
            # trivial "backbone": echo ground truth
            sess.submit_masks(gt_masks, next_scribble_frame_candidates=[af[0]])
            rounds += 1
        summary = sess.get_global_summary()

    # 3 scribble samples × gt-echo terminates after round 1 each (perfect)
    assert rounds >= 3
    curve = summary["curve"]["J_AND_F"]
    assert curve[0] == 1.0
    j = batched_jaccard(gt_masks, gt_masks, nb_objects=1)
    np.testing.assert_allclose(j, 1.0)
    assert os.path.exists(tmp_path / "report" / "session_report.csv")
