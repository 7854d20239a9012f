"""Experience replay: in-memory ring buffer with reference-compatible CSV I/O.

Capability parity with the reference ReplayMemory (``models/momory_pool.py``):
same 12-column CSV schema with '/'-joined per-frame IoU vectors, the same
per-sequence quality-range filter ``p_max - p_min > sample_th`` on CSV load
(``momory_pool.py:44-116``), and the same ring-push + uniform-sampling
distribution.

Designed differences from the reference (documented, intentional):
- transitions live as parsed NumPy arrays, so ``sample_batch`` returns
  device-ready stacked arrays for one jitted Q-update instead of
  string-parsing rows in a DataLoader per batch;
- CSV persistence appends one row per push; the reference rewrites the whole
  file on every push (``momory_pool.py:126-153``), which is O(n²) disk
  traffic and the source of its read-retry race (``agent_dataset.py:43-51``).
  ``rewrite_csv`` exists for byte-layout-compatible full dumps.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

COLUMNS = [
    "sequence",
    "scribble_iter",
    "n_interaction",
    "n_interaction_next",
    "action",
    "reward_step",
    "reward_done",
    "done",
    "state_iou",
    "next_state_iou",
    "annotated_frames",
    "next_annotated_frames",
]

BASENAME_CSV = "memory_pool.csv"


def _join(vec) -> str:
    return "/".join(str(v) for v in np.asarray(vec).reshape(-1))


def _parse(s: str) -> np.ndarray:
    return np.array([float(v) for v in str(s).split("/")], dtype=np.float32)


@dataclass
class Transition:
    sequence: str
    scribble_iter: int
    n_interaction: int
    n_interaction_next: int
    action: int
    reward_step: float
    reward_done: float
    done: bool
    state_iou: np.ndarray
    next_state_iou: np.ndarray
    annotated_frames: np.ndarray
    next_annotated_frames: np.ndarray

    def to_row(self) -> List:
        return [
            self.sequence,
            self.scribble_iter,
            self.n_interaction,
            self.n_interaction_next,
            self.action,
            self.reward_step,
            self.reward_done,
            self.done,
            _join(self.state_iou),
            _join(self.next_state_iou),
            _join(self.annotated_frames),
            _join(self.next_annotated_frames),
        ]


class ReplayMemory:
    """Ring buffer of transitions with uniform sampling."""

    def __init__(self, capacity: int, csv_basename: str = BASENAME_CSV):
        self.capacity = int(capacity)
        self.memory: List[Optional[Transition]] = []
        self.position = -1
        self.basename_csv = csv_basename
        self.seq_list: List[str] = []
        self._csv_rows_written = 0

    def __len__(self) -> int:
        return len(self.memory)

    def push(self, transition: Transition) -> None:
        if len(self.memory) < self.capacity:
            self.memory.append(None)
        self.position = (self.position + 1) % self.capacity
        self.memory[self.position] = transition

    def push_to_csv(self, report_save_dir: str) -> None:
        """Append the latest transition to the CSV mirror."""
        os.makedirs(report_save_dir, exist_ok=True)
        csv_path = os.path.join(report_save_dir, self.basename_csv)
        t = self.memory[self.position]
        import csv as _csv

        new_file = not os.path.exists(csv_path)
        with open(csv_path, "a", newline="") as fp:
            writer = _csv.writer(fp)
            if new_file:
                writer.writerow([""] + COLUMNS)
                self._csv_rows_written = 0
            writer.writerow([self._csv_rows_written] + t.to_row())
            self._csv_rows_written += 1

    def rewrite_csv(self, report_save_dir: str) -> None:
        """Full dump in the reference's exact pandas-to_csv layout."""
        import pandas as pd

        os.makedirs(report_save_dir, exist_ok=True)
        csv_path = os.path.join(report_save_dir, self.basename_csv)
        rows = [t.to_row() for t in self.memory if t is not None]
        pd.DataFrame(rows, columns=COLUMNS).to_csv(csv_path)
        self._csv_rows_written = len(rows)

    def load_from_csv(
        self,
        path_to_csv: str,
        report_save_dir: Optional[str] = None,
        sample_th: float = 0.0,
    ) -> List[str]:
        """Bootstrap from a reference-format CSV.

        Applies the per-sequence quality-range filter (keep sequences whose
        min mean state-IoU to max mean next-state-IoU span exceeds
        ``sample_th``), shrinks capacity to the number of surviving records
        (reference semantics, ``momory_pool.py:88-110``), and returns the
        surviving sequence list (used to restrict the training set,
        ``train_agent.py:92-95``).
        """
        import pandas as pd

        df = pd.read_csv(path_to_csv, index_col=0)
        df = df[: self.capacity]

        seq_names = list(dict.fromkeys(df["sequence"].tolist()))
        self.seq_list = []
        if sample_th > 0:
            assert sample_th < 1
            for seq in seq_names:
                mp_seq = df[df.sequence == seq]
                if len(mp_seq) == 0:
                    continue
                p_min = min(
                    _parse(s).mean() for s in mp_seq.state_iou.tolist()
                )
                p_max = max(
                    _parse(s).mean() for s in mp_seq.next_state_iou.tolist()
                )
                if p_max - p_min > sample_th:
                    self.seq_list.append(seq)
        else:
            self.seq_list = list(seq_names)

        count = 0
        for _, row in df.iterrows():
            if sample_th > 0:
                assert len(self.seq_list) > 0
                if row["sequence"] not in self.seq_list:
                    continue
            count += 1
            self.push(
                Transition(
                    sequence=row["sequence"],
                    scribble_iter=int(row["scribble_iter"]),
                    n_interaction=int(row["n_interaction"]),
                    n_interaction_next=int(row["n_interaction_next"]),
                    action=int(row["action"]),
                    reward_step=float(row["reward_step"]),
                    reward_done=float(row["reward_done"]),
                    done=bool(row["done"]) if not isinstance(row["done"], str)
                    else row["done"] == "True",
                    state_iou=_parse(row["state_iou"]),
                    next_state_iou=_parse(row["next_state_iou"]),
                    annotated_frames=_parse(row["annotated_frames"]),
                    next_annotated_frames=_parse(row["next_annotated_frames"]),
                )
            )
        self.capacity = max(count, 1)
        self.memory = self.memory[: self.capacity]

        if report_save_dir is not None:
            self.rewrite_csv(report_save_dir)
        return self.seq_list

    def sample_batch(
        self, batch_size: int, rng: np.random.Generator
    ) -> Optional[Dict[str, np.ndarray]]:
        """Uniform sample → stacked, device-ready arrays ([B] / [B, T]).

        With mixed clip lengths in the pool (sequences shorter than
        len_subseq), a length is first drawn proportionally to its share of
        the pool and the batch sampled within that group — each transition
        keeps its uniform marginal probability while batches stay stackable
        (XLA static shapes)."""
        valid = [t for t in self.memory if t is not None]
        if len(valid) < batch_size:
            return None
        lengths = np.array([len(t.state_iou) for t in valid])
        uniq = np.unique(lengths)
        if len(uniq) > 1:
            eligible = [
                l for l in uniq if np.count_nonzero(lengths == l) >= batch_size
            ]
            if not eligible:
                return None
            weights = np.array(
                [np.count_nonzero(lengths == l) for l in eligible], dtype=np.float64
            )
            t_pick = rng.choice(eligible, p=weights / weights.sum())
            valid = [t for t in valid if len(t.state_iou) == t_pick]
        idx = rng.choice(len(valid), size=batch_size, replace=False)
        picks = [valid[i] for i in idx]
        return {
            "action": np.array([p.action for p in picks], dtype=np.int32),
            "reward_step": np.array(
                [p.reward_step for p in picks], dtype=np.float32
            ),
            "reward_done": np.array(
                [p.reward_done for p in picks], dtype=np.float32
            ),
            "done": np.array([p.done for p in picks], dtype=np.float32),
            "old_state_iou": np.stack([p.state_iou for p in picks]),
            "new_state_iou": np.stack([p.next_state_iou for p in picks]),
            "annotated_frames": np.stack([p.annotated_frames for p in picks]),
            "next_annotated_frames": np.stack(
                [p.next_annotated_frames for p in picks]
            ),
        }
