"""IVOS-W TPU: a TPU-native framework for interactive video object segmentation
frame recommendation, rebuilt from scratch in JAX/XLA/Pallas.

Capability parity target: svip-lab/IVOS-W (CVPR 2021, "Learning to Recommend
Frame for Interactive Video Object Segmentation in the Wild").

Subpackages
-----------
core      config system, rng threading
models    Brain Q-network (BiLSTM via lax.scan), DQN agent, AssessNet QA CNN,
          JAX-native interactive VOS backbones behind a common adapter protocol
ops       batched J/F metrics, device-side ROI geometry, fused scoring passes
kernels   Pallas TPU kernels for the hot ops
parallel  device mesh + sharding layer (pjit/shard_map over jax.sharding.Mesh)
data      DAVIS/YouTube-VOS registries + loaders, scribble encoding,
          replay buffer, QA augmentations
interact  interactive-session protocol, simulated scribble robot,
          frame-recommendation policies
train     reward production, agent pretrain/train, QA data-gen + training
eval      interactive evaluation drivers (summary.json reporting)
utils     seeding, meters, logging, checkpoint I/O
"""

__version__ = "0.1.0"
