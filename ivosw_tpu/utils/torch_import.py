"""PyTorch checkpoint importers (parity bridge to the reference weights).

The reference distributes ``weights/agent.pt`` and ``weights/assess_net.pt``
as torch state_dicts (``utils/misc.py:42-115``). These converters map them to
this framework's parameter pytrees so recommendations are bit-comparable with
the reference given the same inputs. torch is used CPU-only and only here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _strip_module(state_dict: Dict) -> Dict:
    return {
        (k[7:] if k.startswith("module.") else k): v for k, v in state_dict.items()
    }


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def brain_params_from_torch(state_dict: Dict):
    """Map the reference Brain state_dict (models/agent.py:13-31 layout:
    encoder_fc1/2, lstm_cell, decoder_fc1/2) onto brain.py's param pytree.
    Linear kernels transpose; LSTM gate order (i,f,g,o) is shared."""
    import jax.numpy as jnp

    sd = _strip_module(state_dict)
    get = lambda k: _np(sd[k])
    return {
        "enc_fc1": {
            "kernel": jnp.asarray(get("encoder_fc1.weight").T),
            "bias": jnp.asarray(get("encoder_fc1.bias")),
        },
        "enc_fc2": {
            "kernel": jnp.asarray(get("encoder_fc2.weight").T),
            "bias": jnp.asarray(get("encoder_fc2.bias")),
        },
        "lstm": {
            "w_ih": jnp.asarray(get("lstm_cell.weight_ih").T),
            "w_hh": jnp.asarray(get("lstm_cell.weight_hh").T),
        },
        "dec_fc1": {
            "kernel": jnp.asarray(get("decoder_fc1.weight").T),
            "bias": jnp.asarray(get("decoder_fc1.bias")),
        },
        "dec_fc2": {
            "kernel": jnp.asarray(get("decoder_fc2.weight").T),
            "bias": jnp.asarray(get("decoder_fc2.bias")),
        },
    }


def _conv_kernel(t) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def assess_variables_from_torch(state_dict: Dict, encoder_prefix: str = "Encoder."):
    """Map the reference AssessNet state_dict (models/assessment.py layout:
    Encoder.conv1/conv1_p/bn1/res2..res5 + fc1) onto assess.py's variables.

    The reference's dead stem convs (conv1_m / conv1_n, declared at
    models/assessment.py:15-20 but unused on the 2-input path) and the
    mean/std buffers are ignored.
    """
    import jax.numpy as jnp

    sd = _strip_module(state_dict)
    e = encoder_prefix
    params = {
        "conv1": {"kernel": jnp.asarray(_conv_kernel(sd[e + "conv1.weight"]))},
        "conv1_p": {"kernel": jnp.asarray(_conv_kernel(sd[e + "conv1_p.weight"]))},
        "bn1": {
            "scale": jnp.asarray(_np(sd[e + "bn1.weight"])),
            "bias": jnp.asarray(_np(sd[e + "bn1.bias"])),
        },
        "fc1": {
            "kernel": jnp.asarray(_np(sd["fc1.weight"]).T),
            "bias": jnp.asarray(_np(sd["fc1.bias"])),
        },
        "trunk": {},
    }
    stats = {
        "bn1": {
            "mean": jnp.asarray(_np(sd[e + "bn1.running_mean"])),
            "var": jnp.asarray(_np(sd[e + "bn1.running_var"])),
        },
        "trunk": {},
    }

    trunk_p, trunk_s = _trunk_from_sd(sd, lambda stage, i: f"{e}res{stage}.{i}.")
    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s
    return {"params": params, "batch_stats": stats}


def _trunk_from_sd(sd: Dict, prefix_for_block) -> tuple:
    """ResNet-50 bottleneck trunk (res2..res5) from a torch state_dict.

    ``prefix_for_block(stage, i)`` returns the key prefix of block i of the
    stage — reference AssessNet layout uses ``Encoder.res{stage}.{i}.``,
    torchvision resnet50 uses ``layer{stage-1}.{i}.``.
    """
    import jax.numpy as jnp

    trunk_p, trunk_s = {}, {}
    blocks_per_stage = {2: 3, 3: 4, 4: 6, 5: 3}
    for stage, n_blocks in blocks_per_stage.items():
        stage_p, stage_s = {}, {}
        for i in range(n_blocks):
            tp = prefix_for_block(stage, i)
            block_p, block_s = {}, {}
            for j in (1, 2, 3):
                block_p[f"conv{j}"] = {
                    "kernel": jnp.asarray(_conv_kernel(sd[tp + f"conv{j}.weight"]))
                }
                block_p[f"bn{j}"] = {
                    "scale": jnp.asarray(_np(sd[tp + f"bn{j}.weight"])),
                    "bias": jnp.asarray(_np(sd[tp + f"bn{j}.bias"])),
                }
                block_s[f"bn{j}"] = {
                    "mean": jnp.asarray(_np(sd[tp + f"bn{j}.running_mean"])),
                    "var": jnp.asarray(_np(sd[tp + f"bn{j}.running_var"])),
                }
            if tp + "downsample.0.weight" in sd:
                block_p["downsample_conv"] = {
                    "kernel": jnp.asarray(
                        _conv_kernel(sd[tp + "downsample.0.weight"])
                    )
                }
                block_p["downsample_bn"] = {
                    "scale": jnp.asarray(_np(sd[tp + "downsample.1.weight"])),
                    "bias": jnp.asarray(_np(sd[tp + "downsample.1.bias"])),
                }
                block_s["downsample_bn"] = {
                    "mean": jnp.asarray(_np(sd[tp + "downsample.1.running_mean"])),
                    "var": jnp.asarray(_np(sd[tp + "downsample.1.running_var"])),
                }
            stage_p[f"block{i}"] = block_p
            stage_s[f"block{i}"] = block_s
        trunk_p[f"res{stage}"] = stage_p
        trunk_s[f"res{stage}"] = stage_s
    return trunk_p, trunk_s


def assess_variables_from_torchvision_resnet50(state_dict: Dict, seed: int = 0):
    """AssessNet variables with an ImageNet-pretrained ResNet-50 trunk.

    Reproduces the reference's pretrained-encoder construction
    (``models/assessment.py:28-39``: ``resnet50(pretrained=True)`` supplies
    conv1/bn1/layer1..layer4) from a torchvision-format ``resnet50``
    state_dict, without needing torchvision itself:

    - conv1 / bn1 / layer1..4 (→ res2..5): copied from the state_dict;
    - conv1_p: zeros, so the fused stem initially equals the pretrained RGB
      stem (the reference He-initialises it instead — documented divergence);
    - fc1: fresh random init (the reference also creates a new head).

    The torchvision ``fc.weight/bias`` (1000-class head) is ignored.
    """
    import jax
    import jax.numpy as jnp

    from ivosw_tpu.models.assess import init_assess_variables

    sd = _strip_module(state_dict)
    variables = init_assess_variables(jax.random.PRNGKey(seed))
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])

    params["conv1"] = {"kernel": jnp.asarray(_conv_kernel(sd["conv1.weight"]))}
    params["conv1_p"] = {
        "kernel": jnp.zeros_like(variables["params"]["conv1_p"]["kernel"])
    }
    params["bn1"] = {
        "scale": jnp.asarray(_np(sd["bn1.weight"])),
        "bias": jnp.asarray(_np(sd["bn1.bias"])),
    }
    stats["bn1"] = {
        "mean": jnp.asarray(_np(sd["bn1.running_mean"])),
        "var": jnp.asarray(_np(sd["bn1.running_var"])),
    }
    trunk_p, trunk_s = _trunk_from_sd(sd, lambda stage, i: f"layer{stage - 1}.{i}.")
    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s
    return {"params": params, "batch_stats": stats}


def init_assess_from_imagenet(path: str, seed: int = 0):
    """Initialise AssessNet from a torchvision-format resnet50 state_dict
    file (the from-scratch QA-training analogue of the reference's
    ``resnet50(pretrained=True)``). Returns None if the file is missing or
    unreadable so callers can fall back to random init."""
    import os

    if not os.path.exists(path):
        return None
    try:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return assess_variables_from_torchvision_resnet50(sd, seed=seed)
    except Exception:
        return None


def load_assess_checkpoint_pt(path: str):
    """Load weights/assess_net.pt → AssessNet variables, or None."""
    import os

    if not os.path.exists(path):
        return None
    try:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return assess_variables_from_torch(sd)
    except Exception:
        return None


def load_agent_checkpoint_pt(path: str):
    """Load weights/agent.pt → Brain params, or None if missing/unreadable."""
    import os

    if not os.path.exists(path):
        return None
    try:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return brain_params_from_torch(sd)
    except Exception:
        return None
