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
