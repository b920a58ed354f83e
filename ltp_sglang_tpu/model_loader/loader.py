"""Checkpoint ingestion: safetensors/pt -> model param pytree.

Counterpart of model_loader/loader.py:180-1525 (DefaultModelLoader +
DummyModelLoader). Each model class owns its name mapping via
convert_hf_weights (the analog of the reference's stacked_params_mapping +
weight_loader protocol, SURVEY B.1); this module just streams raw tensors.

bf16 checkpoints load through safetensors' flax bridge (numpy has no bf16).
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Any, Dict

logger = logging.getLogger(__name__)


def _load_safetensors_dir(model_path: str) -> Dict[str, Any]:
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_path}")
    weights: Dict[str, Any] = {}
    for fn in files:
        with safe_open(fn, framework="flax") as f:
            for name in f.keys():
                weights[name] = f.get_tensor(name)
    return weights


def _load_torch_bin(model_path: str) -> Dict[str, Any]:
    import numpy as np
    import torch

    files = sorted(glob.glob(os.path.join(model_path, "*.bin")))
    if not files:
        raise FileNotFoundError(f"no weight files under {model_path}")
    weights: Dict[str, Any] = {}
    for fn in files:
        sd = torch.load(fn, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            weights[name] = np.asarray(t.to(torch.float32).numpy())
    return weights


def load_raw_weights(model_path: str) -> Dict[str, Any]:
    if glob.glob(os.path.join(model_path, "*.safetensors")):
        return _load_safetensors_dir(model_path)
    return _load_torch_bin(model_path)


def load_model_weights(model, model_path: str, load_format: str = "auto", seed: int = 0):
    """Returns the model's param pytree."""
    if load_format == "dummy":
        logger.info("Initializing dummy (random) weights for %s", model_path)
        return model.init_params(seed)
    weights = load_raw_weights(model_path)
    logger.info("Loaded %d raw tensors from %s", len(weights), model_path)
    params = model.convert_hf_weights(weights)
    return params
