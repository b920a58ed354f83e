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
        fallback = []
        with safe_open(fn, framework="flax") as f:
            for name in f.keys():
                try:
                    weights[name] = f.get_tensor(name)
                except Exception:
                    # The flax bridge maps F8_* to numpy attrs that don't
                    # exist; bit-view them through torch below.
                    fallback.append(name)
        if fallback:
            import ml_dtypes
            import torch

            fp8_view = {
                torch.float8_e4m3fn: ml_dtypes.float8_e4m3fn,
                torch.float8_e5m2: ml_dtypes.float8_e5m2,
            }
            with safe_open(fn, framework="pt") as f:
                for name in fallback:
                    t = f.get_tensor(name)
                    md = fp8_view.get(t.dtype)
                    if md is None:
                        weights[name] = t.to(torch.float32).numpy()
                    else:
                        weights[name] = t.view(torch.uint8).numpy().view(md)
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
    gguf_files = (
        [model_path] if model_path.endswith(".gguf")
        else sorted(glob.glob(os.path.join(model_path, "*.gguf")))
    )
    if gguf_files:
        from ltp_sglang_tpu.model_loader.gguf import load_gguf_weights

        weights: Dict[str, Any] = {}
        for f in gguf_files:
            weights.update(load_gguf_weights(f))
        return weights
    if glob.glob(os.path.join(model_path, "*.safetensors")):
        return _load_safetensors_dir(model_path)
    return _load_torch_bin(model_path)


def load_model_weights(model, model_path: str, load_format: str = "auto", seed: int = 0):
    """Returns the model's param pytree."""
    if load_format == "dummy":
        logger.info("Initializing dummy (random) weights for %s", model_path)
        return model.init_params(seed)
    if glob.glob(os.path.join(model_path, "native-*.safetensors")):
        logger.info("Loading native sharded checkpoint from %s", model_path)
        return load_native_checkpoint(model, model_path)
    weights = load_raw_weights(model_path)
    logger.info("Loaded %d raw tensors from %s", len(weights), model_path)
    params = model.convert_hf_weights(weights)
    return params


# ------------------------------------------------- native sharded checkpoints
def save_sharded_checkpoint(params, out_dir: str,
                            max_shard_bytes: int = 4 << 30) -> int:
    """Save a param pytree as sharded safetensors with slash-joined leaf
    names + an index file (the reference's save_sharded_model analog,
    model_runner save path; format is this framework's NATIVE layout —
    stacked [L, ...] leaves — so reload skips HF conversion entirely).
    Returns the number of shards written."""
    import jax
    import numpy as np
    from safetensors.numpy import save_file

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    os.makedirs(out_dir, exist_ok=True)
    shards, cur, cur_bytes = [], {}, 0
    for name in sorted(flat):
        arr = flat[name]
        if cur and cur_bytes + arr.nbytes > max_shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[name] = arr
        cur_bytes += arr.nbytes
    if cur:
        shards.append(cur)
    index = {"metadata": {"format": "ltp_native"}, "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = f"native-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(out_dir, fname))
        for name in shard:
            index["weight_map"][name] = fname
    with open(os.path.join(out_dir, "native.index.json"), "w") as f:
        json.dump(index, f, indent=1)
    return n


def load_native_checkpoint(model, model_path: str):
    """Reload a save_sharded_checkpoint tree (native stacked layout)."""
    import jax.numpy as jnp
    from safetensors import safe_open

    ref = model.init_params(0)  # structure + dtypes to restore into
    flat = {}
    for f in sorted(glob.glob(os.path.join(model_path, "native-*.safetensors"))):
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                flat[name] = sf.get_tensor(name)

    # A checkpoint saved from a running engine may carry FUSED projection
    # leaves (layers/linear.fuse_dense_projections) while the freshly-inited
    # reference structure has the unfused names: slice them back apart here —
    # the runner re-fuses after load, so the round trip is bit-exact.
    def _unfuse(fused_key, names, widths):
        for leaf in ("kernel", "bias"):
            src = flat.pop(f"layers/{fused_key}/{leaf}", None)
            if src is None:
                continue
            off = 0
            for nm, w in zip(names, widths):
                flat[f"layers/{nm}/{leaf}"] = src[..., off : off + w]
                off += w

    if any(k.startswith("layers/qkv_proj/") for k in flat):
        cfg = model.config
        qn = cfg.num_attention_heads * cfg.head_dim
        kn = cfg.num_kv_heads * cfg.head_dim
        _unfuse("qkv_proj", ("q_proj", "k_proj", "v_proj"), (qn, kn, kn))
    if any(k.startswith("layers/gate_up_proj/") for k in flat):
        gu = flat.get("layers/gate_up_proj/kernel")
        if gu is not None:
            im = gu.shape[-1] // 2
            _unfuse("gate_up_proj", ("gate_proj", "up_proj"), (im, im))

    def rebuild(node, prefix):
        if isinstance(node, dict):
            return {
                k: rebuild(v, f"{prefix}/{k}" if prefix else k)
                for k, v in node.items()
            }
        arr = flat[prefix]
        return jnp.asarray(arr).astype(node.dtype)

    return rebuild(ref, "")
