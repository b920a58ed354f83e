"""compressed-tensors checkpoint ingestion (reference layers/quantization/
compressed_tensors/compressed_tensors.py): config_groups announce the weight
scheme; int8 routes to the w8a8_int8 path, float8 to the fp8 path; leaves on
the `ignore` list (no scales in the file) stay dense."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

PROJ_NAMES = [
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
]


def _fabricate(scheme: str):
    """scheme: "int" | "float". Returns (quant_dir, dense_ref_dir)."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig, AutoModelForCausalLM

    from ltp_sglang_tpu.layers.quantization.w8a8_int8 import quantize_int8

    cfg = dict(TINY_LLAMA_CFG)
    hf_cfg = AutoConfig.for_model(
        **{k: v for k, v in cfg.items() if k != "architectures"}
    )
    torch.manual_seed(11)
    model = AutoModelForCausalLM.from_config(hf_cfg).to(torch.float32).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    quant_sd = {}
    for name, w in sd.items():
        if not any(f".{p}.weight" in name for p in PROJ_NAMES):
            quant_sd[name] = torch.tensor(w)
            continue
        base = name[: -len(".weight")]
        if scheme == "int":
            q = quantize_int8(w.astype(np.float32), mode="channel")
            quant_sd[base + ".weight"] = torch.tensor(q["weight"])
            quant_sd[base + ".weight_scale"] = torch.tensor(q["weight_scale"])
            deq = q["weight"].astype(np.float32) * q["weight_scale"][:, None]
        else:  # float8 e4m3, per-channel scales (w8a8_fp8 scheme)
            absmax = np.abs(w).max(axis=1, keepdims=True) + 1e-12
            scale = (absmax / 448.0).astype(np.float32)
            import jax.numpy as jnp

            w8 = np.asarray(
                jnp.asarray(w / scale).astype(jnp.float8_e4m3fn)
            )
            quant_sd[base + ".weight"] = torch.tensor(
                w8.view(np.uint8)
            ).view(torch.float8_e4m3fn)
            quant_sd[base + ".weight_scale"] = torch.tensor(scale.reshape(-1))
            deq = w8.astype(np.float32) * scale
        with torch.no_grad():
            dict(model.named_parameters())[name].copy_(torch.tensor(deq))

    dense_dir = tempfile.mkdtemp(prefix=f"ct_dense_{scheme}_")
    model.save_pretrained(dense_dir, safe_serialization=True)

    quant_dir = tempfile.mkdtemp(prefix=f"ct_{scheme}_")
    qcfg = dict(cfg)
    qcfg["quantization_config"] = {
        "quant_method": "compressed-tensors",
        "format": (
            "int-quantized" if scheme == "int" else "float-quantized"
        ),
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {
                    "num_bits": 8,
                    "type": scheme,
                    "strategy": "channel",
                    "symmetric": True,
                },
                "input_activations": {
                    "num_bits": 8, "type": scheme, "dynamic": True,
                },
            }
        },
        "ignore": ["lm_head"],
    }
    with open(os.path.join(quant_dir, "config.json"), "w") as f:
        json.dump(qcfg, f)
    save_file(
        {k: v.contiguous() for k, v in quant_sd.items()},
        os.path.join(quant_dir, "model.safetensors"),
    )
    return quant_dir, dense_dir


@pytest.mark.parametrize("scheme", ["int", "float"])
def test_compressed_tensors_e2e(scheme):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    quant_dir, dense_dir = _fabricate(scheme)
    hf = AutoModelForCausalLM.from_pretrained(dense_dir, dtype=torch.float32).eval()
    prompt = [1, 23, 45, 67, 89, 42]
    with torch.no_grad():
        logits_ref = hf(torch.tensor([prompt])).logits[0, -1].numpy()

    eng = Engine(ServerArgs(
        model_path=quant_dir, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    model = eng.model_runner.model
    assert model.quant == "compressed-tensors"
    assert model.quant_is_int8 == (scheme == "int")
    assert model.quant_is_fp8 == (scheme == "float")
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 6, "temperature": 0.0},
    )
    assert out["output_ids"][0] == int(np.argmax(logits_ref))
    assert len(out["output_ids"]) == 6


def test_compressed_tensors_rejects_narrow_bits():
    from ltp_sglang_tpu.config.model_config import ModelConfig
    from ltp_sglang_tpu.models.llama import LlamaForCausalLM

    d = tempfile.mkdtemp(prefix="ct_bad_")
    cfg = dict(TINY_LLAMA_CFG)
    cfg["quantization_config"] = {
        "quant_method": "compressed-tensors",
        "config_groups": {
            "group_0": {"weights": {"num_bits": 4, "type": "int"}}
        },
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    mc = ModelConfig.from_model_path(d)
    with pytest.raises(NotImplementedError):
        LlamaForCausalLM(mc)
