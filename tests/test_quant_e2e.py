"""End-to-end AWQ/GPTQ llama: fabricated quantized checkpoint vs an HF model
carrying the dequantized weights (exact greedy parity in fp32)."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG


def _fabricate_quant_checkpoint(method: str, group_size: int = 64):
    """Returns (quant_model_dir, dense_ref_dir)."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig, AutoModelForCausalLM

    from ltp_sglang_tpu.layers.quantization.int4 import (
        quantize_to_awq,
        quantize_to_gptq,
    )

    cfg = dict(TINY_LLAMA_CFG)
    hf_cfg = AutoConfig.for_model(**{k: v for k, v in cfg.items() if k != "architectures"})
    torch.manual_seed(7)
    model = AutoModelForCausalLM.from_config(hf_cfg).to(torch.float32).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    quant_sd = {}
    L = cfg["num_hidden_layers"]
    proj_names = [
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    ]
    for name, w in sd.items():
        is_proj = any(f".{p}.weight" in name for p in proj_names)
        if not is_proj:
            quant_sd[name] = torch.tensor(w)
            continue
        wt = w.T.astype(np.float32)  # [K, N] in-major
        base = name[: -len(".weight")]
        if method == "awq":
            qw, qz, sc, w_ref = quantize_to_awq(wt, group_size)
            quant_sd[base + ".qweight"] = torch.tensor(qw)
            quant_sd[base + ".qzeros"] = torch.tensor(qz)
            quant_sd[base + ".scales"] = torch.tensor(sc)
        else:
            qw, qz, sc, g_idx, w_ref = quantize_to_gptq(wt, group_size)
            quant_sd[base + ".qweight"] = torch.tensor(qw)
            quant_sd[base + ".qzeros"] = torch.tensor(qz)
            quant_sd[base + ".scales"] = torch.tensor(sc)
            quant_sd[base + ".g_idx"] = torch.tensor(g_idx)
        # Push the dequantized values back into the HF reference model.
        sd_key = name
        with torch.no_grad():
            dict(model.named_parameters())[sd_key].copy_(
                torch.tensor(w_ref.T.astype(np.float32))
            )

    dense_dir = tempfile.mkdtemp(prefix=f"dense_{method}_")
    model.save_pretrained(dense_dir, safe_serialization=True)

    quant_dir = tempfile.mkdtemp(prefix=f"quant_{method}_")
    qcfg = dict(cfg)
    qcfg["quantization_config"] = {
        "quant_method": "awq" if method == "awq" else "gptq",
        "bits": 4,
        "group_size": group_size,
        "version": "gemm",
    }
    with open(os.path.join(quant_dir, "config.json"), "w") as f:
        json.dump(qcfg, f)
    quant_sd = {k: v.contiguous() for k, v in quant_sd.items()}
    save_file(quant_sd, os.path.join(quant_dir, "model.safetensors"))
    return quant_dir, dense_dir


@pytest.mark.parametrize("method", ["awq", "gptq"])
def test_quantized_checkpoint_parity(method):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    quant_dir, dense_dir = _fabricate_quant_checkpoint(method)

    hf = AutoModelForCausalLM.from_pretrained(dense_dir, dtype=torch.float32).eval()
    prompt = [1, 44, 55, 66, 77, 88]
    with torch.no_grad():
        ref = hf.generate(torch.tensor([prompt]), max_new_tokens=12, do_sample=False)[
            0
        ].tolist()[len(prompt):]

    eng = Engine(
        ServerArgs(
            model_path=quant_dir,
            dtype="float32",
            max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    assert eng.model_runner.model.quant is not None
    out = eng.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 12, "temperature": 0.0}
    )
    assert out["output_ids"] == ref, f"{method}: {out['output_ids']} != {ref}"
