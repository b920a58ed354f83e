"""FP8 weight quantization + scaled FP8 KV cache.

Covers the reference Fp8LinearMethod semantics (fp8.py:110 — per-tensor /
per-channel / block-wise scales) and KV scale-on-write (memory_pool.py:369-407,
kv_cache.py:19-62) on the TPU-native leaves.
"""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

from ltp_sglang_tpu.layers.quantization.fp8 import (
    dequant_fp8,
    quantize_fp8,
    unpack_fp8_to_internal,
)


@pytest.mark.parametrize("mode", ["tensor", "channel", "block"])
def test_fp8_roundtrip(mode):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 160)).astype(np.float32)  # [out, in]
    q = quantize_fp8(w, mode=mode, block=64)
    internal = unpack_fp8_to_internal(
        np.asarray(q["weight"]),
        q["weight_scale"] if mode != "block" else None,
        weight_scale_inv=q["weight_scale"] if mode == "block" else None,
        block=64,
    )
    deq = np.asarray(dequant_fp8(internal, out_dtype=jnp.float32))
    assert deq.shape == (160, 96)  # [K, N] in-major
    # e4m3 has a 3-bit mantissa: relative error <= 2^-4 per element.
    err = np.abs(deq.T - w) / (np.abs(w) + 1e-6)
    assert np.median(err) < 0.04, np.median(err)
    assert err.max() < 0.15, err.max()


def test_fp8_block_nondivisible():
    """Block grids use ceil division; dequant must crop the padding."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((100, 130)).astype(np.float32)
    q = quantize_fp8(w, mode="block", block=64)
    assert q["weight_scale"].shape == (2, 3)  # ceil(100/64), ceil(130/64)
    internal = unpack_fp8_to_internal(
        np.asarray(q["weight"]), None, weight_scale_inv=q["weight_scale"], block=64
    )
    deq = np.asarray(dequant_fp8(internal, out_dtype=jnp.float32))
    assert deq.shape == (130, 100)
    err = np.abs(deq.T - w) / (np.abs(w) + 1e-6)
    assert err.max() < 0.15


def test_fp8_apply_linear_matches_dequant():
    from ltp_sglang_tpu.layers.linear import apply_linear

    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    q = quantize_fp8(w, mode="channel")
    internal = unpack_fp8_to_internal(np.asarray(q["weight"]), q["weight_scale"])
    out = apply_linear(internal, x)
    ref = x @ dequant_fp8(internal, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def _fabricate_fp8_checkpoint(mode: str):
    """Returns (fp8_model_dir, dense_ref_dir) where the dense ref carries the
    dequantized weights — greedy decode must match exactly in fp32."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = dict(TINY_LLAMA_CFG)
    hf_cfg = AutoConfig.for_model(
        **{k: v for k, v in cfg.items() if k != "architectures"}
    )
    torch.manual_seed(11)
    model = AutoModelForCausalLM.from_config(hf_cfg).to(torch.float32).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    proj_names = [
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    ]
    quant_sd = {}
    for name, w in sd.items():
        if not any(f".{p}.weight" in name for p in proj_names):
            quant_sd[name] = torch.tensor(w)
            continue
        q = quantize_fp8(w.astype(np.float32), mode=mode, block=32)  # [out, in]
        base = name[: -len(".weight")]
        quant_sd[base + ".weight"] = torch.tensor(
            np.asarray(q["weight"]).view(np.uint8)
        ).view(torch.float8_e4m3fn)
        if mode == "block":
            quant_sd[base + ".weight_scale_inv"] = torch.tensor(q["weight_scale"])
        else:
            quant_sd[base + ".weight_scale"] = torch.tensor(q["weight_scale"])
        # Dense ref gets the exactly-dequantized values.
        internal = unpack_fp8_to_internal(
            np.asarray(q["weight"]),
            None if mode == "block" else q["weight_scale"],
            weight_scale_inv=q["weight_scale"] if mode == "block" else None,
            block=32,
        )
        deq = np.asarray(dequant_fp8(internal, out_dtype=jnp.float32)).T  # [out, in]
        with torch.no_grad():
            dict(model.named_parameters())[name].copy_(torch.tensor(deq))

    dense_dir = tempfile.mkdtemp(prefix=f"dense_fp8_{mode}_")
    model.save_pretrained(dense_dir, safe_serialization=True)

    quant_dir = tempfile.mkdtemp(prefix=f"fp8_{mode}_")
    qcfg = dict(cfg)
    qcfg["quantization_config"] = {
        "quant_method": "fp8",
        "fmt": "e4m3",
        "weight_block_size": [32, 32] if mode == "block" else None,
    }
    with open(os.path.join(quant_dir, "config.json"), "w") as f:
        json.dump(qcfg, f)
    save_file(
        {k: v.contiguous() for k, v in quant_sd.items()},
        os.path.join(quant_dir, "model.safetensors"),
    )
    return quant_dir, dense_dir


@pytest.mark.parametrize("mode", ["channel", "block"])
def test_fp8_checkpoint_parity(mode):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    quant_dir, dense_dir = _fabricate_fp8_checkpoint(mode)

    hf = AutoModelForCausalLM.from_pretrained(dense_dir, dtype=torch.float32).eval()
    prompt = [1, 23, 45, 67, 89, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=12, do_sample=False
        )[0].tolist()[len(prompt):]

    eng = Engine(
        ServerArgs(
            model_path=quant_dir,
            dtype="float32",
            max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    assert eng.model_runner.model.quant_is_fp8
    out = eng.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 12, "temperature": 0.0}
    )
    assert out["output_ids"] == ref, f"{mode}: {out['output_ids']} != {ref}"


def test_fp8_kv_cache_accuracy():
    """Scaled fp8 KV vs fp32 KV on the same weights: logits must stay close
    (scale-on-write + fold-into-q dequant, not a bare cast)."""
    from ltp_sglang_tpu.config.model_config import ModelConfig
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = dict(TINY_LLAMA_CFG)
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(
        **{k: v for k, v in cfg.items() if k != "architectures"}
    )
    torch.manual_seed(3)
    model = AutoModelForCausalLM.from_config(hf_cfg).to(torch.float32).eval()
    mdir = tempfile.mkdtemp(prefix="fp8kv_")
    model.save_pretrained(mdir, safe_serialization=True)

    prompt = [1, 5, 9, 13, 17, 21, 25]
    outs = {}
    for kv_dtype in ("auto", "fp8_e4m3"):
        eng = Engine(
            ServerArgs(
                model_path=mdir,
                dtype="float32",
                kv_cache_dtype=kv_dtype,
                max_total_tokens=1024,
                max_running_requests=4,
            )
        )
        outs[kv_dtype] = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 16, "temperature": 0.0},
        )["output_ids"]
    # Tiny random models have near-uniform logits; exact match isn't
    # guaranteed, but the prefix should agree (scale-on-write keeps e4m3
    # relative error ~2^-4 per element).
    a, b = outs["auto"], outs["fp8_e4m3"]
    agree = sum(x == y for x, y in zip(a, b))
    assert agree >= len(a) // 2, (a, b)


def test_fp8_kv_scale_ingestion():
    """k_scale/v_scale checkpoint tensors land in the param tree."""
    from ltp_sglang_tpu.config.model_config import ModelConfig
    from ltp_sglang_tpu.models.llama import LlamaForCausalLM

    cfg = ModelConfig.from_hf_config(dict(TINY_LLAMA_CFG), model_path="x")
    model = LlamaForCausalLM(cfg)
    params = model.init_params(0)
    rng = np.random.default_rng(4)
    weights = {}
    # Flatten the dummy params back into HF names, add kv scales.
    L = cfg.num_layers
    for i in range(L):
        base = f"model.layers.{i}"
        for sub, leaf in [
            ("self_attn.q_proj", "q_proj"), ("self_attn.k_proj", "k_proj"),
            ("self_attn.v_proj", "v_proj"), ("self_attn.o_proj", "o_proj"),
            ("mlp.gate_proj", "gate_proj"), ("mlp.up_proj", "up_proj"),
            ("mlp.down_proj", "down_proj"),
        ]:
            weights[f"{base}.{sub}.weight"] = np.asarray(
                params["layers"][leaf]["kernel"][i], dtype=np.float32
            ).T
        for sub, leaf in [
            ("input_layernorm", "input_layernorm"),
            ("post_attention_layernorm", "post_attention_layernorm"),
        ]:
            weights[f"{base}.{sub}.weight"] = np.asarray(
                params["layers"][leaf][i], dtype=np.float32
            )
        weights[f"{base}.self_attn.k_scale"] = np.float32(0.5 + 0.1 * i)
        weights[f"{base}.self_attn.v_scale"] = np.float32(0.25)
    weights["model.embed_tokens.weight"] = np.asarray(
        params["embed"]["weight"], dtype=np.float32
    )
    weights["model.norm.weight"] = np.asarray(params["norm"], dtype=np.float32)
    weights["lm_head.weight"] = np.asarray(
        params["lm_head"]["kernel"], dtype=np.float32
    ).T
    loaded = model.convert_hf_weights(weights)
    np.testing.assert_allclose(
        np.asarray(loaded["layers"]["k_scale"]),
        0.5 + 0.1 * np.arange(L, dtype=np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(loaded["layers"]["v_scale"]), 0.25)
