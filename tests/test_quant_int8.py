"""W8A8-INT8 quantization (reference layers/quantization/w8a8_int8.py).

int8 weights + per-token dynamically-quantized int8 activations; on TPU the
matmul runs on the MXU's int8 path. The checkpoint parity test uses a
RELAXED bound (not exact greedy match) because activation quantization is a
real approximation — mirroring the reference, which gates W8A8 on GSM8K
deltas rather than logit equality.
"""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

from ltp_sglang_tpu.layers.quantization.w8a8_int8 import (
    int8_matmul,
    quantize_int8,
    unpack_int8_to_internal,
)


@pytest.mark.parametrize("mode", ["tensor", "channel"])
def test_int8_roundtrip(mode):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 160)).astype(np.float32)  # [out, in]
    q = quantize_int8(w, mode=mode)
    internal = unpack_int8_to_internal(q["weight"], q["weight_scale"])
    w8i = np.asarray(internal["w8i"], dtype=np.float32)
    s = np.asarray(internal["weight_scale"], dtype=np.float32)
    deq = w8i * s  # [K, N]
    assert deq.shape == (160, 96)
    err = np.abs(deq.T - w) / (np.abs(w) + 1e-6)
    # 8-bit grid: step = max|w|/127; median relative error is a bit worse
    # for per-tensor (one scale for the whole matrix).
    assert np.median(err) < (0.03 if mode == "tensor" else 0.015), np.median(err)
    # Absolute error bounded by half a quantization step everywhere (near-
    # zero elements make relative error meaningless).
    step = np.abs(w).max(axis=1 if mode == "channel" else None) / 127.0
    step = step if mode == "tensor" else step[:, None]
    assert (np.abs(deq.T - w) <= 0.5 * step + 1e-6).all()


def test_int8_matmul_close_to_float():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    q = quantize_int8(w, mode="channel")
    internal = unpack_int8_to_internal(q["weight"], q["weight_scale"])
    out = np.asarray(int8_matmul(x, internal))
    ref = np.asarray(x) @ w.T
    # int8 w + per-token int8 a: ~1% of the output's RMS on gaussian data
    # (per-element relative error is meaningless for near-zero sums).
    rms = np.sqrt((ref ** 2).mean())
    assert np.abs(out - ref).max() < 0.05 * rms, np.abs(out - ref).max() / rms


def test_int8_apply_linear_dispatch():
    from ltp_sglang_tpu.layers.linear import apply_linear

    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 48)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((2, 48)).astype(np.float32))
    q = quantize_int8(w, mode="channel")
    internal = unpack_int8_to_internal(q["weight"], q["weight_scale"])
    out = np.asarray(apply_linear(internal, x))
    ref = np.asarray(x) @ w.T
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 0.05


def test_int8_stacked_layer_select():
    """Stacked [L, K, N] leaves index by layer id (scan-compatible)."""
    rng = np.random.default_rng(4)
    ws = [rng.standard_normal((16, 24)).astype(np.float32) for _ in range(3)]
    qs = [
        unpack_int8_to_internal(
            quantize_int8(w)["weight"], quantize_int8(w)["weight_scale"]
        )
        for w in ws
    ]
    stacked = {
        "w8i": jnp.stack([q["w8i"] for q in qs]),
        "weight_scale": jnp.stack([q["weight_scale"] for q in qs]),
    }
    x = jnp.asarray(rng.standard_normal((2, 24)).astype(np.float32))
    for li in range(3):
        out = np.asarray(int8_matmul(x, stacked, li=li))
        ref = np.asarray(x) @ ws[li].T
        assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 0.05


def _fabricate_int8_checkpoint():
    """Returns (int8_model_dir, dense_ref_dir); dense ref carries the
    dequantized weights, so the only approximation left is activation
    quantization."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = dict(TINY_LLAMA_CFG)
    hf_cfg = AutoConfig.for_model(
        **{k: v for k, v in cfg.items() if k != "architectures"}
    )
    torch.manual_seed(7)
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
        q = quantize_int8(w.astype(np.float32), mode="channel")
        base = name[: -len(".weight")]
        quant_sd[base + ".weight"] = torch.tensor(q["weight"])
        quant_sd[base + ".weight_scale"] = torch.tensor(q["weight_scale"])
        deq = q["weight"].astype(np.float32) * q["weight_scale"][:, None]
        with torch.no_grad():
            dict(model.named_parameters())[name].copy_(torch.tensor(deq))

    dense_dir = tempfile.mkdtemp(prefix="dense_int8_")
    model.save_pretrained(dense_dir, safe_serialization=True)

    quant_dir = tempfile.mkdtemp(prefix="int8_")
    qcfg = dict(cfg)
    qcfg["quantization_config"] = {"quant_method": "w8a8_int8"}
    with open(os.path.join(quant_dir, "config.json"), "w") as f:
        json.dump(qcfg, f)
    save_file(
        {k: v.contiguous() for k, v in quant_sd.items()},
        os.path.join(quant_dir, "model.safetensors"),
    )
    return quant_dir, dense_dir


def test_int8_checkpoint_e2e():
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    quant_dir, dense_dir = _fabricate_int8_checkpoint()

    hf = AutoModelForCausalLM.from_pretrained(dense_dir, dtype=torch.float32).eval()
    prompt = [1, 23, 45, 67, 89, 42]
    with torch.no_grad():
        logits_ref = hf(torch.tensor([prompt])).logits[0, -1].numpy()

    eng = Engine(
        ServerArgs(
            model_path=quant_dir,
            dtype="float32",
            max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    assert eng.model_runner.model.quant_is_int8
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0},
        return_logprob=True,
    )
    # The first generated token comes from the prompt's last-position
    # distribution; act-quant error must not flip a confident argmax.
    assert out["output_ids"][0] == int(np.argmax(logits_ref)), (
        out["output_ids"],
        int(np.argmax(logits_ref)),
    )
    assert len(out["output_ids"]) == 8


def test_adapt_specs_quant_leaves():
    """Quantized param subtrees inherit the dense kernel's PartitionSpec
    instead of degrading to full replication (parallel/mesh.py)."""
    from jax.sharding import PartitionSpec as P

    from ltp_sglang_tpu.parallel.mesh import adapt_specs_to_params

    params = {
        "layers": {
            "q_proj": {
                "w8i": jnp.zeros((2, 8, 16), jnp.int8),
                "weight_scale": jnp.zeros((2, 1, 16), jnp.float32),
            },
            "down_proj": {
                "w4": jnp.zeros((2, 8, 16), jnp.int8),
                "scales": jnp.zeros((2, 1, 16), jnp.float32),
                "zeros": jnp.zeros((2, 1, 16), jnp.float32),
                "perm": jnp.zeros((2, 16), jnp.int32),
            },
            "norm": jnp.zeros((2, 4)),
        },
        "embed": {"weight": jnp.zeros((32, 4))},
    }
    specs = {
        "layers": {
            "q_proj": {"kernel": P(None, None, "tp")},
            "down_proj": {"kernel": P(None, "tp", None)},
            "norm": P(None, None),
        },
        "embed": {"weight": P("tp", None)},
    }
    out = adapt_specs_to_params(specs, params)
    assert out["layers"]["q_proj"]["w8i"] == P(None, None, "tp")
    assert out["layers"]["q_proj"]["weight_scale"] == P(None, None, "tp")
    assert out["layers"]["down_proj"]["w4"] == P(None, "tp", None)
    assert out["layers"]["down_proj"]["perm"] == P(None, None)
    assert out["layers"]["norm"] == P(None, None)
    assert out["embed"]["weight"] == P("tp", None)
    # Structures now match leaf-for-leaf: jax.tree.map must not raise.
    jax.tree.map(lambda a, b: None, params, out)
