"""Quantized MoE experts (FP8 blockwise/per-channel + W8A8-INT8).

Reference: fp8 grouped expert GEMM (layers/moe/fused_moe_triton/,
layers/quantization/fp8.py:110) and w8a8 MoE; BASELINE config 5 is
DeepSeek-V2-Lite MoE FP8 — expert weight stacks must flow through
moe_ffn / moe_ffn_ep_a2a as quantized leaf dicts (moe.resolve_expert_weights).
"""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir

from ltp_sglang_tpu.layers.moe import (
    expert_count,
    moe_ffn,
    resolve_expert_weights,
)
from ltp_sglang_tpu.layers.quantization.fp8 import quantize_fp8
from ltp_sglang_tpu.layers.quantization.w8a8_int8 import quantize_int8


def _quantize_expert_stack(w, kind: str, block: int = 32):
    """float [E, K, N] -> (leaf dict, exactly-dequantized [E, K, N] f32)."""
    E, K, N = w.shape
    if kind == "int8":
        per = [quantize_int8(w[e].T, mode="channel") for e in range(E)]
        w8i = np.stack([np.asarray(d["weight"]).T for d in per])  # [E, K, N]
        s = np.stack([d["weight_scale"][None, :] for d in per])  # [E, 1, N]
        deq = w8i.astype(np.float32) * s
        return (
            {"w8i": jnp.asarray(w8i), "weight_scale": jnp.asarray(s)},
            deq,
        )
    mode = "block" if kind == "fp8_block" else "channel"
    per = [quantize_fp8(w[e].T, mode=mode, block=block) for e in range(E)]
    w8 = np.stack(
        [np.asarray(d["weight"]).T.astype(np.float32) for e, d in enumerate(per)]
    )
    w8_fp8 = jnp.asarray(w8).astype(jnp.float8_e4m3fn)  # exact (values are e4m3)
    if mode == "block":
        s = np.stack([d["weight_scale"].T for d in per])  # [E, K/bs, N/bs]
        kb, nb = s.shape[-2:]
        deq = (
            w8.reshape(E, kb, K // kb, nb, N // nb)
            * s[:, :, None, :, None]
        ).reshape(E, K, N)
        return (
            {"w8": w8_fp8, f"weight_scale_block{block}": jnp.asarray(s)},
            deq,
        )
    s = np.stack([d["weight_scale"][None, :] for d in per])  # [E, 1, N]
    deq = w8 * s
    return ({"w8": w8_fp8, "weight_scale": jnp.asarray(s)}, deq)


@pytest.mark.parametrize("kind", ["fp8_block", "fp8_channel", "int8"])
def test_resolve_expert_weights_matches_dequant(kind):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((4, 64, 96)) * 0.1).astype(np.float32)
    leaves, deq = _quantize_expert_stack(w, kind)
    assert expert_count(leaves) == 4
    got = np.asarray(resolve_expert_weights(leaves, jnp.float32))
    np.testing.assert_allclose(got, deq, rtol=1e-6, atol=1e-7)
    # and the quantization error itself is small
    rel = np.abs(deq - w) / (np.abs(w) + 1e-5)
    assert np.median(rel) < 0.06


@pytest.mark.parametrize("kind", ["fp8_block", "int8"])
def test_moe_ffn_quantized_matches_dense(kind):
    """moe_ffn with quantized leaf dicts == moe_ffn with the dequantized
    dense stacks (identical op order -> bit-exact in f32)."""
    rng = np.random.default_rng(1)
    E, Dm, I, T, k = 4, 64, 96, 10, 2
    gw = (rng.standard_normal((E, Dm, I)) * 0.1).astype(np.float32)
    uw = (rng.standard_normal((E, Dm, I)) * 0.1).astype(np.float32)
    dw = (rng.standard_normal((E, I, Dm)) * 0.1).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((T, Dm)), jnp.float32)
    w = jnp.asarray(rng.random((T, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, size=(T, k)), jnp.int32)

    q_leaves, deq = {}, {}
    for name, arr in (("g", gw), ("u", uw), ("d", dw)):
        q_leaves[name], deq[name] = _quantize_expert_stack(arr, kind)
    ref = moe_ffn(
        x, w, idx,
        jnp.asarray(deq["g"]), jnp.asarray(deq["u"]), jnp.asarray(deq["d"]),
    )
    got = moe_ffn(x, w, idx, q_leaves["g"], q_leaves["u"], q_leaves["d"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


# ------------------------------------------------------------- e2e deepseek
def _fabricate_dsv2_fp8_experts(block=32):
    """Tiny DeepSeek-V2 with fp8-blockwise-quantized EXPERT weights
    (weight_scale_inv, the DeepSeek convention). Returns (quant_dir,
    dense_ref_dir) where the dense ref holds the exactly-dequantized expert
    weights, so greedy decode must match in fp32."""
    import torch
    from safetensors.torch import save_file
    from test_models_parity import TINY_DEEPSEEK_V2_CFG
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = dict(TINY_DEEPSEEK_V2_CFG)
    hf_cfg = AutoConfig.for_model(
        **{k: v for k, v in cfg.items() if k != "architectures"}
    )
    torch.manual_seed(21)
    model = AutoModelForCausalLM.from_config(hf_cfg).to(torch.float32).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    quant_sd = {}
    params = dict(model.named_parameters())
    for name, w in sd.items():
        is_expert = ".mlp.experts." in name and name.endswith("_proj.weight")
        if not is_expert:
            quant_sd[name] = torch.tensor(w)
            continue
        q = quantize_fp8(w.astype(np.float32), mode="block", block=block)
        base = name[: -len(".weight")]
        quant_sd[base + ".weight"] = torch.tensor(
            np.asarray(q["weight"]).view(np.uint8)
        ).view(torch.float8_e4m3fn)
        quant_sd[base + ".weight_scale_inv"] = torch.tensor(q["weight_scale"])
        # Dense ref gets the exactly-dequantized values.
        from ltp_sglang_tpu.layers.quantization.fp8 import (
            dequant_fp8,
            unpack_fp8_to_internal,
        )

        internal = unpack_fp8_to_internal(
            np.asarray(q["weight"]), None,
            weight_scale_inv=q["weight_scale"], block=block,
        )
        deq = np.asarray(dequant_fp8(internal, out_dtype=jnp.float32)).T
        with torch.no_grad():
            params[name].copy_(torch.tensor(deq))

    dense_dir = tempfile.mkdtemp(prefix="dsv2_dense_")
    model.save_pretrained(dense_dir, safe_serialization=True)
    with open(os.path.join(dense_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    quant_dir = tempfile.mkdtemp(prefix="dsv2_fp8_")
    qcfg = dict(cfg)
    qcfg["quantization_config"] = {
        "quant_method": "fp8",
        "fmt": "e4m3",
        "weight_block_size": [block, block],
    }
    with open(os.path.join(quant_dir, "config.json"), "w") as f:
        json.dump(qcfg, f)
    save_file(
        {k: v.contiguous() for k, v in quant_sd.items()},
        os.path.join(quant_dir, "model.safetensors"),
    )
    return quant_dir, dense_dir


def test_deepseek_fp8_experts_checkpoint_parity():
    """Quantized-expert engine vs OUR engine on the exactly-dequantized
    checkpoint: same ragged_dot op order, dequant is exact in f32, so greedy
    decode must match EXACTLY (HF-vs-ours op-order parity is covered by
    test_deepseek_v2_greedy_parity)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    quant_dir, dense_dir = _fabricate_dsv2_fp8_experts()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    dense_eng = Engine(
        ServerArgs(
            model_path=dense_dir, dtype="float32",
            max_total_tokens=2048, max_running_requests=8,
        )
    )
    ref = dense_eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 10, "temperature": 0.0},
    )["output_ids"]
    dense_eng.close()

    eng = Engine(
        ServerArgs(
            model_path=quant_dir, dtype="float32",
            max_total_tokens=2048, max_running_requests=8,
        )
    )
    assert eng.model_runner.model.quant_is_fp8
    # expert leaves must actually be fp8, not silently densified
    moe_layers = eng.model_runner.params["layers_moe"]
    assert isinstance(moe_layers["experts_gate"], dict)
    assert moe_layers["experts_gate"]["w8"].dtype == jnp.float8_e4m3fn
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 10, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, f"{out['output_ids']} != {ref}"


def test_deepseek_int8_experts_dummy_ep_parity():
    """Dummy-quantized (w8a8-int8 experts) DeepSeek on a tp=4 mesh (EP
    all-to-all dispatch with DICT weight leaves through shard_map +
    adapt_specs_to_params) matches the single-device output exactly."""
    from test_models_parity import TINY_DEEPSEEK_V2_CFG

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = dict(TINY_DEEPSEEK_V2_CFG)
    cfg["quantization_config"] = {"quant_method": "w8a8_int8"}
    d = tempfile.mkdtemp(prefix="dsv2_int8_")
    write_tiny_model_dir(d, cfg=cfg, with_weights=False)
    prompt = [1, 5, 7, 9, 100, 200, 31]
    sp = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}

    outs = []
    for tp in (1, 4):
        eng = Engine(
            ServerArgs(
                model_path=d, load_format="dummy", dtype="float32",
                tp_size=tp, max_total_tokens=2048, max_running_requests=8,
            )
        )
        moe_layers = eng.model_runner.params["layers_moe"]
        assert isinstance(moe_layers["experts_gate"], dict)
        assert moe_layers["experts_gate"]["w8i"].dtype == jnp.int8
        outs.append(
            eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        )
        eng.close()
    assert outs[0] == outs[1], outs
