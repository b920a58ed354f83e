"""Reward/classification heads over non-llama trunks: gemma2 score head and
internlm2 v_head (reference models/gemma2_reward.py, internlm2_reward.py)."""

import json
import os
import tempfile

import numpy as np

PROMPT = [1, 5, 7, 9, 100, 200, 31, 42]


def _engine_encode(d, prompt):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(model_path=d, dtype="float32",
                            max_total_tokens=2048, max_running_requests=8))
    try:
        out = eng.encode(input_ids=prompt)
        return np.asarray(out["embedding"], dtype=np.float32)
    finally:
        eng.shutdown()


def test_gemma2_sequence_classification_parity():
    import torch
    from transformers import Gemma2Config, Gemma2ForSequenceClassification

    cfg = Gemma2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=16, max_position_embeddings=256,
        num_labels=3, pad_token_id=0,
    )
    torch.manual_seed(3)
    hf = Gemma2ForSequenceClassification(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_g2_cls_")
    hf.save_pretrained(d, safe_serialization=True)
    with torch.no_grad():
        ref = hf(
            torch.tensor([PROMPT]),
            attention_mask=torch.ones(1, len(PROMPT), dtype=torch.long),
        ).logits[0].numpy()
    got = _engine_encode(d, PROMPT)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_internlm2_reward_model_parity():
    import torch
    from safetensors.torch import save_file
    from transformers import AutoModelForCausalLM

    from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir

    # Build the trunk as a tiny HF llama, repack to internlm2 names, and
    # bolt on a v_head (same packing as test_zoo_tail's internlm2 test).
    cfg = dict(TINY_LLAMA_CFG)
    src = tempfile.mkdtemp(prefix="tiny_ilm2rm_src_")
    write_tiny_model_dir(src, cfg=cfg)
    hf = AutoModelForCausalLM.from_pretrained(src, dtype=torch.float32).eval()
    sd = {k: v.clone() for k, v in hf.state_dict().items()}
    Hq, Hkv, D = 4, 2, 32
    q_per = Hq // Hkv
    out = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}"
        q = sd[f"{p}.self_attn.q_proj.weight"].reshape(Hkv, q_per, D, -1)
        k = sd[f"{p}.self_attn.k_proj.weight"].reshape(Hkv, 1, D, -1)
        v = sd[f"{p}.self_attn.v_proj.weight"].reshape(Hkv, 1, D, -1)
        out[f"{p}.attention.wqkv.weight"] = torch.cat(
            [q, k, v], dim=1).reshape((Hq + 2 * Hkv) * D, -1)
        out[f"{p}.attention.wo.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
        out[f"{p}.feed_forward.w1.weight"] = sd[f"{p}.mlp.gate_proj.weight"]
        out[f"{p}.feed_forward.w3.weight"] = sd[f"{p}.mlp.up_proj.weight"]
        out[f"{p}.feed_forward.w2.weight"] = sd[f"{p}.mlp.down_proj.weight"]
        out[f"{p}.attention_norm.weight"] = sd[f"{p}.input_layernorm.weight"]
        out[f"{p}.ffn_norm.weight"] = sd[f"{p}.post_attention_layernorm.weight"]
    torch.manual_seed(9)
    vh = torch.randn(1, cfg["hidden_size"]) * 0.05
    out["v_head.weight"] = vh

    d = tempfile.mkdtemp(prefix="tiny_ilm2rm_")
    foreign_cfg = {
        **cfg,
        "architectures": ["InternLM2ForRewardModel"],
        "model_type": "internlm2",
        "bias": False,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(foreign_cfg, f)
    save_file({k: v.contiguous() for k, v in out.items()},
              os.path.join(d, "model.safetensors"))

    with torch.no_grad():
        h = hf.model(
            torch.tensor([PROMPT]),
            attention_mask=torch.ones(1, len(PROMPT), dtype=torch.long),
        ).last_hidden_state[0, -1]
        ref = (h @ vh.T).numpy()
    got = _engine_encode(d, PROMPT)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_xlm_roberta_cross_encoder_parity():
    """XLMRobertaForSequenceClassification (reference models/roberta.py
    reranker): CLS -> dense -> tanh -> out_proj through the encode API."""
    import torch
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification as HFXlmCls,
    )

    cfg = XLMRobertaConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=128, type_vocab_size=1,
        num_labels=1, pad_token_id=1,
    )
    torch.manual_seed(11)
    hf = HFXlmCls(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_xlmr_cls_")
    hf.save_pretrained(d, safe_serialization=True)
    ids = [0, 7, 9, 11, 2]
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
        ).logits[0].numpy()
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=1024, max_running_requests=8,
        chunked_prefill_size=-1,
    ))
    try:
        got = np.asarray(eng.encode(input_ids=ids)["embedding"], np.float32)
    finally:
        eng.shutdown()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)
