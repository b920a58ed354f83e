"""Parity tests for the legacy/Chinese model-zoo tail (internlm2, baichuan,
qwen-v1, chatglm, xverse, mimo).

These architectures ship in trust-remote-code checkpoint formats that the
installed transformers cannot instantiate natively, so parity is established
by ROUND-TRIP: generate a tiny native HF model whose math is identical
(llama / qwen2 / glm — the equivalences are documented in each model file
against the reference implementation), re-serialize its weights into the
foreign checkpoint layout, and assert our engine's greedy output on the
foreign checkpoint matches the native HF model's. The baichuan ALIBI mode
has no native HF twin and is checked against a hand-rolled torch forward.
"""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import (
    TINY_GLM_CFG,
    TINY_LLAMA_CFG,
    TINY_QWEN2_CFG,
    write_tiny_model_dir,
)


def _hf_greedy(model, prompt, max_new):
    import torch

    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=max_new,
            do_sample=False,
        )
    return out[0].tolist()[len(prompt):]


def _engine_greedy(model_dir, prompt, max_new):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=model_dir, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": max_new, "temperature": 0.0},
    )
    return out["output_ids"]


def _write_foreign(dirname_prefix, cfg, tensors):
    import torch
    from safetensors.torch import save_file

    d = tempfile.mkdtemp(prefix=dirname_prefix)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    save_file(
        {k: v.contiguous() for k, v in tensors.items()},
        os.path.join(d, "model.safetensors"),
    )
    return d


PROMPT = [1, 5, 7, 9, 100, 200, 31, 42]


def _native_model_and_weights(native_cfg, prefix):
    import torch
    from transformers import AutoModelForCausalLM

    d = tempfile.mkdtemp(prefix=prefix)
    write_tiny_model_dir(d, cfg=native_cfg)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    sd = {k: v.detach().clone() for k, v in hf.state_dict().items()}
    # HF ties/absent lm_head: materialize for formats that store it.
    if "lm_head.weight" not in sd:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"].clone()
    return hf, sd


def test_internlm2_roundtrip_parity():
    """InternLM2 = llama math; wqkv packs q/k/v grouped per kv head
    (reference internlm2.py:335-345)."""
    import torch

    cfg = dict(TINY_LLAMA_CFG)
    hf, sd = _native_model_and_weights(cfg, "tiny_ilm2_src_")
    Hq, Hkv, D = 4, 2, 32
    q_per = Hq // Hkv
    out = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}"
        q = sd[f"{p}.self_attn.q_proj.weight"].reshape(Hkv, q_per, D, -1)
        k = sd[f"{p}.self_attn.k_proj.weight"].reshape(Hkv, 1, D, -1)
        v = sd[f"{p}.self_attn.v_proj.weight"].reshape(Hkv, 1, D, -1)
        wqkv = torch.cat([q, k, v], dim=1).reshape((Hq + 2 * Hkv) * D, -1)
        out[f"{p}.attention.wqkv.weight"] = wqkv
        out[f"{p}.attention.wo.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
        out[f"{p}.feed_forward.w1.weight"] = sd[f"{p}.mlp.gate_proj.weight"]
        out[f"{p}.feed_forward.w3.weight"] = sd[f"{p}.mlp.up_proj.weight"]
        out[f"{p}.feed_forward.w2.weight"] = sd[f"{p}.mlp.down_proj.weight"]
        out[f"{p}.attention_norm.weight"] = sd[f"{p}.input_layernorm.weight"]
        out[f"{p}.ffn_norm.weight"] = sd[f"{p}.post_attention_layernorm.weight"]
    foreign_cfg = {
        **{k: v for k, v in cfg.items()},
        "architectures": ["InternLM2ForCausalLM"],
        "model_type": "internlm2",
        "bias": False,
    }
    d = _write_foreign("tiny_ilm2_", foreign_cfg, out)
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)


def test_baichuan_rope_roundtrip_parity():
    """Baichuan 7B geometry: llama MHA with fused W_pack (reference
    baichuan.py:152-208)."""
    import torch

    cfg = {**TINY_LLAMA_CFG, "num_key_value_heads": 4}
    hf, sd = _native_model_and_weights(cfg, "tiny_bc_src_")
    out = {
        "model.embed_tokens.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}"
        out[f"{p}.self_attn.W_pack.weight"] = torch.cat(
            [
                sd[f"{p}.self_attn.q_proj.weight"],
                sd[f"{p}.self_attn.k_proj.weight"],
                sd[f"{p}.self_attn.v_proj.weight"],
            ],
            dim=0,
        )
        for leaf in (
            "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
        ):
            out[f"{p}.{leaf}.weight"] = sd[f"{p}.{leaf}.weight"]
        out[f"{p}.input_layernorm.weight"] = sd[f"{p}.input_layernorm.weight"]
        out[f"{p}.post_attention_layernorm.weight"] = sd[
            f"{p}.post_attention_layernorm.weight"
        ]
    foreign_cfg = {
        **{k: v for k, v in cfg.items()},
        "architectures": ["BaichuanForCausalLM"],
        "model_type": "baichuan",
        "position_embedding": "ROPE",
    }
    d = _write_foreign("tiny_bc_", foreign_cfg, out)
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)


def test_baichuan_alibi_parity_handrolled():
    """Baichuan 13B geometry (ALIBI, no rope) vs a hand-rolled torch forward
    using the same slope schedule (reference baichuan.py:52-74,171-213)."""
    import torch

    from ltp_sglang_tpu.models.gpt_classics import bloom_alibi_slopes

    cfg = {**TINY_LLAMA_CFG, "num_key_value_heads": 4}
    _, sd = _native_model_and_weights(cfg, "tiny_bca_src_")
    L, H, D, Dm = 2, 4, 32, 128
    out = {
        "model.embed_tokens.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(L):
        p = f"model.layers.{i}"
        out[f"{p}.self_attn.W_pack.weight"] = torch.cat(
            [
                sd[f"{p}.self_attn.q_proj.weight"],
                sd[f"{p}.self_attn.k_proj.weight"],
                sd[f"{p}.self_attn.v_proj.weight"],
            ],
            dim=0,
        )
        for leaf in (
            "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
            "input_layernorm", "post_attention_layernorm",
        ):
            out[f"{p}.{leaf}.weight"] = sd[f"{p}.{leaf}.weight"]
    foreign_cfg = {
        **{k: v for k, v in cfg.items()},
        "architectures": ["BaichuanForCausalLM"],
        "model_type": "baichuan",
        "position_embedding": "ALIBI",
    }
    d = _write_foreign("tiny_bca_", foreign_cfg, out)

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x * x).mean(-1, keepdim=True) + eps) * w

    slopes = torch.tensor(bloom_alibi_slopes(H), dtype=torch.float32)

    def ref_step(ids):
        x = out["model.embed_tokens.weight"][ids]  # [T, Dm]
        T = x.shape[0]
        kpos = torch.arange(T, dtype=torch.float32)
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        for i in range(L):
            p = f"model.layers.{i}"
            h = rms(x, out[f"{p}.input_layernorm.weight"])
            qkv = h @ out[f"{p}.self_attn.W_pack.weight"].T
            q, k, v = qkv.split(H * D, dim=-1)
            q = q.reshape(T, H, D).transpose(0, 1)
            k = k.reshape(T, H, D).transpose(0, 1)
            v = v.reshape(T, H, D).transpose(0, 1)
            scores = (q @ k.transpose(1, 2)) * D**-0.5
            scores = scores + slopes[:, None, None] * kpos[None, None, :]
            scores = scores.masked_fill(~causal[None], float("-inf"))
            attn = torch.softmax(scores, dim=-1) @ v  # [H, T, D]
            o = attn.transpose(0, 1).reshape(T, H * D)
            x = x + o @ out[f"{p}.self_attn.o_proj.weight"].T
            h2 = rms(x, out[f"{p}.post_attention_layernorm.weight"])
            gate = torch.nn.functional.silu(
                h2 @ out[f"{p}.mlp.gate_proj.weight"].T
            )
            up = h2 @ out[f"{p}.mlp.up_proj.weight"].T
            x = x + (gate * up) @ out[f"{p}.mlp.down_proj.weight"].T
        logits = rms(x[-1], out["model.norm.weight"]) @ out["lm_head.weight"].T
        return int(logits.argmax())

    ids = list(PROMPT)
    ref = []
    with torch.no_grad():
        for _ in range(10):
            nxt = ref_step(torch.tensor(ids))
            ref.append(nxt)
            ids.append(nxt)
    assert _engine_greedy(d, PROMPT, 10) == ref


def test_baichuan2_normhead():
    """Baichuan2 checkpoints (vocab 125696) L2-normalize the lm_head at load
    (reference baichuan.py:395-404)."""
    import jax.numpy as jnp

    from ltp_sglang_tpu.config.model_config import ModelConfig
    from ltp_sglang_tpu.models.baichuan import BaichuanForCausalLM

    Dm, V = 8, 125696
    cfg = ModelConfig.from_hf_config({
        "architectures": ["BaichuanForCausalLM"],
        "model_type": "baichuan",
        "hidden_size": Dm, "intermediate_size": 16, "num_hidden_layers": 1,
        "num_attention_heads": 2, "num_key_value_heads": 2,
        "vocab_size": V, "max_position_embeddings": 64,
        "rms_norm_eps": 1e-5, "tie_word_embeddings": False,
        "position_embedding": "ROPE", "torch_dtype": "float32",
    }, model_path="", dtype="float32")
    model = BaichuanForCausalLM(cfg)
    rng = np.random.RandomState(0)
    w = {
        "model.embed_tokens.weight": rng.randn(V, Dm).astype(np.float32),
        "model.norm.weight": np.ones(Dm, np.float32),
        "lm_head.weight": rng.randn(V, Dm).astype(np.float32) * 3.0,
    }
    for leaf, shape in (
        ("self_attn.W_pack.weight", (3 * Dm, Dm)),
        ("self_attn.o_proj.weight", (Dm, Dm)),
        ("mlp.gate_proj.weight", (16, Dm)),
        ("mlp.up_proj.weight", (16, Dm)),
        ("mlp.down_proj.weight", (Dm, 16)),
        ("input_layernorm.weight", (Dm,)),
        ("post_attention_layernorm.weight", (Dm,)),
    ):
        w[f"model.layers.0.{leaf}"] = (
            np.ones(shape, np.float32) if "norm" in leaf
            else rng.randn(*shape).astype(np.float32) * 0.02
        )
    params = model.convert_hf_weights(dict(w))
    head = np.asarray(params["lm_head"]["kernel"], dtype=np.float32)  # [Dm, V]
    norms = np.linalg.norm(head, axis=0)
    np.testing.assert_allclose(norms, np.ones(V), atol=1e-4)


def test_qwen1_roundtrip_parity():
    """Qwen v1 = qwen2 math (qkv-bias-only MHA); checkpoint stores fused
    c_attn, w2=gate / w1=up, and DOUBLE-width intermediate_size (reference
    qwen.py:107-123,262,329-330)."""
    import torch

    cfg = {**TINY_QWEN2_CFG, "num_key_value_heads": 4}
    hf, sd = _native_model_and_weights(cfg, "tiny_qw1_src_")
    out = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(cfg["num_hidden_layers"]):
        p, fp = f"model.layers.{i}", f"transformer.h.{i}"
        out[f"{fp}.attn.c_attn.weight"] = torch.cat(
            [sd[f"{p}.self_attn.{x}_proj.weight"] for x in "qkv"], dim=0
        )
        out[f"{fp}.attn.c_attn.bias"] = torch.cat(
            [sd[f"{p}.self_attn.{x}_proj.bias"] for x in "qkv"], dim=0
        )
        out[f"{fp}.attn.c_proj.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
        out[f"{fp}.mlp.w2.weight"] = sd[f"{p}.mlp.gate_proj.weight"]
        out[f"{fp}.mlp.w1.weight"] = sd[f"{p}.mlp.up_proj.weight"]
        out[f"{fp}.mlp.c_proj.weight"] = sd[f"{p}.mlp.down_proj.weight"]
        out[f"{fp}.ln_1.weight"] = sd[f"{p}.input_layernorm.weight"]
        out[f"{fp}.ln_2.weight"] = sd[f"{p}.post_attention_layernorm.weight"]
    foreign_cfg = {
        "architectures": ["QWenLMHeadModel"],
        "model_type": "qwen",
        "hidden_size": 128,
        "intermediate_size": 512,  # concatenated gate+up width
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "kv_channels": 32,
        "vocab_size": 512,
        "seq_length": 512,
        "layer_norm_epsilon": 1e-5,
        "rotary_emb_base": 10000.0,
        "no_bias": True,
        "tie_word_embeddings": False,
        "eos_token_id": 2,
        "torch_dtype": "float32",
    }
    d = _write_foreign("tiny_qw1_", foreign_cfg, out)
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)


def test_chatglm_roundtrip_parity():
    """ChatGLM (THUDM format) = HF glm math (partial interleaved rotary, MQA,
    fused swiglu); reference chatglm.py:103-109,158-166."""
    import torch

    hf, sd = _native_model_and_weights(dict(TINY_GLM_CFG), "tiny_cglm_src_")
    out = {
        "transformer.embedding.word_embeddings.weight": sd[
            "model.embed_tokens.weight"
        ],
        "transformer.encoder.final_layernorm.weight": sd["model.norm.weight"],
        "transformer.output_layer.weight": sd["lm_head.weight"],
    }
    for i in range(TINY_GLM_CFG["num_hidden_layers"]):
        p = f"model.layers.{i}"
        fp = f"transformer.encoder.layers.{i}"
        out[f"{fp}.self_attention.query_key_value.weight"] = torch.cat(
            [sd[f"{p}.self_attn.{x}_proj.weight"] for x in "qkv"], dim=0
        )
        out[f"{fp}.self_attention.query_key_value.bias"] = torch.cat(
            [sd[f"{p}.self_attn.{x}_proj.bias"] for x in "qkv"], dim=0
        )
        out[f"{fp}.self_attention.dense.weight"] = sd[
            f"{p}.self_attn.o_proj.weight"
        ]
        out[f"{fp}.mlp.dense_h_to_4h.weight"] = sd[f"{p}.mlp.gate_up_proj.weight"]
        out[f"{fp}.mlp.dense_4h_to_h.weight"] = sd[f"{p}.mlp.down_proj.weight"]
        out[f"{fp}.input_layernorm.weight"] = sd[f"{p}.input_layernorm.weight"]
        out[f"{fp}.post_attention_layernorm.weight"] = sd[
            f"{p}.post_attention_layernorm.weight"
        ]
    foreign_cfg = {
        "architectures": ["ChatGLMModel"],
        "model_type": "chatglm",
        "hidden_size": 128,
        "ffn_hidden_size": 256,
        "num_layers": 2,
        "num_attention_heads": 4,
        "multi_query_attention": True,
        "multi_query_group_num": 2,
        "kv_channels": 32,
        "padded_vocab_size": 512,
        "seq_length": 512,
        "layernorm_epsilon": 1e-5,
        "rmsnorm": True,
        "add_qkv_bias": True,
        "add_bias_linear": False,
        "rope_ratio": 1.0,
        "apply_residual_connection_post_layernorm": False,
        "tie_word_embeddings": False,
        "eos_token_id": 2,
        "torch_dtype": "float32",
    }
    d = _write_foreign("tiny_cglm_", foreign_cfg, out)
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)


def test_xverse_roundtrip_parity():
    """Xverse = llama with llama leaf names (reference xverse.py)."""
    cfg = dict(TINY_LLAMA_CFG)
    hf, sd = _native_model_and_weights(cfg, "tiny_xv_src_")
    foreign_cfg = {
        **cfg, "architectures": ["XverseForCausalLM"], "model_type": "xverse",
    }
    d = _write_foreign("tiny_xv_", foreign_cfg, dict(sd))
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)


def test_mimo_roundtrip_parity():
    """MiMo = qwen2 body; mtp_layers leaves must be skipped at load
    (reference mimo.py:110-127)."""
    import torch

    cfg = dict(TINY_QWEN2_CFG)
    hf, sd = _native_model_and_weights(cfg, "tiny_mimo_src_")
    sd = dict(sd)
    # Draft-head leaves the main model must ignore.
    sd["model.mtp_layers.0.self_attn.q_proj.weight"] = torch.full(
        (128, 128), float("nan")
    )
    foreign_cfg = {
        **cfg,
        "architectures": ["MiMoForCausalLM"],
        "model_type": "mimo",
        "num_nextn_predict_layers": 1,
    }
    d = _write_foreign("tiny_mimo_", foreign_cfg, sd)
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)


def _rms_t(x, w, eps=1e-5):
    import torch

    return x * torch.rsqrt((x * x).mean(-1, keepdim=True) + eps) * w


def test_minicpm_parity_handrolled():
    """MiniCPM = llama + mup scalings (scale_emb, scale_depth/sqrt(L),
    dim_model_base/hidden logits scale; reference minicpm.py:220-327)."""
    import torch

    cfg = {
        **TINY_LLAMA_CFG,
        "architectures": ["MiniCPMForCausalLM"],
        "model_type": "minicpm",
        "scale_emb": 12.0,
        "scale_depth": 1.4,
        "dim_model_base": 32,
        "tie_word_embeddings": True,
    }
    # Generate llama-shaped weights (names match), then hand-roll the math.
    src = {**TINY_LLAMA_CFG, "tie_word_embeddings": True}
    _, sd = _native_model_and_weights(src, "tiny_mcpm_src_")
    sd.pop("lm_head.weight", None)
    d = _write_foreign("tiny_mcpm_", cfg, dict(sd))

    L, Hq, Hkv, D, Dm = 2, 4, 2, 32, 128
    scale_res = 1.4 / (L ** 0.5)

    def rope_t(x, pos0):
        import torch

        T, H, Dh = x.shape
        inv = 1.0 / (10000.0 ** (torch.arange(0, Dh, 2, dtype=torch.float64) / Dh))
        t = torch.arange(pos0, pos0 + T, dtype=torch.float64)
        f = torch.outer(t, inv)
        cos = torch.cos(f).float()[:, None, :]
        sin = torch.sin(f).float()[:, None, :]
        x1, x2 = x[..., : Dh // 2], x[..., Dh // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def ref_step(ids):
        import torch

        x = sd["model.embed_tokens.weight"][ids] * 12.0
        T = x.shape[0]
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        for i in range(L):
            p = f"model.layers.{i}"
            h = _rms_t(x, sd[f"{p}.input_layernorm.weight"])
            q = (h @ sd[f"{p}.self_attn.q_proj.weight"].T).reshape(T, Hq, D)
            k = (h @ sd[f"{p}.self_attn.k_proj.weight"].T).reshape(T, Hkv, D)
            v = (h @ sd[f"{p}.self_attn.v_proj.weight"].T).reshape(T, Hkv, D)
            q, k = rope_t(q, 0), rope_t(k, 0)
            k = k.repeat_interleave(Hq // Hkv, dim=1)
            v = v.repeat_interleave(Hq // Hkv, dim=1)
            s = torch.einsum("thd,chd->htc", q, k) * D**-0.5
            s = s.masked_fill(~causal[None], float("-inf"))
            o = torch.einsum("htc,chd->thd", torch.softmax(s, -1), v)
            o = o.reshape(T, Hq * D) @ sd[f"{p}.self_attn.o_proj.weight"].T
            x = x + o * scale_res
            h2 = _rms_t(x, sd[f"{p}.post_attention_layernorm.weight"])
            gate = torch.nn.functional.silu(h2 @ sd[f"{p}.mlp.gate_proj.weight"].T)
            up = h2 @ sd[f"{p}.mlp.up_proj.weight"].T
            x = x + ((gate * up) @ sd[f"{p}.mlp.down_proj.weight"].T) * scale_res
        logits = (
            _rms_t(x[-1], sd["model.norm.weight"])
            @ sd["model.embed_tokens.weight"].T
        ) * (32.0 / Dm)
        return int(logits.argmax())

    import torch

    ids = list(PROMPT)
    ref = []
    with torch.no_grad():
        for _ in range(10):
            nxt = ref_step(torch.tensor(ids))
            ref.append(nxt)
            ids.append(nxt)
    assert _engine_greedy(d, PROMPT, 10) == ref


def test_grok1_parity_handrolled():
    """Grok-1 vs a hand-rolled torch forward: sandwich norms, tanh attention
    softcap 30, router softcap->softmax->top2 (no renorm), exact-GELU
    experts, embedding/output multipliers (reference grok.py:107-116,
    218-226,353-409,456,640-644)."""
    import torch

    L, Hq, Hkv, D, Dm, E, I, V = 2, 4, 2, 16, 64, 4, 32, 512
    rng = np.random.RandomState(7)

    def t(*shape, scale=0.05):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * scale)

    w = {
        "model.embed_tokens.weight": t(V, Dm, scale=0.5),
        "model.norm.weight": torch.ones(Dm) + t(Dm, scale=0.1),
        "lm_head.weight": t(V, Dm, scale=0.5),
    }
    for i in range(L):
        p = f"model.layers.{i}"
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            w[f"{p}.{n}.weight"] = torch.ones(Dm) + t(Dm, scale=0.1)
        w[f"{p}.self_attn.q_proj.weight"] = t(Hq * D, Dm)
        w[f"{p}.self_attn.k_proj.weight"] = t(Hkv * D, Dm)
        w[f"{p}.self_attn.v_proj.weight"] = t(Hkv * D, Dm)
        w[f"{p}.self_attn.o_proj.weight"] = t(Dm, Hq * D)
        w[f"{p}.block_sparse_moe.gate.weight"] = t(E, Dm, scale=0.5)
        for e in range(E):
            w[f"{p}.block_sparse_moe.experts.{e}.w1.weight"] = t(I, Dm)
            w[f"{p}.block_sparse_moe.experts.{e}.w3.weight"] = t(I, Dm)
            w[f"{p}.block_sparse_moe.experts.{e}.w2.weight"] = t(Dm, I)
    cfg = {
        "architectures": ["Grok1ForCausalLM"],
        "model_type": "grok-1",
        "hidden_size": Dm, "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": Hq, "num_key_value_heads": Hkv, "head_dim": D,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "moe_intermediate_size": I,
        "vocab_size": V, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "attn_logit_softcapping": 30.0, "router_logit_softcapping": 30.0,
        "embedding_multiplier_scale": 2.0, "output_multiplier_scale": 0.5,
        "tie_word_embeddings": False, "eos_token_id": 2,
        "torch_dtype": "float32",
    }
    d = _write_foreign("tiny_grok_", cfg, w)

    def rope_t(x):
        T, H, Dh = x.shape
        inv = 1.0 / (10000.0 ** (torch.arange(0, Dh, 2, dtype=torch.float64) / Dh))
        tt = torch.arange(T, dtype=torch.float64)
        f = torch.outer(tt, inv)
        cos = torch.cos(f).float()[:, None, :]
        sin = torch.sin(f).float()[:, None, :]
        x1, x2 = x[..., : Dh // 2], x[..., Dh // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def ref_step(ids):
        x = w["model.embed_tokens.weight"][ids] * 2.0
        T = x.shape[0]
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        for i in range(L):
            p = f"model.layers.{i}"
            h = _rms_t(x, w[f"{p}.pre_attn_norm.weight"])
            q = rope_t((h @ w[f"{p}.self_attn.q_proj.weight"].T).reshape(T, Hq, D))
            k = rope_t((h @ w[f"{p}.self_attn.k_proj.weight"].T).reshape(T, Hkv, D))
            v = (h @ w[f"{p}.self_attn.v_proj.weight"].T).reshape(T, Hkv, D)
            k = k.repeat_interleave(Hq // Hkv, dim=1)
            v = v.repeat_interleave(Hq // Hkv, dim=1)
            s = torch.einsum("thd,chd->htc", q, k) * D**-0.5
            s = 30.0 * torch.tanh(s / 30.0)
            s = s.masked_fill(~causal[None], float("-inf"))
            o = torch.einsum("htc,chd->thd", torch.softmax(s, -1), v)
            o = o.reshape(T, Hq * D) @ w[f"{p}.self_attn.o_proj.weight"].T
            x = x + _rms_t(o, w[f"{p}.post_attn_norm.weight"])
            h2 = _rms_t(x, w[f"{p}.pre_moe_norm.weight"])
            logits = h2 @ w[f"{p}.block_sparse_moe.gate.weight"].T
            logits = 30.0 * torch.tanh(logits / 30.0)
            probs = torch.softmax(logits, dim=-1)
            topw, topi = probs.topk(2, dim=-1)  # no renormalize
            moe = torch.zeros_like(h2)
            for e in range(E):
                g = torch.nn.functional.gelu(
                    h2 @ w[f"{p}.block_sparse_moe.experts.{e}.w1.weight"].T,
                    approximate="none",
                )
                u = h2 @ w[f"{p}.block_sparse_moe.experts.{e}.w3.weight"].T
                out_e = (g * u) @ w[f"{p}.block_sparse_moe.experts.{e}.w2.weight"].T
                sel = (topi == e).float() * topw
                moe = moe + sel.sum(-1, keepdim=True) * out_e
            x = x + _rms_t(moe, w[f"{p}.post_moe_norm.weight"])
        logits = (
            _rms_t(x[-1], w["model.norm.weight"]) @ w["lm_head.weight"].T
        ) * 0.5
        return int(logits.argmax())

    import torch as _torch

    ids = list(PROMPT)
    ref = []
    with _torch.no_grad():
        for _ in range(10):
            nxt = ref_step(_torch.tensor(ids))
            ref.append(nxt)
            ids.append(nxt)
    assert _engine_greedy(d, PROMPT, 10) == ref


def test_minicpm3_mla_parity_handrolled():
    """MiniCPM3: deepseek MLA attention in an all-dense body with the
    MiniCPM mup scalings (reference minicpm3.py:96-260,291,331-340,425)."""
    import torch

    L, H, Dm, V = 2, 4, 64, 512
    nope, rope, kv_lora, q_lora, I = 16, 8, 32, 32, 128
    vdim = Dm // H  # reference :291
    qk = nope + rope
    rng = np.random.RandomState(11)

    def t(*shape, scale=0.05):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * scale)

    w = {
        "model.embed_tokens.weight": t(V, Dm, scale=0.5),
        "model.norm.weight": torch.ones(Dm) + t(Dm, scale=0.1),
        "lm_head.weight": t(V, Dm, scale=0.5),
    }
    for i in range(L):
        p = f"model.layers.{i}"
        w[f"{p}.input_layernorm.weight"] = torch.ones(Dm) + t(Dm, scale=0.1)
        w[f"{p}.post_attention_layernorm.weight"] = torch.ones(Dm) + t(Dm, scale=0.1)
        w[f"{p}.self_attn.q_a_proj.weight"] = t(q_lora, Dm)
        w[f"{p}.self_attn.q_a_layernorm.weight"] = torch.ones(q_lora) + t(q_lora, scale=0.1)
        w[f"{p}.self_attn.q_b_proj.weight"] = t(H * qk, q_lora)
        w[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = t(kv_lora + rope, Dm)
        w[f"{p}.self_attn.kv_a_layernorm.weight"] = torch.ones(kv_lora) + t(kv_lora, scale=0.1)
        w[f"{p}.self_attn.kv_b_proj.weight"] = t(H * (nope + vdim), kv_lora)
        w[f"{p}.self_attn.o_proj.weight"] = t(Dm, H * vdim)
        w[f"{p}.mlp.gate_proj.weight"] = t(I, Dm)
        w[f"{p}.mlp.up_proj.weight"] = t(I, Dm)
        w[f"{p}.mlp.down_proj.weight"] = t(Dm, I)
    cfg = {
        "architectures": ["MiniCPM3ForCausalLM"],
        "model_type": "minicpm3",
        "hidden_size": Dm, "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": H,
        "qk_nope_head_dim": nope, "qk_rope_head_dim": rope,
        "kv_lora_rank": kv_lora, "q_lora_rank": q_lora,
        "vocab_size": V, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 32,
        "tie_word_embeddings": False, "eos_token_id": 2,
        "torch_dtype": "float32",
    }
    d = _write_foreign("tiny_mcpm3_", cfg, w)
    scale_res = 1.4 / (L ** 0.5)

    def rope_t(x):
        # x: [T, Hn, rope] (neox pairs over the rope dims)
        T, Hn, Dh = x.shape
        inv = 1.0 / (10000.0 ** (torch.arange(0, Dh, 2, dtype=torch.float64) / Dh))
        tt = torch.arange(T, dtype=torch.float64)
        f = torch.outer(tt, inv)
        cos = torch.cos(f).float()[:, None, :]
        sin = torch.sin(f).float()[:, None, :]
        x1, x2 = x[..., : Dh // 2], x[..., Dh // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def ref_step(ids):
        x = w["model.embed_tokens.weight"][ids] * 12.0
        T = x.shape[0]
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        for i in range(L):
            p = f"{'model.layers.'}{i}"
            h = _rms_t(x, w[f"{p}.input_layernorm.weight"])
            qa = _rms_t(h @ w[f"{p}.self_attn.q_a_proj.weight"].T,
                        w[f"{p}.self_attn.q_a_layernorm.weight"])
            q = (qa @ w[f"{p}.self_attn.q_b_proj.weight"].T).reshape(T, H, qk)
            q_nope, q_rope = q[..., :nope], q[..., nope:]
            kva = h @ w[f"{p}.self_attn.kv_a_proj_with_mqa.weight"].T
            lora = _rms_t(kva[:, :kv_lora], w[f"{p}.self_attn.kv_a_layernorm.weight"])
            k_rope = kva[:, kv_lora:].reshape(T, 1, rope)
            kv = (lora @ w[f"{p}.self_attn.kv_b_proj.weight"].T).reshape(
                T, H, nope + vdim
            )
            k_nope, v = kv[..., :nope], kv[..., nope:]
            q_rope, k_rope = rope_t(q_rope), rope_t(k_rope)
            k = torch.cat([k_nope, k_rope.expand(T, H, rope)], dim=-1)
            qfull = torch.cat([q_nope, q_rope], dim=-1)
            s = torch.einsum("thd,chd->htc", qfull, k) * qk**-0.5
            s = s.masked_fill(~causal[None], float("-inf"))
            o = torch.einsum("htc,chd->thd", torch.softmax(s, -1), v)
            o = o.reshape(T, H * vdim) @ w[f"{p}.self_attn.o_proj.weight"].T
            x = x + o * scale_res
            h2 = _rms_t(x, w[f"{p}.post_attention_layernorm.weight"])
            gate = torch.nn.functional.silu(h2 @ w[f"{p}.mlp.gate_proj.weight"].T)
            up = h2 @ w[f"{p}.mlp.up_proj.weight"].T
            x = x + ((gate * up) @ w[f"{p}.mlp.down_proj.weight"].T) * scale_res
        logits = (
            _rms_t(x[-1], w["model.norm.weight"]) @ w["lm_head.weight"].T
        ) * (32.0 / Dm)
        return int(logits.argmax())

    ids = list(PROMPT)
    ref = []
    with torch.no_grad():
        for _ in range(10):
            nxt = ref_step(torch.tensor(ids))
            ref.append(nxt)
            ids.append(nxt)
    assert _engine_greedy(d, PROMPT, 10) == ref


def test_exaone3_roundtrip_parity():
    """EXAONE-3 = llama math under GPT-style names (transformer.h.{i},
    attn.attention.*, mlp.c_fc_0/1/c_proj; reference exaone.py:335-366)."""
    cfg = dict(TINY_LLAMA_CFG)
    hf, sd = _native_model_and_weights(cfg, "tiny_exa_src_")
    out = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    leaf_map = {
        "self_attn.q_proj": "attn.attention.q_proj",
        "self_attn.k_proj": "attn.attention.k_proj",
        "self_attn.v_proj": "attn.attention.v_proj",
        "self_attn.o_proj": "attn.attention.out_proj",
        "mlp.gate_proj": "mlp.c_fc_0",
        "mlp.up_proj": "mlp.c_fc_1",
        "mlp.down_proj": "mlp.c_proj",
        "input_layernorm": "ln_1",
        "post_attention_layernorm": "ln_2",
    }
    for i in range(cfg["num_hidden_layers"]):
        for src, dst in leaf_map.items():
            out[f"transformer.h.{i}.{dst}.weight"] = sd[
                f"model.layers.{i}.{src}.weight"
            ]
    foreign_cfg = {
        "architectures": ["ExaoneForCausalLM"],
        "model_type": "exaone",
        "hidden_size": cfg["hidden_size"],
        "intermediate_size": cfg["intermediate_size"],
        "num_layers": cfg["num_hidden_layers"],
        "num_attention_heads": cfg["num_attention_heads"],
        "num_key_value_heads": cfg["num_key_value_heads"],
        "vocab_size": cfg["vocab_size"],
        "max_position_embeddings": cfg["max_position_embeddings"],
        "layer_norm_epsilon": cfg["rms_norm_eps"],
        "rope_theta": cfg["rope_theta"],
        "activation_function": "silu",
        "tie_word_embeddings": False,
        "eos_token_id": 2,
    }
    d = _write_foreign("tiny_exaone_", foreign_cfg, out)
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)


def test_xverse_moe_roundtrip_parity():
    """XVERSE-MoE routing math: with all experts identical and
    norm_topk_prob, the top-k mixture reduces exactly to one expert's MLP
    (weights sum to 1), so the foreign MoE checkpoint must reproduce the
    native llama greedily (reference xverse_moe.py:168-185 fused_moe with
    renormalize)."""
    cfg = dict(TINY_LLAMA_CFG)
    hf, sd = _native_model_and_weights(cfg, "tiny_xvm_src_")
    E = 4
    out = {
        "model.embed_tokens.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    import torch

    torch.manual_seed(17)
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}"
        for leaf in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                     "self_attn.o_proj", "input_layernorm",
                     "post_attention_layernorm"):
            out[f"{p}.{leaf}.weight"] = sd[f"{p}.{leaf}.weight"]
        out[f"{p}.mlp.router.weight"] = torch.randn(E, cfg["hidden_size"]) * 0.1
        for e in range(E):
            for leaf in ("gate_proj", "up_proj", "down_proj"):
                out[f"{p}.mlp.experts.{e}.{leaf}.weight"] = sd[
                    f"{p}.mlp.{leaf}.weight"
                ].clone()
    foreign_cfg = {
        **cfg,
        "architectures": ["XverseMoeForCausalLM"],
        "model_type": "xverse",
        "num_experts": E,
        "moe_top_k": 2,
        "norm_topk_prob": True,
        "num_shared_experts": None,
    }
    d = _write_foreign("tiny_xverse_moe_", foreign_cfg, out)
    assert _engine_greedy(d, PROMPT, 12) == _hf_greedy(hf, PROMPT, 12)
