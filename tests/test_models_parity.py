"""Greedy parity vs HF transformers for each supported dense architecture
(the analog of test/srt/models/test_generation_models.py)."""

import tempfile

import numpy as np
import pytest

from tiny_configs import (
    TINY_BLOOM_CFG,
    TINY_LLAMA_CFG,
    TINY_COHERE_CFG,
    TINY_FALCON_CFG,
    TINY_GPT2_CFG,
    TINY_GPTJ_CFG,
    TINY_GPT_BIGCODE_CFG,
    TINY_GPT_NEOX_CFG,
    TINY_MPT_CFG,
    TINY_OPT_CFG,
    TINY_PHI_CFG,
    TINY_ERNIE45_CFG,
    TINY_EXAONE4_CFG,
    TINY_GLM4_CFG,
    TINY_GLM_CFG,
    TINY_GRANITE_CFG,
    TINY_OLMO3_CFG,
    TINY_SEED_OSS_CFG,
    TINY_MISTRAL_CFG,
    TINY_NEMOTRON_CFG,
    TINY_OLMO2_CFG,
    TINY_OLMO_CFG,
    TINY_QWEN2_CFG,
    TINY_QWEN3_CFG,
    TINY_SMOLLM3_CFG,
    TINY_STABLELM_CFG,
    write_tiny_model_dir,
)


@pytest.mark.parametrize(
    "cfg",
    [
        TINY_QWEN2_CFG,
        TINY_QWEN3_CFG,
        TINY_MISTRAL_CFG,
        TINY_OLMO_CFG,
        TINY_OLMO2_CFG,
        TINY_GRANITE_CFG,
        TINY_COHERE_CFG,
        TINY_GLM_CFG,
        TINY_GLM4_CFG,
        TINY_SMOLLM3_CFG,
        TINY_NEMOTRON_CFG,
        TINY_STABLELM_CFG,
        TINY_GPT2_CFG,
        TINY_GPTJ_CFG,
        TINY_GPT_NEOX_CFG,
        TINY_OPT_CFG,
        TINY_PHI_CFG,
        TINY_BLOOM_CFG,
        TINY_FALCON_CFG,
        TINY_GPT_BIGCODE_CFG,
        TINY_MPT_CFG,
        TINY_EXAONE4_CFG,
        TINY_OLMO3_CFG,
        TINY_SEED_OSS_CFG,
        TINY_ERNIE45_CFG,
    ],
    ids=[
        "qwen2", "qwen3", "mistral", "olmo", "olmo2", "granite", "cohere",
        "glm", "glm4", "smollm3", "nemotron", "stablelm",
        "gpt2", "gptj", "gpt_neox", "opt", "phi", "bloom", "falcon",
        "gpt_bigcode", "mpt", "exaone4", "olmo3", "seed_oss", "ernie4_5",
    ],
)
def test_greedy_parity(cfg):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix=f"tiny_{cfg['model_type']}_")
    write_tiny_model_dir(d, cfg=cfg)

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        # Explicit attention_mask: some configs default pad_token_id to a
        # token present in the prompt, and HF generate would mask it out.
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=16,
            do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(
        ServerArgs(
            model_path=d,
            dtype="float32",
            max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    out = eng.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 16, "temperature": 0.0}
    )
    assert out["output_ids"] == ref, f"{cfg['model_type']}: {out['output_ids']} != {ref}"


TINY_MIXTRAL_CFG = {
    "architectures": ["MixtralForCausalLM"],
    "model_type": "mixtral",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
    "torch_dtype": "float32",
}

TINY_QWEN3_MOE_CFG = {
    "architectures": ["Qwen3MoeForCausalLM"],
    "model_type": "qwen3_moe",
    "hidden_size": 128,
    "intermediate_size": 256,
    "moe_intermediate_size": 96,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "num_experts": 8,
    "num_experts_per_tok": 3,
    "norm_topk_prob": True,
    "decoder_sparse_step": 1,
    "mlp_only_layers": [],
    "torch_dtype": "float32",
}


TINY_OLMOE_CFG = {
    "architectures": ["OlmoeForCausalLM"],
    "model_type": "olmoe",
    "hidden_size": 128,
    "intermediate_size": 96,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "pad_token_id": 2,
    "num_experts": 4,
    "num_experts_per_tok": 2,
    "norm_topk_prob": False,
    "torch_dtype": "float32",
}

TINY_GRANITEMOE_CFG = {
    "architectures": ["GraniteMoeForCausalLM"],
    "model_type": "granitemoe",
    "hidden_size": 128,
    "intermediate_size": 96,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": True,
    "eos_token_id": 2,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
    "embedding_multiplier": 12.0,
    "attention_multiplier": 0.0078125,
    "residual_multiplier": 0.22,
    "logits_scaling": 8.0,
    "torch_dtype": "float32",
}

TINY_PHIMOE_CFG = {
    "architectures": ["PhimoeForCausalLM"],
    "model_type": "phimoe",
    "hidden_size": 128,
    "intermediate_size": 96,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
    "router_jitter_noise": 0.01,
    "attention_bias": True,
    "lm_head_bias": True,
    "sliding_window": None,
    "torch_dtype": "float32",
}

TINY_DBRX_CFG = {
    "architectures": ["DbrxForCausalLM"],
    "model_type": "dbrx",
    "d_model": 128,
    "n_heads": 4,
    "n_layers": 2,
    "max_seq_len": 512,
    "vocab_size": 512,
    "attn_config": {"clip_qkv": 8.0, "kv_n_heads": 2, "rope_theta": 10000.0},
    "ffn_config": {
        "ffn_hidden_size": 96,
        "moe_num_experts": 4,
        "moe_top_k": 2,
        "moe_normalize_expert_weights": 1.0,
    },
    "eos_token_id": 2,
    "bos_token_id": 1,
    "pad_token_id": 2,
    "torch_dtype": "float32",
}


@pytest.mark.parametrize(
    "cfg",
    [TINY_MIXTRAL_CFG, TINY_QWEN3_MOE_CFG, TINY_OLMOE_CFG, TINY_GRANITEMOE_CFG,
     TINY_DBRX_CFG, TINY_PHIMOE_CFG],
    ids=["mixtral", "qwen3_moe", "olmoe", "granitemoe", "dbrx", "phimoe"],
)
def test_moe_greedy_parity(cfg):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix=f"tiny_{cfg['model_type']}_")
    write_tiny_model_dir(d, cfg=cfg)

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12,
            do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(
        ServerArgs(
            model_path=d, dtype="float32", max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    out = eng.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 12, "temperature": 0.0}
    )
    assert out["output_ids"] == ref, f"{cfg['model_type']}: {out['output_ids']} != {ref}"


TINY_DEEPSEEK_V2_CFG = {
    "architectures": ["DeepseekV2ForCausalLM"],
    "model_type": "deepseek_v2",
    "hidden_size": 128,
    "intermediate_size": 256,
    "moe_intermediate_size": 64,
    "num_hidden_layers": 3,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "q_lora_rank": None,
    "kv_lora_rank": 64,
    "qk_nope_head_dim": 32,
    "qk_rope_head_dim": 16,
    "v_head_dim": 32,
    "first_k_dense_replace": 1,
    "n_routed_experts": 8,
    "n_shared_experts": 2,
    "num_experts_per_tok": 3,
    "n_group": 1,
    "topk_group": 1,
    "topk_method": "greedy",
    "norm_topk_prob": False,
    "scoring_func": "softmax",
    "routed_scaling_factor": 1.0,
    "moe_layer_freq": 1,
    "aux_loss_alpha": 0.0,
    "seq_aux": False,
    "torch_dtype": "float32",
}


def test_deepseek_v2_greedy_parity():
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_dsv2_")
    write_tiny_model_dir(d, cfg=TINY_DEEPSEEK_V2_CFG)

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12,
            do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(
        ServerArgs(
            model_path=d, dtype="float32", max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    out = eng.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 12, "temperature": 0.0}
    )
    assert out["output_ids"] == ref, f"dsv2: {out['output_ids']} != {ref}"


TINY_PHI3_CFG = {
    "architectures": ["Phi3ForCausalLM"],
    "model_type": "phi3",
    "pad_token_id": 0,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "torch_dtype": "float32",
}

TINY_QWEN2_MOE_CFG = {
    "architectures": ["Qwen2MoeForCausalLM"],
    "model_type": "qwen2_moe",
    "hidden_size": 128,
    "intermediate_size": 256,
    "moe_intermediate_size": 64,
    "shared_expert_intermediate_size": 96,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "num_experts": 8,
    "num_experts_per_tok": 2,
    "norm_topk_prob": False,
    "decoder_sparse_step": 1,
    "mlp_only_layers": [],
    "torch_dtype": "float32",
}


TINY_GEMMA_CFG = {
    "architectures": ["GemmaForCausalLM"],
    "model_type": "gemma",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "hidden_act": "gelu_pytorch_tanh",
    "hidden_activation": "gelu_pytorch_tanh",
    "tie_word_embeddings": True,
    "eos_token_id": 2,
    "torch_dtype": "float32",
}

TINY_STARCODER2_CFG = {
    "architectures": ["Starcoder2ForCausalLM"],
    "model_type": "starcoder2",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "norm_epsilon": 1e-5,
    "rope_theta": 10000.0,
    "use_bias": True,
    "sliding_window": 16,
    "tie_word_embeddings": True,
    "eos_token_id": 2,
    "hidden_act": "gelu_pytorch_tanh",
    "torch_dtype": "float32",
}


TINY_ARCEE_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["ArceeForCausalLM"],
    "model_type": "arcee",
    "hidden_act": "relu2",
}


@pytest.mark.parametrize(
    "cfg",
    [TINY_PHI3_CFG, TINY_QWEN2_MOE_CFG, TINY_GEMMA_CFG, TINY_STARCODER2_CFG,
     TINY_ARCEE_CFG],
    ids=["phi3", "qwen2_moe", "gemma", "starcoder2", "arcee"],
)
def test_more_model_parity(cfg):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix=f"tiny_{cfg['model_type']}_")
    write_tiny_model_dir(d, cfg=cfg)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200]
    with torch.no_grad():
        ref = hf.generate(torch.tensor([prompt]), max_new_tokens=12, do_sample=False)[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(model_path=d, dtype="float32", max_total_tokens=2048, max_running_requests=8))
    out = eng.generate(input_ids=prompt, sampling_params={"max_new_tokens": 12, "temperature": 0.0})
    assert out["output_ids"] == ref, f"{cfg['model_type']}: {out['output_ids']} != {ref}"


TINY_GEMMA2_CFG = {
    "architectures": ["Gemma2ForCausalLM"],
    "model_type": "gemma2",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": True,
    "eos_token_id": 2,
    "attn_logit_softcapping": 50.0,
    "final_logit_softcapping": 30.0,
    "query_pre_attn_scalar": 32,
    "sliding_window": 16,
    "hidden_activation": "gelu_pytorch_tanh",
    "torch_dtype": "float32",
}


TINY_GEMMA3_CFG = {
    "architectures": ["Gemma3ForCausalLM"],
    "model_type": "gemma3_text",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 6,  # 5 sliding : 1 full (the real pattern)
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 1000000.0,
    "rope_local_base_freq": 10000.0,
    "rope_scaling": {"rope_type": "linear", "factor": 2.0},
    "tie_word_embeddings": True,
    "eos_token_id": 2,
    "query_pre_attn_scalar": 32,
    "sliding_window": 16,
    "hidden_activation": "gelu_pytorch_tanh",
    "torch_dtype": "float32",
}


def test_gemma3_greedy_parity():
    """Gemma-3 text: per-head QK-norm + dual rope (local 10k on sliding
    layers, scaled global 1M on every 6th layer) + SWA rings, vs HF."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_gemma3_")
    write_tiny_model_dir(d, cfg=TINY_GEMMA3_CFG)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42, 77, 88]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=16, do_sample=False
        )[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(model_path=d, dtype="float32",
                            max_total_tokens=2048, max_running_requests=8))
    out = eng.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 16, "temperature": 0.0}
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)


def test_gemma2_greedy_parity():
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_gemma2_")
    write_tiny_model_dir(d, cfg=TINY_GEMMA2_CFG)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42, 77, 88]  # > sliding_window/2
    with torch.no_grad():
        ref = hf.generate(torch.tensor([prompt]), max_new_tokens=16, do_sample=False)[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(model_path=d, dtype="float32", max_total_tokens=2048, max_running_requests=8))
    out = eng.generate(input_ids=prompt, sampling_params={"max_new_tokens": 16, "temperature": 0.0})
    assert out["output_ids"] == ref, (out["output_ids"], ref)


def test_gemma2_swa_pool_ring_wraparound():
    """Hybrid SWA memory pool (per-request rings): greedy parity with HF
    through chunked prefill and decode that wrap the ring several times,
    plus the memory-shape claim (windowed layers hold ring-sized KV)."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = dict(TINY_GEMMA2_CFG, sliding_window=8)
    d = tempfile.mkdtemp(prefix="tiny_gemma2_swa_")
    write_tiny_model_dir(d, cfg=cfg)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(3, 500, size=40)]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=24, do_sample=False
        )[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=4, chunked_prefill_size=8,
        prefill_token_buckets=[8], context_buckets=[16, 32, 64, 128],
    ))
    r = eng.model_runner
    assert r.swa_enabled
    ring = r.model.swa_pool["ring"]
    assert ring == 16  # window 8 + chunk bucket 8
    # 1 swa layer; (R+1) request rings + snapshot-arena rings (the arena is
    # clamped to max_running_requests, model_runner.init_memory_pool).
    assert r.k_swa.shape[:2] == (1, (5 + r.swa_snap_count) * ring)
    assert r.k_cache.shape[0] == 1  # 1 global layer keeps full-length KV
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 24, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)
    # Second request in a fresh req row must be unaffected by stale rings.
    out2 = eng.generate(
        input_ids=prompt[:20] + [9, 9],
        sampling_params={"max_new_tokens": 8, "temperature": 0.0},
    )
    with torch.no_grad():
        ref2 = hf.generate(
            torch.tensor([prompt[:20] + [9, 9]]), max_new_tokens=8,
            do_sample=False,
        )[0].tolist()[22:]
    assert out2["output_ids"] == ref2


def test_deepseek_mla_latent_cache_modes():
    """The latent (absorbed-MQA) cache is the default; it must match the
    materialized-MHA mode exactly AND store ~7x smaller KV rows."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_dsv2_mla_")
    write_tiny_model_dir(d, cfg=TINY_DEEPSEEK_V2_CFG)
    prompt = [1, 5, 7, 9, 100, 200, 31]
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}

    lat = Engine(ServerArgs(model_path=d, dtype="float32",
                            max_total_tokens=2048, max_running_requests=8))
    r = lat.model_runner
    assert lat.model_runner.model.latent_cache
    m = lat.model_runner.model
    assert r.k_cache.shape[2] * r.k_cache.shape[3] == m.latent_k_row
    assert r.v_cache.shape[2] * r.v_cache.shape[3] == 128  # dummy V rows
    # At real DeepSeek dims the row shrinks ~7x (tiny-config padding hides
    # it): lora 512 + rope 64 -> 768+128 vs 16 heads x (192 + 128) = 5120.
    assert (768 + 128) * 5 < 16 * (192 + 128)
    out_lat = lat.generate(input_ids=prompt, sampling_params=sp)["output_ids"]

    mha = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
        model_override_args={"mla_latent_cache": False},
    ))
    assert not mha.model_runner.model.latent_cache
    out_mha = mha.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
    assert out_lat == out_mha, (out_lat, out_mha)


def test_llama_classification_parity():
    """Score-head parity vs HF LlamaForSequenceClassification (reference
    models/llama_classification.py path: pooled last token -> score)."""
    import torch
    from transformers import AutoConfig, AutoModelForSequenceClassification

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from tiny_configs import TINY_LLAMA_CFG

    cfg = dict(TINY_LLAMA_CFG)
    cfg["architectures"] = ["LlamaForSequenceClassification"]
    cfg["num_labels"] = 3
    cfg["pad_token_id"] = 0
    d = tempfile.mkdtemp(prefix="tiny_llama_cls_")
    import json, os
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    hf_cfg = AutoConfig.for_model(
        **{k: v for k, v in cfg.items() if k != "architectures"}
    )
    hf_cfg.num_labels = 3
    torch.manual_seed(0)
    hf = AutoModelForSequenceClassification.from_config(hf_cfg).to(
        torch.float32).eval()
    hf.save_pretrained(d, safe_serialization=True)

    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
        ).logits[0].numpy()

    eng = Engine(ServerArgs(model_path=d, dtype="float32",
                            max_total_tokens=2048, max_running_requests=8))
    out = eng.encode(input_ids=prompt)
    got = np.asarray(out["embedding"], dtype=np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_qwen2_reward_model():
    """Qwen2ForRewardModel (MLP score head) loads hand-written weights and
    produces the torch-computed scalar (reference models/qwen2_rm.py)."""
    import json, os
    import torch
    from safetensors.torch import save_file
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from tiny_configs import TINY_QWEN2_CFG, write_tiny_model_dir

    # Base qwen2 trunk weights from HF, plus a hand-rolled score MLP.
    d = tempfile.mkdtemp(prefix="tiny_qwen2_rm_")
    write_tiny_model_dir(d, cfg=TINY_QWEN2_CFG)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    sd = {k: v.clone() for k, v in hf.state_dict().items()
          if not k.startswith("lm_head")}
    torch.manual_seed(7)
    Dm = TINY_QWEN2_CFG["hidden_size"]
    w0 = torch.randn(Dm, Dm) * 0.05
    b0 = torch.randn(Dm) * 0.05
    w2 = torch.randn(1, Dm) * 0.05
    b2 = torch.randn(1) * 0.05
    sd["score.0.weight"], sd["score.0.bias"] = w0, b0
    sd["score.2.weight"], sd["score.2.bias"] = w2, b2
    for f in os.listdir(d):
        if f.endswith(".safetensors"):
            os.remove(os.path.join(d, f))
    save_file({k: v.contiguous() for k, v in sd.items()},
              os.path.join(d, "model.safetensors"))
    cfg = json.load(open(os.path.join(d, "config.json")))
    cfg["architectures"] = ["Qwen2ForRewardModel"]
    json.dump(cfg, open(os.path.join(d, "config.json"), "w"))

    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        h = hf.model(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
        ).last_hidden_state[0, -1]
        ref = (torch.relu(h @ w0.T + b0) @ w2.T + b2).numpy()

    eng = Engine(ServerArgs(model_path=d, dtype="float32",
                            max_total_tokens=2048, max_running_requests=8))
    out = eng.encode(input_ids=prompt)
    got = np.asarray(out["embedding"], dtype=np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


TINY_DEEPSEEK_V3_CFG = {
    **{k: v for k, v in TINY_DEEPSEEK_V2_CFG.items()},
    "architectures": ["DeepseekV3ForCausalLM"],
    "model_type": "deepseek_v3",
    "q_lora_rank": 48,
    # Group-limited noaux_tc routing (HF dsv3 is always sigmoid + top-2-sum
    # group scores + e_score_correction_bias; these keys configure OUR side
    # to match — transformers ignores them).
    "n_group": 4,
    "topk_group": 2,
    "topk_method": "noaux_tc",
    "scoring_func": "sigmoid",
    "norm_topk_prob": True,
    "num_experts_per_tok": 3,
    "routed_scaling_factor": 2.5,
}


def test_deepseek_v3_group_routing_parity():
    """DeepSeek-V3 group-limited routing (n_group>1, formerly a
    NotImplementedError): sigmoid scores, top-2-sum group selection,
    noaux_tc bias, routed scaling — greedy parity vs HF transformers."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_dsv3_")
    write_tiny_model_dir(d, cfg=TINY_DEEPSEEK_V3_CFG)
    # Perturb the correction bias so selection != plain sigmoid top-k.
    import os

    import safetensors.torch as st

    path = os.path.join(d, "model.safetensors")
    sd = st.load_file(path)
    rng = np.random.default_rng(11)
    for k in list(sd):
        if k.endswith("e_score_correction_bias"):
            sd[k] = torch.tensor(
                rng.standard_normal(sd[k].shape).astype(np.float32)
            )
    st.save_file(sd, path)

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12, do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)


TINY_GLM4_MOE_CFG = {
    "architectures": ["Glm4MoeForCausalLM"],
    "model_type": "glm4_moe",
    "hidden_size": 128,
    "intermediate_size": 256,
    "moe_intermediate_size": 64,
    "num_hidden_layers": 3,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "attention_bias": True,
    "use_qk_norm": True,
    "partial_rotary_factor": 0.5,
    "first_k_dense_replace": 1,
    "n_routed_experts": 8,
    "n_shared_experts": 1,
    "num_experts_per_tok": 3,
    "n_group": 2,
    "topk_group": 1,
    "norm_topk_prob": True,
    "routed_scaling_factor": 1.5,
    "torch_dtype": "float32",
}


def test_glm4_moe_greedy_parity():
    """GLM-4.5 MoE family: GQA + qk-norm + partial rotary + sigmoid
    group-limited noaux routing + shared experts, vs HF transformers."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_glm4moe_")
    write_tiny_model_dir(d, cfg=TINY_GLM4_MOE_CFG)
    # Random correction bias so group-limited selection is exercised.
    import os

    import safetensors.torch as st

    path = os.path.join(d, "model.safetensors")
    sd = st.load_file(path)
    rng = np.random.default_rng(13)
    for k in list(sd):
        if k.endswith("e_score_correction_bias"):
            sd[k] = torch.tensor(
                rng.standard_normal(sd[k].shape).astype(np.float32)
            )
    st.save_file(sd, path)

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12, do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)

    # EP mesh invariance: same outputs under tp=4 expert sharding.
    eng4 = Engine(ServerArgs(
        model_path=d, dtype="float32", tp_size=4, max_total_tokens=2048,
        max_running_requests=8,
    ))
    out4 = eng4.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert out4["output_ids"] == ref


def _llama4_cfg(**kw):
    base = {
        "architectures": ["Llama4ForCausalLM"],
        "model_type": "llama4_text",
        "hidden_size": 128,
        "intermediate_size": 64,
        "intermediate_size_mlp": 256,
        "num_hidden_layers": 4,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 32,
        "vocab_size": 512,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "eos_token_id": 2,
        "num_local_experts": 4,
        "num_experts_per_tok": 2,
        "use_qk_norm": True,
        "attn_temperature_tuning": True,
        "floor_scale": 16.0,
        "attn_scale": 0.1,
        "attention_chunk_size": 16,
        "attention_bias": False,
        "torch_dtype": "float32",
    }
    base.update(kw)
    return base


@pytest.mark.parametrize("step", [1, 2])
def test_llama4_greedy_parity(step):
    """Llama-4 text (Scout step=1 all-MoE / Maverick step=2 interleaved):
    interleaved NoPE + chunked attention + L2 qk norm + temperature tuning +
    input-scaled sigmoid routing + shared experts, vs HF transformers. The
    16-token chunk with a 40-token prompt exercises the chunk mask."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix=f"tiny_llama4_s{step}_")
    write_tiny_model_dir(d, cfg=_llama4_cfg(interleave_moe_layer_step=step))

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(3, 500, size=40)]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12, do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, (step, out["output_ids"], ref)


TINY_APERTUS_CFG = {
    "architectures": ["ApertusForCausalLM"],
    "model_type": "apertus",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "attention_bias": False,
    "hidden_act": "xielu",
    "torch_dtype": "float32",
}


def test_apertus_greedy_parity():
    """Apertus: per-head qk RMS norms + learnable xIELU non-gated MLP."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_apertus_")
    write_tiny_model_dir(d, cfg=TINY_APERTUS_CFG)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12, do_sample=False,
        )[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)


TINY_PERSIMMON_CFG = {
    "architectures": ["PersimmonForCausalLM"],
    "model_type": "persimmon",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "layer_norm_eps": 1e-5,
    "rope_theta": 25000.0,
    "partial_rotary_factor": 0.5,
    "qk_layernorm": True,
    "hidden_act": "relu2",
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "hidden_dropout": 0.0,
    "attention_dropout": 0.0,
    "torch_dtype": "float32",
}


def test_persimmon_greedy_parity():
    """Persimmon: per-head-packed fused qkv with per-head qk LayerNorms,
    partial rotary, relu^2 MLP, LN pre-norms."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_persimmon_")
    write_tiny_model_dir(d, cfg=TINY_PERSIMMON_CFG)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12, do_sample=False,
        )[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)


def _simple_parity(cfg, prefix, max_new=12, prompt=None):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix=prefix)
    write_tiny_model_dir(d, cfg=cfg)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = prompt or [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
        )[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": max_new, "temperature": 0.0},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)


def test_hunyuan_dense_greedy_parity():
    """Hunyuan-V1 dense: per-head qk RMS norms AFTER rope."""
    _simple_parity({
        "architectures": ["HunYuanDenseV1ForCausalLM"],
        "model_type": "hunyuan_v1_dense",
        "hidden_size": 128, "intermediate_size": 256, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
        "vocab_size": 512, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "tie_word_embeddings": False, "eos_token_id": 2,
        "attention_bias": False, "torch_dtype": "float32",
    }, "tiny_hunyuan_")


def test_helium_greedy_parity():
    """Helium (kyutai): registry-verified llama body."""
    _simple_parity({
        "architectures": ["HeliumForCausalLM"],
        "model_type": "helium",
        "hidden_size": 128, "intermediate_size": 256, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
        "vocab_size": 512, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "rope_theta": 100000.0,
        "tie_word_embeddings": False, "eos_token_id": 2,
        "attention_bias": True, "mlp_bias": False, "torch_dtype": "float32",
    }, "tiny_helium_")


def test_ernie45_moe_greedy_parity():
    """ERNIE 4.5 MoE: softmax scores + selection-only correction bias +
    shared experts + dense first layer."""
    import os

    import safetensors.torch as st
    import torch

    cfg = {
        "architectures": ["Ernie4_5_MoeForCausalLM"],
        "model_type": "ernie4_5_moe",
        "hidden_size": 128, "intermediate_size": 256,
        "moe_intermediate_size": 64,
        "num_hidden_layers": 3, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 32,
        "vocab_size": 512, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "tie_word_embeddings": True, "eos_token_id": 2,
        "moe_num_experts": 8, "moe_k": 3, "moe_num_shared_experts": 1,
        "moe_layer_start_index": 1, "use_bias": False,
        "torch_dtype": "float32",
    }
    # (Selection-bias steering itself is exercised by the dsv3/glm4_moe
    # perturbed-bias tests; a fresh checkpoint has a zero bias buffer.)
    del os, st, torch
    _simple_parity(cfg, "tiny_ernie_moe_", prompt=[1, 5, 7, 9, 100, 200])


def test_granitemoeshared_greedy_parity():
    """GraniteMoeShared: routed top-k-softmax experts + fused shared MLP."""
    _simple_parity({
        "architectures": ["GraniteMoeSharedForCausalLM"],
        "model_type": "granitemoeshared",
        "hidden_size": 128, "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 512, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "tie_word_embeddings": False, "eos_token_id": 2,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "shared_intermediate_size": 96,
        "embedding_multiplier": 2.0, "attention_multiplier": 0.2,
        "residual_multiplier": 0.5, "logits_scaling": 1.5,
        "torch_dtype": "float32",
    }, "tiny_gmoeshared_")


def test_cohere2_greedy_parity():
    """Cohere2 (Command-R7B): parallel block + interleaved sliding windows
    with NoPE full layers; prompt longer than the window."""
    _simple_parity({
        "architectures": ["Cohere2ForCausalLM"],
        "model_type": "cohere2",
        "hidden_size": 128, "intermediate_size": 256, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 512, "max_position_embeddings": 512,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0,
        "logit_scale": 0.25, "sliding_window": 8,
        "layer_types": ["sliding_attention", "sliding_attention",
                        "sliding_attention", "full_attention"],
        "eos_token_id": 2, "torch_dtype": "float32",
    }, "tiny_cohere2_", prompt=[int(x) for x in
                                np.random.default_rng(9).integers(3, 500, 24)])


def test_gpt_oss_greedy_parity():
    """GPT-OSS: attention sinks + alternating sliding windows + yarn rope +
    interleaved fused gate_up experts with biases and the clamped glu."""
    _simple_parity({
        "architectures": ["GptOssForCausalLM"],
        "model_type": "gpt_oss",
        "hidden_size": 128, "intermediate_size": 64, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
        "vocab_size": 512, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5, "rope_theta": 150000.0,
        "rope_scaling": {"rope_type": "yarn", "factor": 8.0,
                         "beta_fast": 32.0, "beta_slow": 1.0,
                         "original_max_position_embeddings": 64},
        "tie_word_embeddings": False, "eos_token_id": 2,
        "attention_bias": True, "sliding_window": 8,
        "layer_types": ["sliding_attention", "full_attention",
                        "sliding_attention", "full_attention"],
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "torch_dtype": "float32",
    }, "tiny_gptoss_", prompt=[int(x) for x in
                               np.random.default_rng(12).integers(3, 500, 24)])


def test_mllama_text_only_parity():
    """MllamaForCausalLM (Llama-3.2-Vision text path): HF skips the
    cross-attention layers without images, so the checkpoint serves as a
    dense llama with those layers dropped and renumbered
    (models/mllama.py; reference models/mllama.py)."""
    import torch
    from transformers import MllamaForCausalLM as HFMllama
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig,
    )

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = MllamaTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, cross_attention_layers=[1, 3],
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 128},
        tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(13)
    hf = HFMllama(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_mllama_")
    hf.save_pretrained(d, safe_serialization=True)

    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
        )[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(model_path=d, dtype="float32",
                            max_total_tokens=2048, max_running_requests=8))
    assert eng.model_runner.model.config.num_layers == 2
    out = eng.generate(input_ids=prompt,
                       sampling_params={"max_new_tokens": 12,
                                        "temperature": 0.0,
                                        "ignore_eos": True})
    eng.shutdown()
    assert out["output_ids"] == ref


TINY_HUNYUAN_MOE_CFG = {
    "architectures": ["HunYuanMoEV1ForCausalLM"],
    "model_type": "hunyuan_v1_moe",
    "hidden_size": 64,
    "intermediate_size": 96,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 512,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "num_experts": 4,
    "moe_topk": 2,
    "torch_dtype": "float32",
}


def test_hunyuan_moe_greedy_parity():
    """HunYuanMoEV1 (A13B lineage): post-rope qk norms + softmax-topk MoE
    with an ungated always-on shared MLP (models/hunyuan.py)."""
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="tiny_hunyuan_moe_")
    write_tiny_model_dir(d, cfg=TINY_HUNYUAN_MOE_CFG)
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=12, do_sample=False,
        )[0].tolist()[len(prompt):]
    eng = Engine(ServerArgs(model_path=d, dtype="float32",
                            max_total_tokens=2048, max_running_requests=8))
    out = eng.generate(input_ids=prompt,
                       sampling_params={"max_new_tokens": 12,
                                        "temperature": 0.0,
                                        "ignore_eos": True})
    eng.shutdown()
    assert out["output_ids"] == ref
