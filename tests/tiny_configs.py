"""Tiny model configs for tests (no network; random weights)."""

TINY_LLAMA_CFG = {
    "architectures": ["LlamaForCausalLM"],
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
    "bos_token_id": 1,
    "model_type": "llama",
    "torch_dtype": "float32",
}


TINY_QWEN2_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["Qwen2ForCausalLM"],
    "model_type": "qwen2",
}

TINY_QWEN3_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["Qwen3ForCausalLM"],
    "model_type": "qwen3",
}

TINY_MISTRAL_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["MistralForCausalLM"],
    "model_type": "mistral",
    "sliding_window": 16,
}

TINY_OLMO_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items() if k != "rms_norm_eps"},
    "architectures": ["OlmoForCausalLM"],
    "model_type": "olmo",
    "clip_qkv": 8.0,
}

TINY_OLMO2_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["Olmo2ForCausalLM"],
    "model_type": "olmo2",
}

TINY_GRANITE_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["GraniteForCausalLM"],
    "model_type": "granite",
    "embedding_multiplier": 12.0,
    "attention_multiplier": 0.0078125,
    "residual_multiplier": 0.22,
    "logits_scaling": 16.0,
    "tie_word_embeddings": True,
}

TINY_COHERE_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items() if k != "rms_norm_eps"},
    "architectures": ["CohereForCausalLM"],
    "model_type": "cohere",
    "layer_norm_eps": 1e-5,
    "logit_scale": 0.0625,
    "tie_word_embeddings": True,
    "use_qk_norm": False,
}

TINY_GLM_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["GlmForCausalLM"],
    "model_type": "glm",
    "partial_rotary_factor": 0.5,
    "attention_bias": True,
    "pad_token_id": 2,  # glm defaults to 151329, beyond the tiny vocab
}

TINY_GLM4_CFG = {
    **{k: v for k, v in TINY_GLM_CFG.items()},
    "architectures": ["Glm4ForCausalLM"],
    "model_type": "glm4",
}

TINY_SMOLLM3_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["SmolLM3ForCausalLM"],
    "model_type": "smollm3",
    "num_hidden_layers": 4,
    "no_rope_layer_interval": 2,
    "tie_word_embeddings": True,
    "pad_token_id": 2,  # smollm3 defaults to 128004, beyond the tiny vocab
}

TINY_EXAONE4_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["Exaone4ForCausalLM"],
    "model_type": "exaone4",
    "num_hidden_layers": 4,
    "sliding_window": 16,
    "sliding_window_pattern": 4,  # LLLG: layers 0-2 sliding, 3 global NoPE
    "layer_types": ["sliding_attention"] * 3 + ["full_attention"],
}

TINY_OLMO3_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["Olmo3ForCausalLM"],
    "model_type": "olmo3",
    "num_hidden_layers": 4,
    "sliding_window": 16,
    "layer_types": ["sliding_attention"] * 3 + ["full_attention"],
    # Exercises the DUAL rope path: full layers scale, sliding layers don't.
    "rope_scaling": {"rope_type": "linear", "factor": 2.0},
}

TINY_SEED_OSS_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["SeedOssForCausalLM"],
    "model_type": "seed_oss",
    "attention_bias": True,
    "attention_out_bias": False,
    "head_dim": 32,
}

TINY_ERNIE45_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["Ernie4_5ForCausalLM"],
    "model_type": "ernie4_5",
    "use_bias": False,
    "head_dim": 32,
    "pad_token_id": 0,
}

TINY_NEMOTRON_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items() if k != "rms_norm_eps"},
    "architectures": ["NemotronForCausalLM"],
    "model_type": "nemotron",
    "norm_eps": 1e-5,
    "hidden_act": "relu2",
    "partial_rotary_factor": 0.5,
}

TINY_STABLELM_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items() if k != "rms_norm_eps"},
    "architectures": ["StableLmForCausalLM"],
    "model_type": "stablelm",
    "layer_norm_eps": 1e-5,
    "partial_rotary_factor": 0.25,
    "use_qkv_bias": True,
}


TINY_GPT2_CFG = {
    "architectures": ["GPT2LMHeadModel"],
    "model_type": "gpt2",
    "vocab_size": 512,
    "n_positions": 512,
    "n_embd": 128,
    "n_layer": 2,
    "n_head": 4,
    "n_inner": 256,
    "activation_function": "gelu_new",
    "layer_norm_epsilon": 1e-5,
    "eos_token_id": 2,
    "bos_token_id": 1,
    "torch_dtype": "float32",
}

TINY_GPTJ_CFG = {
    "architectures": ["GPTJForCausalLM"],
    "model_type": "gptj",
    "vocab_size": 512,
    "n_positions": 512,
    "n_embd": 128,
    "n_layer": 2,
    "n_head": 4,
    "rotary_dim": 16,
    "n_inner": 256,
    "activation_function": "gelu_new",
    "layer_norm_epsilon": 1e-5,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "bos_token_id": 1,
    "torch_dtype": "float32",
}

TINY_GPT_NEOX_CFG = {
    "architectures": ["GPTNeoXForCausalLM"],
    "model_type": "gpt_neox",
    "vocab_size": 512,
    "hidden_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "intermediate_size": 256,
    "rotary_pct": 0.25,
    "rotary_emb_base": 10000,
    "use_parallel_residual": True,
    "layer_norm_eps": 1e-5,
    "max_position_embeddings": 512,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "bos_token_id": 1,
    "torch_dtype": "float32",
}

TINY_OPT_CFG = {
    "architectures": ["OPTForCausalLM"],
    "model_type": "opt",
    "vocab_size": 512,
    "hidden_size": 128,
    "num_hidden_layers": 2,
    "ffn_dim": 256,
    "num_attention_heads": 4,
    "max_position_embeddings": 512,
    "word_embed_proj_dim": 128,
    "do_layer_norm_before": True,
    "activation_function": "relu",
    "eos_token_id": 2,
    "bos_token_id": 1,
    "pad_token_id": 2,
    "torch_dtype": "float32",
}

TINY_PHI_CFG = {
    "architectures": ["PhiForCausalLM"],
    "model_type": "phi",
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "partial_rotary_factor": 0.5,
    "layer_norm_eps": 1e-5,
    "max_position_embeddings": 512,
    "rope_theta": 10000.0,
    "hidden_act": "gelu_new",
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "bos_token_id": 1,
    "torch_dtype": "float32",
}

TINY_BLOOM_CFG = {
    "architectures": ["BloomForCausalLM"],
    "model_type": "bloom",
    "vocab_size": 512,
    "hidden_size": 128,
    "n_layer": 2,
    "n_head": 4,
    "layer_norm_epsilon": 1e-5,
    "eos_token_id": 2,
    "bos_token_id": 1,
    "pad_token_id": 3,
    "torch_dtype": "float32",
}

TINY_FALCON_CFG = {
    "architectures": ["FalconForCausalLM"],
    "model_type": "falcon",
    "vocab_size": 512,
    "hidden_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "multi_query": True,
    "parallel_attn": True,
    "bias": False,
    "new_decoder_architecture": False,
    "alibi": False,
    "rope_theta": 10000.0,
    "max_position_embeddings": 512,
    "layer_norm_epsilon": 1e-5,
    "eos_token_id": 2,
    "bos_token_id": 1,
    "torch_dtype": "float32",
}

TINY_GPT_BIGCODE_CFG = {
    "architectures": ["GPTBigCodeForCausalLM"],
    "model_type": "gpt_bigcode",
    "vocab_size": 512,
    "n_positions": 512,
    "n_embd": 128,
    "n_layer": 2,
    "n_head": 4,
    "n_inner": 256,
    "multi_query": True,
    "activation_function": "gelu_pytorch_tanh",
    "layer_norm_epsilon": 1e-5,
    "eos_token_id": 2,
    "bos_token_id": 1,
    "torch_dtype": "float32",
}

TINY_MPT_CFG = {
    "architectures": ["MptForCausalLM"],
    "model_type": "mpt",
    "vocab_size": 512,
    "d_model": 128,
    "n_heads": 4,
    "n_layers": 2,
    "expansion_ratio": 2,
    "max_seq_len": 512,
    "no_bias": True,
    "attn_config": {"alibi": True, "alibi_bias_max": 8},
    "eos_token_id": 2,
    "bos_token_id": 1,
    "torch_dtype": "float32",
}


def write_tiny_tokenizer(tmpdir, vocab_size=512):
    """Build a from-scratch BPE tokenizer (no network) covering ASCII +
    digits; eos=</s> id matches TINY_LLAMA_CFG's eos_token_id=2."""
    import json as _json
    import os

    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    corpus = [
        "the quick brown fox jumps over the lazy dog 0123456789",
        '{"a": 1, "b": "text", "c": [true, false, null], "name": "alice"}',
        "hello world foo bar baz 100 200 42-77 3.14 -5 999-12",
        "abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        ":,.[]{}()\"'-_!?/\\",
    ] * 50
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    # Byte-level pipeline => decode() is an exact inverse (no space joining).
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus, trainer)
    os.makedirs(tmpdir, exist_ok=True)
    tok.save(os.path.join(tmpdir, "tokenizer.json"))
    with open(os.path.join(tmpdir, "tokenizer_config.json"), "w") as f:
        _json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "unk_token": "<unk>",
                "bos_token": "<s>",
                "eos_token": "</s>",
            },
            f,
        )
    return tmpdir


def write_tiny_model_dir(tmpdir, cfg=None, seed=0, with_weights=True):
    """Create a model dir with config.json (+ random safetensors weights
    generated by HF transformers for parity testing)."""
    import json
    import os

    cfg = dict(cfg or TINY_LLAMA_CFG)
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    if with_weights:
        import torch
        from transformers import AutoConfig, AutoModelForCausalLM

        hf_cfg = AutoConfig.for_model(**{k: v for k, v in cfg.items() if k != "architectures"})
        torch.manual_seed(seed)
        model = AutoModelForCausalLM.from_config(hf_cfg)
        model = model.to(torch.float32).eval()
        model.save_pretrained(tmpdir, safe_serialization=True)
    return tmpdir


def write_tiny_tokenizer(tmpdir):
    """Write a char-level tokenizer (tokenizer.json + config) loadable by
    AutoTokenizer — lets text-prompt surfaces (evals, chat) run against tiny
    models with ids < any tiny vocab_size."""
    import json
    import os
    import string

    from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for ch in string.printable:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split(Regex("."), behavior="isolated")
    tok.decoder = decoders.Fuse()
    tok.save(os.path.join(tmpdir, "tokenizer.json"))
    with open(os.path.join(tmpdir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "bos_token": "<s>",
                "eos_token": "</s>",
                "unk_token": "<unk>",
            },
            f,
        )
    return tmpdir


def write_tiny_eagle_dir(tmpdir, cfg=None, seed=1):
    """Create an EAGLE draft-head dir: llama-like config.json + safetensors
    with fc.weight and layers.0.* (HF [out, in] orientation)."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    cfg = dict(cfg or TINY_LLAMA_CFG)
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)
    D = cfg["hidden_size"]
    I = cfg["intermediate_size"]
    Hq = cfg["num_attention_heads"]
    Hkv = cfg["num_key_value_heads"]
    hd = cfg.get("head_dim", D // Hq)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    tensors = {
        "fc.weight": w(D, 2 * D),
        "layers.0.self_attn.q_proj.weight": w(Hq * hd, D),
        "layers.0.self_attn.k_proj.weight": w(Hkv * hd, D),
        "layers.0.self_attn.v_proj.weight": w(Hkv * hd, D),
        "layers.0.self_attn.o_proj.weight": w(D, Hq * hd),
        "layers.0.mlp.gate_proj.weight": w(I, D),
        "layers.0.mlp.up_proj.weight": w(I, D),
        "layers.0.mlp.down_proj.weight": w(D, I),
        "layers.0.input_layernorm.weight": np.ones((D,), np.float32),
        "layers.0.hidden_norm.weight": np.ones((D,), np.float32),
        "layers.0.post_attention_layernorm.weight": np.ones((D,), np.float32),
    }
    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))
    return tmpdir


def write_tiny_eagle3_dir(tmpdir, cfg=None, seed=2, draft_vocab=256):
    """EAGLE3 draft-head dir: fc [D, 3D], midlayer.* with 2D-input qkv, own
    embed/norm/lm_head over a reduced draft vocab + d2t offsets (HF
    EAGLE3-* checkpoint layout)."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    cfg = dict(cfg or TINY_LLAMA_CFG)
    cfg["draft_vocab_size"] = draft_vocab
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)
    D = cfg["hidden_size"]
    I = cfg["intermediate_size"]
    Hq = cfg["num_attention_heads"]
    Hkv = cfg["num_key_value_heads"]
    hd = cfg.get("head_dim", D // Hq)
    Vt = cfg["vocab_size"]

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    # Non-trivial draft->target map: target_id = idx + d2t[idx].
    idx = np.arange(draft_vocab, dtype=np.int64)
    target_ids = (idx * 2 + 1) % Vt
    tensors = {
        "embed_tokens.weight": w(Vt, D),
        "fc.weight": w(D, 3 * D),
        "midlayer.self_attn.q_proj.weight": w(Hq * hd, 2 * D),
        "midlayer.self_attn.k_proj.weight": w(Hkv * hd, 2 * D),
        "midlayer.self_attn.v_proj.weight": w(Hkv * hd, 2 * D),
        "midlayer.self_attn.o_proj.weight": w(D, Hq * hd),
        "midlayer.mlp.gate_proj.weight": w(I, D),
        "midlayer.mlp.up_proj.weight": w(I, D),
        "midlayer.mlp.down_proj.weight": w(D, I),
        "midlayer.input_layernorm.weight": np.ones((D,), np.float32),
        "midlayer.hidden_norm.weight": np.ones((D,), np.float32),
        "midlayer.post_attention_layernorm.weight": np.ones((D,), np.float32),
        "norm.weight": np.ones((D,), np.float32),
        "lm_head.weight": w(draft_vocab, D),
        "d2t": (target_ids - idx).astype(np.int64),
    }
    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))
    return tmpdir


def write_tiny_nextn_dir(tmpdir, cfg, seed=3):
    """DeepSeek NEXTN (MTP) draft dir: model.layers.<L>.* holds ONE full
    deepseek decoder layer (MLA + MoE) plus model.{embed_tokens, enorm,
    hnorm, eh_proj} and model.shared_head.{norm, head} (reference
    deepseek_nextn.py checkpoint layout; L = target num_hidden_layers)."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    cfg = dict(cfg)
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)
    D = cfg["hidden_size"]
    V = cfg["vocab_size"]
    H = cfg["num_attention_heads"]
    R = cfg["kv_lora_rank"]
    nope, rope = cfg["qk_nope_head_dim"], cfg["qk_rope_head_dim"]
    vh = cfg["v_head_dim"]
    Im = cfg["moe_intermediate_size"]
    E = cfg["n_routed_experts"]
    Is = Im * cfg.get("n_shared_experts", 0)
    L = cfg["num_hidden_layers"]  # MTP layer index in the checkpoint

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    pre = f"model.layers.{L}"
    tensors = {
        "model.embed_tokens.weight": w(V, D),
        "model.enorm.weight": np.ones((D,), np.float32),
        "model.hnorm.weight": np.ones((D,), np.float32),
        "model.eh_proj.weight": w(D, 2 * D),
        f"{pre}.input_layernorm.weight": np.ones((D,), np.float32),
        f"{pre}.post_attention_layernorm.weight": np.ones((D,), np.float32),
        f"{pre}.self_attn.q_proj.weight": w(H * (nope + rope), D),
        f"{pre}.self_attn.kv_a_proj_with_mqa.weight": w(R + rope, D),
        f"{pre}.self_attn.kv_a_layernorm.weight": np.ones((R,), np.float32),
        f"{pre}.self_attn.kv_b_proj.weight": w(H * (nope + vh), R),
        f"{pre}.self_attn.o_proj.weight": w(D, H * vh),
        f"{pre}.mlp.gate.weight": w(E, D),
        "model.shared_head.norm.weight": np.ones((D,), np.float32),
        "model.shared_head.head.weight": w(V, D),
    }
    for e in range(E):
        tensors[f"{pre}.mlp.experts.{e}.gate_proj.weight"] = w(Im, D)
        tensors[f"{pre}.mlp.experts.{e}.up_proj.weight"] = w(Im, D)
        tensors[f"{pre}.mlp.experts.{e}.down_proj.weight"] = w(D, Im)
    if Is:
        tensors[f"{pre}.mlp.shared_experts.gate_proj.weight"] = w(Is, D)
        tensors[f"{pre}.mlp.shared_experts.up_proj.weight"] = w(Is, D)
        tensors[f"{pre}.mlp.shared_experts.down_proj.weight"] = w(D, Is)
    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))
    return tmpdir
