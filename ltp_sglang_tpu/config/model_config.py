"""Model configuration resolved from a HuggingFace config.

Counterpart of the reference's ModelConfig (python/sglang/srt/configs/
model_config.py:49): wraps the HF config, derives head geometry / context
length / MLA detection / quantization config, and exposes the static facts the
rest of the engine needs. No torch dependency.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class AttentionArch(Enum):
    MHA = auto()  # covers MQA/GQA via num_kv_heads
    MLA = auto()  # multi-head latent attention (DeepSeek-V2/V3)


@dataclass
class ModelConfig:
    model_path: str
    hf_config: Dict[str, Any]
    dtype: str = "bfloat16"
    context_len: int = 4096
    revision: Optional[str] = None
    quantization: Optional[str] = None
    quant_config: Optional[Dict[str, Any]] = None
    kv_cache_dtype: str = "auto"

    # Derived fields
    architectures: list = field(default_factory=list)
    vocab_size: int = 0
    hidden_size: int = 0
    num_layers: int = 0
    num_attention_heads: int = 0
    num_kv_heads: int = 0
    head_dim: int = 0
    intermediate_size: int = 0
    attention_arch: AttentionArch = AttentionArch.MHA
    is_generation: bool = True
    is_multimodal: bool = False
    # MLA geometry (DeepSeek family)
    kv_lora_rank: int = 0
    q_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # Sliding-window attention
    sliding_window: Optional[int] = None
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0

    def __post_init__(self):
        hf = self.hf_config
        self.architectures = hf.get("architectures", []) or []
        # VLM configs (llava family) nest the language model under
        # text_config; merge its fields up so the LM geometry below reads
        # uniformly (reference model_config.py get_hf_text_config).
        if isinstance(hf.get("text_config"), dict):
            self.is_multimodal = True
            merged = dict(hf["text_config"])
            for k, v in hf.items():
                if k not in merged:
                    merged[k] = v
            hf = merged
            self.hf_config = merged
        # Classic-config attribute aliases (gpt2/gptj/bigcode: n_embd/n_head/
        # n_layer/n_inner/n_positions; mpt: d_model/n_heads/n_layers/
        # max_seq_len; opt: ffn_dim; bloom: n_layer/n_head). The reference
        # gets these through HF attribute_map; we read raw config.json.
        _aliases = {
            "n_embd": "hidden_size",
            "d_model": "hidden_size",
            "n_layer": "num_hidden_layers",
            "n_layers": "num_hidden_layers",
            "n_head": "num_attention_heads",
            "n_heads": "num_attention_heads",
            "n_positions": "max_position_embeddings",
            "max_seq_len": "max_position_embeddings",
            "n_inner": "intermediate_size",
            "ffn_dim": "intermediate_size",
            # chatglm (THUDM format) / qwen-v1 field names
            "ffn_hidden_size": "intermediate_size",
            "multi_query_group_num": "num_key_value_heads",
            "kv_channels": "head_dim",
            "padded_vocab_size": "vocab_size",
            "seq_length": "max_position_embeddings",
            "layernorm_epsilon": "rms_norm_eps",
            "rotary_emb_base": "rope_theta",
            # exaone-3 field names
            "layer_norm_epsilon": "rms_norm_eps",
            "activation_function": "hidden_act",
        }
        for src, dst in _aliases.items():
            if hf.get(src) is not None and hf.get(dst) is None:
                hf[dst] = hf[src]
        if any(
            ("Classification" in a or "RewardModel" in a or "EmbeddingModel" in a)
            for a in self.architectures
        ):
            self.is_generation = False
        self.vocab_size = hf.get("vocab_size", 32000)
        self.hidden_size = hf.get("hidden_size", 0)
        self.num_layers = hf.get("num_hidden_layers", hf.get("num_layers", 0))
        self.num_attention_heads = hf.get("num_attention_heads", 0)
        self.num_kv_heads = hf.get("num_key_value_heads", self.num_attention_heads)
        ac = hf.get("attn_config")
        if isinstance(ac, dict) and ac.get("kv_n_heads"):  # dbrx nesting
            self.num_kv_heads = ac["kv_n_heads"]
        if hf.get("multi_query") and not hf.get("new_decoder_architecture"):
            # falcon-7b / gpt_bigcode MQA: one shared KV head (falcon
            # serializes num_kv_heads == num_heads but only reads it in the
            # new_decoder_architecture path).
            self.num_kv_heads = 1
        self.head_dim = hf.get("head_dim") or (
            self.hidden_size // max(self.num_attention_heads, 1)
        )
        self.intermediate_size = hf.get("intermediate_size") or 0
        if not self.intermediate_size:
            # gpt2 (n_inner None), bloom, falcon: 4·hidden; mpt: expansion_ratio
            self.intermediate_size = int(
                self.hidden_size * hf.get("expansion_ratio", 4)
            )
        self.sliding_window = hf.get("sliding_window")
        if hf.get("use_sliding_window") is False:  # qwen2-style gate
            self.sliding_window = None

        # MLA detection mirrors model_config.py: kv_lora_rank presence.
        if hf.get("kv_lora_rank"):
            self.attention_arch = AttentionArch.MLA
            self.kv_lora_rank = hf["kv_lora_rank"]
            self.q_lora_rank = hf.get("q_lora_rank") or 0
            self.qk_nope_head_dim = hf.get("qk_nope_head_dim", 0)
            self.qk_rope_head_dim = hf.get("qk_rope_head_dim", 0)
            self.v_head_dim = hf.get("v_head_dim", self.head_dim)

        self.num_experts = hf.get("n_routed_experts") or hf.get("num_experts") or hf.get(
            "num_local_experts"
        ) or 0
        self.num_experts_per_tok = hf.get("num_experts_per_tok", 0)

        ctx = hf.get("max_position_embeddings") or hf.get("max_sequence_length") or 4096
        if self.context_len is None or self.context_len <= 0:
            self.context_len = ctx
        else:
            self.context_len = min(self.context_len, ctx) if ctx else self.context_len

    # ------------------------------------------------------------------
    @classmethod
    def from_server_args(cls, server_args) -> "ModelConfig":
        return cls.from_model_path(
            server_args.model_path,
            dtype=server_args.dtype,
            context_length=server_args.context_length,
            quantization=server_args.quantization,
            kv_cache_dtype=server_args.kv_cache_dtype,
            model_override_args=server_args.model_override_args,
        )

    @classmethod
    def from_model_path(
        cls,
        model_path: str,
        dtype: str = "bfloat16",
        context_length: Optional[int] = None,
        quantization: Optional[str] = None,
        kv_cache_dtype: str = "auto",
        model_override_args: Optional[dict] = None,
    ) -> "ModelConfig":
        config_file = os.path.join(model_path, "config.json")
        with open(config_file) as f:
            hf = json.load(f)
        if model_override_args:
            hf.update(model_override_args)
        quant_config = hf.get("quantization_config")
        if quant_config and quantization is None:
            quantization = quant_config.get("quant_method")
        return cls(
            model_path=model_path,
            hf_config=hf,
            dtype=dtype,
            context_len=context_length or 0,
            quantization=quantization,
            quant_config=quant_config,
            kv_cache_dtype=kv_cache_dtype,
        )

    @classmethod
    def from_hf_config(cls, hf_config: Dict[str, Any], model_path: str = "", **kw) -> "ModelConfig":
        return cls(model_path=model_path, hf_config=dict(hf_config), **kw)

    # Per-token KV cache bytes (for pool sizing).
    def kv_cache_bytes_per_token(self) -> int:
        from ltp_sglang_tpu.utils.dtypes import dtype_bytes

        kv_dtype = self.kv_cache_dtype if self.kv_cache_dtype != "auto" else self.dtype
        if self.attention_arch == AttentionArch.MLA:
            per_layer = self.kv_lora_rank + self.qk_rope_head_dim
        else:
            per_layer = 2 * self.num_kv_heads * self.head_dim
        return self.num_layers * per_layer * dtype_bytes(kv_dtype)
