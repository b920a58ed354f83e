"""Sequence-classification and reward heads served through the embedding
path (pool last token, then apply the score head).

Reference: python/sglang/srt/models/{llama_classification,
qwen2_classification, qwen2_rm, gemma2_reward, internlm2_reward}.py — all
reuse the causal trunk and return EmbeddingPoolerOutput(scores); here the
score head is applied after pooling inside the jitted embed step
(model_runner._build_embed_fn), which is equivalent for last-token pooling
since the head is per-position linear.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.models.gemma2 import Gemma2ForCausalLM
from ltp_sglang_tpu.models.internlm2 import InternLM2ForCausalLM
from ltp_sglang_tpu.models.llama import LlamaForCausalLM
from ltp_sglang_tpu.models.qwen2 import Qwen2ForCausalLM


class _ScoreHeadMixin:
    """Adds params["score"] = {"kernel": [Dm, num_labels]} (HF
    score.weight) and drops the lm_head (tied so the base never looks for
    lm_head.weight in the checkpoint)."""

    is_classification = True

    def _setup_head(self):
        self.num_labels = self.config.hf_config.get("num_labels", 2)
        self.tie_word_embeddings = True

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        params.pop("lm_head", None)
        Dm = self.config.hidden_size
        params["score"] = {
            "kernel": jnp.zeros((Dm, self.num_labels), dtype=jnp.float32)
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs.pop("lm_head", None)
        specs["score"] = {"kernel": P(None, None)}
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        params.pop("lm_head", None)
        params["score"] = {
            "kernel": jnp.asarray(
                np.asarray(weights["score.weight"]).T, jnp.float32
            )
        }
        return params


class LlamaForSequenceClassification(_ScoreHeadMixin, LlamaForCausalLM):
    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self._setup_head()


class Qwen2ForSequenceClassification(_ScoreHeadMixin, Qwen2ForCausalLM):
    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self._setup_head()


class Gemma2ForSequenceClassification(_ScoreHeadMixin, Gemma2ForCausalLM):
    """Reference models/gemma2_reward.py: gemma-2 trunk, last-token pool,
    bias-free score head (num_labels)."""

    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self._setup_head()


class InternLM2ForRewardModel(_ScoreHeadMixin, InternLM2ForCausalLM):
    """Reference models/internlm2_reward.py: internlm2 trunk with a
    bias-free `v_head` [Dm, 1] over the last hidden state."""

    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self._setup_head()
        self.num_labels = 1

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        weights = dict(weights)
        if "v_head.weight" in weights:
            weights["score.weight"] = weights.pop("v_head.weight")
        return super().convert_hf_weights(weights)


class Qwen2ForRewardModel(Qwen2ForCausalLM):
    """Qwen2.5-Math-RM style: score = Linear(D, D) -> ReLU -> Linear(D, 1)
    over the last hidden state (reference models/qwen2_rm.py)."""

    is_classification = True

    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.num_labels = 1
        self.tie_word_embeddings = True

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        params.pop("lm_head", None)
        Dm = self.config.hidden_size
        params["score"] = {
            "w0": jnp.zeros((Dm, Dm), jnp.float32),
            "b0": jnp.zeros((Dm,), jnp.float32),
            "w2": jnp.zeros((Dm, 1), jnp.float32),
            "b2": jnp.zeros((1,), jnp.float32),
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs.pop("lm_head", None)
        specs["score"] = {
            "w0": P(None, None), "b0": P(None),
            "w2": P(None, None), "b2": P(None),
        }
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        params.pop("lm_head", None)
        params["score"] = {
            "w0": jnp.asarray(np.asarray(weights["score.0.weight"]).T, jnp.float32),
            "b0": jnp.asarray(np.asarray(weights["score.0.bias"]), jnp.float32),
            "w2": jnp.asarray(np.asarray(weights["score.2.weight"]).T, jnp.float32),
            "b2": jnp.asarray(np.asarray(weights["score.2.bias"]), jnp.float32),
        }
        return params
