"""StarCoder2: llama-family with LayerNorm (weight+bias), biased linears,
a gate-less gelu MLP (c_fc -> gelu_tanh -> c_proj), and always-on sliding
window attention. Reference: python/sglang/srt/models/starcoder2.py."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x.dtype)


class Starcoder2ForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False
    has_bias = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("norm_epsilon", 1e-5)
        self.tie_word_embeddings = hf.get("tie_word_embeddings", True)
        self.sliding_window = hf.get("sliding_window") or 0

    # LayerNorm weights arrive as {"w", "b"} dicts; rms-style leaves would
    # be bare arrays (the base norm() contract).
    def norm(self, x, w):
        return _layer_norm(x, w["w"], w["b"], self.norm_eps)

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["c_fc"], normed)
        return apply_linear(lp["c_proj"], jax.nn.gelu(h, approximate=True))

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        L, Dm, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (jax.random.normal(sub, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        def ln(n):
            return {"w": jnp.ones((n, Dm), self.dtype),
                    "b": jnp.zeros((n, Dm), self.dtype)}

        def lin(K, N):
            return {"kernel": w(L, K, N), "bias": jnp.zeros((L, N), self.dtype)}

        layers = {
            "input_layernorm": ln(L),
            "post_attention_layernorm": ln(L),
            "q_proj": lin(Dm, Hq * D),
            "k_proj": lin(Dm, Hkv * D),
            "v_proj": lin(Dm, Hkv * D),
            "o_proj": lin(Hq * D, Dm),
            "c_fc": lin(Dm, I),
            "c_proj": lin(I, Dm),
        }
        params = {
            "embed": {"weight": w(cfg.vocab_size, Dm)},
            "layers": layers,
            "norm": {"w": jnp.ones((Dm,), self.dtype),
                     "b": jnp.zeros((Dm,), self.dtype)},
        }
        if not self.tie_word_embeddings:
            params["lm_head"] = {"kernel": w(Dm, cfg.vocab_size)}
        return params

    def param_specs(self) -> Dict[str, Any]:
        def lin_col():
            return {"kernel": P(None, None, "tp"), "bias": P(None, "tp")}

        def lin_row():
            return {"kernel": P(None, "tp", None), "bias": P(None, None)}

        def ln():
            return {"w": P(None, None), "b": P(None, None)}

        specs = {
            "embed": {"weight": P("tp", None)},
            "layers": {
                "input_layernorm": ln(),
                "post_attention_layernorm": ln(),
                "q_proj": lin_col(),
                "k_proj": lin_col(),
                "v_proj": lin_col(),
                "o_proj": lin_row(),
                "c_fc": lin_col(),
                "c_proj": lin_row(),
            },
            "norm": {"w": P(None), "b": P(None)},
        }
        if not self.tie_word_embeddings:
            specs["lm_head"] = {"kernel": P(None, "tp")}
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def lin(sub):
            return {
                "kernel": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.weight")).T
                     for i in range(L)]), self.dtype),
                "bias": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.bias"))
                     for i in range(L)]), self.dtype),
            }

        def ln(sub):
            return {
                "w": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.weight"))
                     for i in range(L)]), self.dtype),
                "b": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.bias"))
                     for i in range(L)]), self.dtype),
            }

        params = {
            "embed": {"weight": jnp.asarray(
                np.asarray(get("model.embed_tokens.weight")), self.dtype)},
            "layers": {
                "input_layernorm": ln("input_layernorm"),
                "post_attention_layernorm": ln("post_attention_layernorm"),
                "q_proj": lin("self_attn.q_proj"),
                "k_proj": lin("self_attn.k_proj"),
                "v_proj": lin("self_attn.v_proj"),
                "o_proj": lin("self_attn.o_proj"),
                "c_fc": lin("mlp.c_fc"),
                "c_proj": lin("mlp.c_proj"),
            },
            "norm": {
                "w": jnp.asarray(np.asarray(get("model.norm.weight")), self.dtype),
                "b": jnp.asarray(np.asarray(get("model.norm.bias")), self.dtype),
            },
        }
        if not self.tie_word_embeddings:
            params["lm_head"] = {"kernel": jnp.asarray(
                np.asarray(get("lm_head.weight")).T, self.dtype)}
        return params
