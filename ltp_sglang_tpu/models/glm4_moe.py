"""GLM-4.5 / GLM-4.5-Air MoE family (Glm4MoeForCausalLM).

Reference: python/sglang/srt/models/glm4_moe.py. Facts verified against HF
transformers modeling_glm4_moe.py:
- GQA attention: q/k/v with bias (attention_bias), o_proj without; optional
  per-head-dim q_norm/k_norm RMS norms (use_qk_norm — "main diff from
  Llama"); partial rotary (partial_rotary_factor, default 0.5) applied
  NEOX-style (rotate_half over the first rotary_dim features).
- DeepSeek-style MoE: first_k_dense_replace dense layers, then
  n_routed_experts with sigmoid scoring, group-limited selection (n_group /
  topk_group, top-2-sum group scores), e_score_correction_bias steering
  selection only (noaux_tc semantics), norm_topk_prob,
  routed_scaling_factor, plus n_shared_experts always-on experts of width
  moe_intermediate_size * n_shared_experts.

Implementation: inherits DeepseekV2ForCausalLM's dense/moe two-scan forward,
batch-level TBO pipeline, and _moe_mlp (group routing included) — only the
attention block, parameters, and checkpoint mapping are GLM's own.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from ltp_sglang_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class Glm4MoeForCausalLM(DeepseekV2ForCausalLM):
    forward_window_token = None
    supports_quant_fusion = False
    supports_pp = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        LlamaForCausalLM.__init__(self, config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.latent_cache = False  # standard GQA rows, not MLA latent
        self.has_bias = bool(hf.get("attention_bias", True))
        self.use_qk_norm = bool(hf.get("use_qk_norm", False))
        self.first_k_dense = hf.get("first_k_dense_replace", 0)
        self.n_routed_experts = hf.get("n_routed_experts", 0)
        self.n_shared_experts = hf.get("n_shared_experts", 0)
        self.top_k = hf.get("num_experts_per_tok", 8)
        self.moe_intermediate = hf.get("moe_intermediate_size", 0)
        self.norm_topk_prob = bool(hf.get("norm_topk_prob", True))
        self.scoring = "sigmoid"
        self.topk_method = "noaux_tc"
        self.routed_scaling_factor = hf.get("routed_scaling_factor", 1.0)
        self.n_group = int(hf.get("n_group", 1) or 1)
        self.topk_group = int(hf.get("topk_group", 1) or 1)
        prf = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(config.head_dim * prf)
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim,
            config.context_len,
            base=self.rope_theta,
            rotary_dim=self.rotary_dim,
            rope_scaling=self.rope_scaling,
        )

    def kv_row_elems(self):
        D = self.config.head_dim
        return self.config.num_kv_heads * D, self.config.num_kv_heads * D

    # ------------------------------------------------------------- parameters
    def _attn_layer_params(self, w, nl):
        cfg = self.config
        Dm = cfg.hidden_size
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        p = {
            "input_layernorm": jnp.ones((nl, Dm), dtype=self.dtype),
            "post_attention_layernorm": jnp.ones((nl, Dm), dtype=self.dtype),
            "q_proj": {"kernel": w(nl, Dm, Hq * D)},
            "k_proj": {"kernel": w(nl, Dm, Hkv * D)},
            "v_proj": {"kernel": w(nl, Dm, Hkv * D)},
            "o_proj": {"kernel": w(nl, Hq * D, Dm)},
        }
        if self.has_bias:
            p["q_proj"]["bias"] = jnp.zeros((nl, Hq * D), dtype=self.dtype)
            p["k_proj"]["bias"] = jnp.zeros((nl, Hkv * D), dtype=self.dtype)
            p["v_proj"]["bias"] = jnp.zeros((nl, Hkv * D), dtype=self.dtype)
        if self.use_qk_norm:
            p["q_norm"] = jnp.ones((nl, D), dtype=self.dtype)
            p["k_norm"] = jnp.ones((nl, D), dtype=self.dtype)
        return p

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (
                jax.random.normal(sub, shape, dtype=jnp.float32) * scale
            ).astype(self.dtype)

        Dm = cfg.hidden_size
        Ld = self.first_k_dense
        Lm = cfg.num_layers - Ld
        I, Im, E = cfg.intermediate_size, self.moe_intermediate, self.n_routed_experts

        dense = self._attn_layer_params(w, Ld)
        dense.update({
            "gate_proj": {"kernel": w(Ld, Dm, I)},
            "up_proj": {"kernel": w(Ld, Dm, I)},
            "down_proj": {"kernel": w(Ld, I, Dm)},
        })
        moe = self._attn_layer_params(w, Lm)
        moe.update({
            "router": {"kernel": w(Lm, Dm, E)},
            "e_score_bias": jnp.zeros((Lm, E), dtype=jnp.float32),
            "experts_gate": w(Lm, E, Dm, Im),
            "experts_up": w(Lm, E, Dm, Im),
            "experts_down": w(Lm, E, Im, Dm),
        })
        if self.n_shared_experts:
            Is = Im * self.n_shared_experts
            moe["shared_gate_proj"] = {"kernel": w(Lm, Dm, Is)}
            moe["shared_up_proj"] = {"kernel": w(Lm, Dm, Is)}
            moe["shared_down_proj"] = {"kernel": w(Lm, Is, Dm)}
        params = {
            "embed": {"weight": w(cfg.vocab_size, Dm)},
            "layers_dense": dense,
            "layers_moe": moe,
            "norm": jnp.ones((Dm,), dtype=self.dtype),
        }
        if not self.tie_word_embeddings:
            params["lm_head"] = {"kernel": w(Dm, cfg.vocab_size)}
        return params

    def param_specs(self) -> Dict[str, Any]:
        def attn_specs():
            p = {
                "input_layernorm": P(None, None),
                "post_attention_layernorm": P(None, None),
                "q_proj": {"kernel": P(None, None, "tp")},
                "k_proj": {"kernel": P(None, None, "tp")},
                "v_proj": {"kernel": P(None, None, "tp")},
                "o_proj": {"kernel": P(None, "tp", None)},
            }
            if self.has_bias:
                p["q_proj"]["bias"] = P(None, "tp")
                p["k_proj"]["bias"] = P(None, "tp")
                p["v_proj"]["bias"] = P(None, "tp")
            if self.use_qk_norm:
                p["q_norm"] = P(None, None)
                p["k_norm"] = P(None, None)
            return p

        dense = attn_specs()
        dense.update({
            "gate_proj": {"kernel": P(None, None, "tp")},
            "up_proj": {"kernel": P(None, None, "tp")},
            "down_proj": {"kernel": P(None, "tp", None)},
        })
        moe = attn_specs()
        moe.update({
            "router": {"kernel": P(None, None, None)},
            "e_score_bias": P(None, None),
            "experts_gate": P(None, "tp", None, None),
            "experts_up": P(None, "tp", None, None),
            "experts_down": P(None, "tp", None, None),
        })
        if self.n_shared_experts:
            moe["shared_gate_proj"] = {"kernel": P(None, None, "tp")}
            moe["shared_up_proj"] = {"kernel": P(None, None, "tp")}
            moe["shared_down_proj"] = {"kernel": P(None, "tp", None)}
        specs = {
            "embed": {"weight": P("tp", None)},
            "layers_dense": dense,
            "layers_moe": moe,
            "norm": P(None),
        }
        if not self.tie_word_embeddings:
            specs["lm_head"] = {"kernel": P(None, "tp")}
        return specs

    # ------------------------------------------------------------ hf weights
    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        Ld = self.first_k_dense
        E = self.n_routed_experts

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def lin(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight")).T

        def vec(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight"))

        def attn_stack(ids):
            p = {
                "input_layernorm": np.stack([vec(i, "input_layernorm") for i in ids]),
                "post_attention_layernorm": np.stack(
                    [vec(i, "post_attention_layernorm") for i in ids]
                ),
                "o_proj": {"kernel": np.stack([lin(i, "self_attn.o_proj") for i in ids])},
            }
            for nm in ("q_proj", "k_proj", "v_proj"):
                p[nm] = {"kernel": np.stack([lin(i, f"self_attn.{nm}") for i in ids])}
                if self.has_bias:
                    p[nm]["bias"] = np.stack(
                        [np.asarray(get(f"model.layers.{i}.self_attn.{nm}.bias"))
                         for i in ids]
                    )
            if self.use_qk_norm:
                p["q_norm"] = np.stack([vec(i, "self_attn.q_norm") for i in ids])
                p["k_norm"] = np.stack([vec(i, "self_attn.k_norm") for i in ids])
            return p

        dense_ids = list(range(Ld))
        moe_ids = list(range(Ld, L))
        dense = attn_stack(dense_ids)
        for nm in ("gate_proj", "up_proj", "down_proj"):
            dense[nm] = {"kernel": np.stack([lin(i, f"mlp.{nm}") for i in dense_ids])}
        moe = attn_stack(moe_ids)
        moe["router"] = {"kernel": np.stack([lin(i, "mlp.gate") for i in moe_ids])}
        moe["e_score_bias"] = np.stack(
            [np.asarray(get(f"model.layers.{i}.mlp.gate.e_score_correction_bias"))
             for i in moe_ids]
        )

        def experts(sub):
            return np.stack([
                np.stack([lin(i, f"mlp.experts.{e}.{sub}") for e in range(E)])
                for i in moe_ids
            ])

        moe["experts_gate"] = experts("gate_proj")
        moe["experts_up"] = experts("up_proj")
        moe["experts_down"] = experts("down_proj")
        if self.n_shared_experts:
            for tgt, src in (
                ("shared_gate_proj", "mlp.shared_experts.gate_proj"),
                ("shared_up_proj", "mlp.shared_experts.up_proj"),
                ("shared_down_proj", "mlp.shared_experts.down_proj"),
            ):
                moe[tgt] = {"kernel": np.stack([lin(i, src) for i in moe_ids])}

        to_dev = lambda t: jax.tree.map(
            lambda a: jnp.asarray(
                a,
                dtype=self.dtype
                if np.asarray(a).dtype in (np.float32, np.float64)
                else None,
            ),
            t,
        )
        params = {
            "embed": {"weight": jnp.asarray(get("model.embed_tokens.weight"), dtype=self.dtype)},
            "layers_dense": to_dev(dense),
            "layers_moe": to_dev(moe),
            "norm": jnp.asarray(get("model.norm.weight"), dtype=self.dtype),
        }
        params["layers_moe"]["e_score_bias"] = jnp.asarray(
            moe["e_score_bias"], dtype=jnp.float32
        )
        if not self.tie_word_embeddings:
            params["lm_head"] = {
                "kernel": jnp.asarray(
                    np.asarray(get("lm_head.weight")).T, dtype=self.dtype
                )
            }
        return params

    # ---------------------------------------------------------------- forward
    def _attention(self, lp, h, step, kc, vc, li):
        cfg = self.config
        B, E = step.input_ids.shape
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        normed = rms_norm(h, lp["input_layernorm"], self.rms_eps)
        q = apply_linear(lp["q_proj"], normed).reshape(B, E, Hq, D)
        k = apply_linear(lp["k_proj"], normed).reshape(B, E, Hkv, D)
        v = apply_linear(lp["v_proj"], normed).reshape(B, E, Hkv, D)
        if self.use_qk_norm:
            q = rms_norm(q, lp["q_norm"], self.rms_eps)
            k = rms_norm(k, lp["k_norm"], self.rms_eps)
        q, k = apply_rope(q, k, step.positions, self.cos_sin_cache)

        k_st, v_st, q_att, vsc = self._kv_quantize(
            lp, kc.dtype, k.reshape(-1, Hkv, D), v.reshape(-1, Hkv, D), q
        )
        kc, vc = self.kv_write(
            kc, vc, li, step.cache_locs.reshape(-1), k_st, v_st,
            jnp.asarray(B * E, jnp.int32),
        )
        Cw = step.kv_indices.shape[1]
        k_pages = kc[li, step.kv_indices].reshape(B, Cw, Hkv, D)
        v_pages = vc[li, step.kv_indices].reshape(B, Cw, Hkv, D)
        if vsc is not None:
            k_pages = k_pages.astype(q.dtype)
            v_pages = v_pages.astype(q.dtype)
        attn = self.attn_impl(
            q_att, k_pages, v_pages, step.kv_indices, step.seq_lens,
            step.prefix_lens, self.sm_scale, sliding_window=0,
        )
        if vsc is not None:
            attn = (attn.astype(jnp.float32) * vsc).astype(h.dtype)
        out = apply_linear(lp["o_proj"], attn.reshape(B, E, Hq * D))
        return h + out, kc, vc


class Ernie4_5_MoeForCausalLM(Glm4MoeForCausalLM):
    """ERNIE 4.5 MoE (Baidu). Verified against HF modeling_ernie4_5_moe.py:
    llama attention (full rotary, optional use_bias), deepseek-style MoE with
    a selection-only correction bias (mlp.moe_statics.e_score_correction_bias)
    over SOFTMAX scores, normalized gathered weights, shared experts, dense
    layers below moe_layer_start_index. Field names are translated onto the
    glm4_moe/deepseek vocabulary and the shared two-scan forward reused."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        hf = config.hf_config
        if hf.get("moe_layer_interval", 1) != 1:
            raise NotImplementedError("ernie moe_layer_interval != 1")
        hf.setdefault("n_routed_experts", hf.get("moe_num_experts", 64))
        hf.setdefault("num_experts_per_tok", hf.get("moe_k", 6))
        hf.setdefault("n_shared_experts", hf.get("moe_num_shared_experts", 0))
        hf.setdefault("first_k_dense_replace", hf.get("moe_layer_start_index", 0))
        hf.setdefault("partial_rotary_factor", 1.0)  # full rotary
        hf.setdefault("use_qk_norm", False)
        hf.setdefault("attention_bias", bool(hf.get("use_bias", False)))
        hf.setdefault("norm_topk_prob", True)
        # The HF Ernie config DEFAULTS tie_word_embeddings to True and omits
        # it from config.json when default-valued.
        hf.setdefault("tie_word_embeddings", True)
        super().__init__(config, attn_impl, kv_write_impl)
        self.scoring = "softmax"  # bias steers selection only (noaux-style)

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.config.num_layers
        for i in range(self.first_k_dense, L):
            src = f"model.layers.{i}.mlp.moe_statics.e_score_correction_bias"
            alias = f"model.layers.{i}.mlp.gate.e_score_correction_bias"
            if src in weights and alias not in weights:
                weights[alias] = np.asarray(weights[src]).reshape(-1)
        return super().convert_hf_weights(weights)
