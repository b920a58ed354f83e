"""Llama-4 text family (Scout/Maverick — Llama4ForCausalLM).

Reference: python/sglang/srt/models/llama4.py. Facts verified against HF
transformers modeling_llama4.py:
- GQA attention; INTERLEAVED-pair rope (complex multiply = gptj style) on
  rope layers; every `no_rope_layers[i]==0` layer is NoPE + full attention
  while rope layers use CHUNKED attention (attention_chunk_size): queries
  attend only within their position chunk.
- use_qk_norm: UNWEIGHTED L2 norm on q/k after rope (rope layers only).
- attn_temperature_tuning: NoPE-layer queries scale by
  1 + attn_scale * log1p(floor((pos+1)/floor_scale)).
- MoE: router takes top-k of the RAW logits, weights = sigmoid(top values)
  applied to the expert INPUT (scale_input — the expert is nonlinear, so
  input and output scaling differ); fused gate_up expert stacks; an
  always-on shared expert of intermediate_size. Dense layers (Maverick's
  interleave_moe_layer_step=2) use intermediate_size_mlp.

Interleaved dense/moe runs as a fori_loop with a lax.cond per layer over
two stacks; the all-MoE case (Scout, step=1) scans the moe stack directly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.moe import moe_ffn_auto
from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.layers.rotary import apply_rope
from ltp_sglang_tpu.models.llama import LlamaForCausalLM, StepArrays


def _l2norm(x, eps):
    return (
        x.astype(jnp.float32)
        * jax.lax.rsqrt(
            jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
            + eps
        )
    ).astype(x.dtype)


class Llama4ForCausalLM(LlamaForCausalLM):
    forward_window_token = None  # per-layer rope/chunk switches: generic path
    forward_window_token_paged = None
    supports_quant_fusion = False
    supports_pp = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        L = config.num_layers
        self.rope_style = "gptj"  # complex-multiply interleaved pairs
        self.n_experts = hf.get("num_local_experts", 16)
        self.top_k = hf.get("num_experts_per_tok", 1)
        self.moe_layers = list(hf.get("moe_layers")
                               or range(0, L, hf.get("interleave_moe_layer_step", 1) or 1))
        # HF: moe_layers = [step-1, 2*step-1, ...] when built from the step.
        if hf.get("moe_layers") is None:
            step = hf.get("interleave_moe_layer_step", 1) or 1
            self.moe_layers = [i for i in range(L) if (i + 1) % step == 0]
        self.intermediate_mlp = hf.get("intermediate_size_mlp",
                                       hf.get("intermediate_size"))
        self.use_qk_norm = bool(hf.get("use_qk_norm", False))
        self.temp_tuning = bool(hf.get("attn_temperature_tuning", False))
        self.floor_scale = float(hf.get("floor_scale", 8192))
        self.attn_scale = float(hf.get("attn_scale", 0.1))
        self.chunk_size = int(hf.get("attention_chunk_size") or 0)
        nrl = hf.get("no_rope_layers") or [1] * L
        self.rope_on_layers = jnp.asarray(np.asarray(nrl, np.int32) != 0)
        lt = hf.get("layer_types") or [
            "chunked_attention" if nrl[i] else "full_attention" for i in range(L)
        ]
        self.chunk_on_layers = jnp.asarray(
            np.asarray([t == "chunked_attention" for t in lt])
        )
        self.has_bias = bool(hf.get("attention_bias", False))

    # ------------------------------------------------------------- parameters
    def _attn_params(self, w, nl):
        cfg = self.config
        Dm = cfg.hidden_size
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        return {
            "input_layernorm": jnp.ones((nl, Dm), dtype=self.dtype),
            "post_attention_layernorm": jnp.ones((nl, Dm), dtype=self.dtype),
            "q_proj": {"kernel": w(nl, Dm, Hq * D)},
            "k_proj": {"kernel": w(nl, Dm, Hkv * D)},
            "v_proj": {"kernel": w(nl, Dm, Hkv * D)},
            "o_proj": {"kernel": w(nl, Hq * D, Dm)},
        }

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (
                jax.random.normal(sub, shape, dtype=jnp.float32) * scale
            ).astype(self.dtype)

        Dm = cfg.hidden_size
        L = cfg.num_layers
        Lm = len(self.moe_layers)
        Ld = L - Lm
        E, I = self.n_experts, cfg.intermediate_size
        moe = self._attn_params(w, Lm)
        moe.update({
            "router": {"kernel": w(Lm, Dm, E)},
            "experts_gate": w(Lm, E, Dm, I),
            "experts_up": w(Lm, E, Dm, I),
            "experts_down": w(Lm, E, I, Dm),
            "shared_gate_proj": {"kernel": w(Lm, Dm, I)},
            "shared_up_proj": {"kernel": w(Lm, Dm, I)},
            "shared_down_proj": {"kernel": w(Lm, I, Dm)},
        })
        params = {
            "embed": {"weight": w(cfg.vocab_size, Dm)},
            "layers_moe": moe,
            "norm": jnp.ones((Dm,), dtype=self.dtype),
        }
        if Ld:
            dense = self._attn_params(w, Ld)
            Imlp = self.intermediate_mlp
            dense.update({
                "gate_proj": {"kernel": w(Ld, Dm, Imlp)},
                "up_proj": {"kernel": w(Ld, Dm, Imlp)},
                "down_proj": {"kernel": w(Ld, Imlp, Dm)},
            })
            params["layers_dense"] = dense
        if not self.tie_word_embeddings:
            params["lm_head"] = {"kernel": w(Dm, cfg.vocab_size)}
        return params

    def param_specs(self) -> Dict[str, Any]:
        def attn_specs():
            return {
                "input_layernorm": P(None, None),
                "post_attention_layernorm": P(None, None),
                "q_proj": {"kernel": P(None, None, "tp")},
                "k_proj": {"kernel": P(None, None, "tp")},
                "v_proj": {"kernel": P(None, None, "tp")},
                "o_proj": {"kernel": P(None, "tp", None)},
            }

        moe = attn_specs()
        moe.update({
            "router": {"kernel": P(None, None, None)},
            "experts_gate": P(None, "tp", None, None),
            "experts_up": P(None, "tp", None, None),
            "experts_down": P(None, "tp", None, None),
            "shared_gate_proj": {"kernel": P(None, None, "tp")},
            "shared_up_proj": {"kernel": P(None, None, "tp")},
            "shared_down_proj": {"kernel": P(None, "tp", None)},
        })
        specs = {
            "embed": {"weight": P("tp", None)},
            "layers_moe": moe,
            "norm": P(None),
        }
        if len(self.moe_layers) < self.config.num_layers:
            dense = attn_specs()
            dense.update({
                "gate_proj": {"kernel": P(None, None, "tp")},
                "up_proj": {"kernel": P(None, None, "tp")},
                "down_proj": {"kernel": P(None, "tp", None)},
            })
            specs["layers_dense"] = dense
        if not self.tie_word_embeddings:
            specs["lm_head"] = {"kernel": P(None, "tp")}
        return specs

    # ------------------------------------------------------------ hf weights
    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def lin(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight")).T

        def vec(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight"))

        def attn_stack(ids):
            return {
                "input_layernorm": np.stack([vec(i, "input_layernorm") for i in ids]),
                "post_attention_layernorm": np.stack(
                    [vec(i, "post_attention_layernorm") for i in ids]
                ),
                "q_proj": {"kernel": np.stack([lin(i, "self_attn.q_proj") for i in ids])},
                "k_proj": {"kernel": np.stack([lin(i, "self_attn.k_proj") for i in ids])},
                "v_proj": {"kernel": np.stack([lin(i, "self_attn.v_proj") for i in ids])},
                "o_proj": {"kernel": np.stack([lin(i, "self_attn.o_proj") for i in ids])},
            }

        moe_ids = self.moe_layers
        dense_ids = [i for i in range(L) if i not in set(moe_ids)]
        moe = attn_stack(moe_ids)
        moe["router"] = {
            "kernel": np.stack([lin(i, "feed_forward.router") for i in moe_ids])
        }
        # Fused [E, Dm, 2I] gate_up stacks; split into gate/up halves.
        gu = np.stack([
            np.asarray(get(f"model.layers.{i}.feed_forward.experts.gate_up_proj"))
            for i in moe_ids
        ])  # [Lm, E, Dm, 2I]
        moe["experts_gate"], moe["experts_up"] = np.split(gu, 2, axis=-1)
        moe["experts_down"] = np.stack([
            np.asarray(get(f"model.layers.{i}.feed_forward.experts.down_proj"))
            for i in moe_ids
        ])
        for tgt, src in (
            ("shared_gate_proj", "feed_forward.shared_expert.gate_proj"),
            ("shared_up_proj", "feed_forward.shared_expert.up_proj"),
            ("shared_down_proj", "feed_forward.shared_expert.down_proj"),
        ):
            moe[tgt] = {"kernel": np.stack([lin(i, src) for i in moe_ids])}

        to_dev = lambda t: jax.tree.map(
            lambda a: jnp.asarray(a, dtype=self.dtype), t
        )
        params = {
            "embed": {
                "weight": jnp.asarray(get("model.embed_tokens.weight"), dtype=self.dtype)
            },
            "layers_moe": to_dev(moe),
            "norm": jnp.asarray(get("model.norm.weight"), dtype=self.dtype),
        }
        if dense_ids:
            dense = attn_stack(dense_ids)
            for nm in ("gate_proj", "up_proj", "down_proj"):
                dense[nm] = {
                    "kernel": np.stack([lin(i, f"feed_forward.{nm}") for i in dense_ids])
                }
            params["layers_dense"] = to_dev(dense)
        if not self.tie_word_embeddings:
            params["lm_head"] = {
                "kernel": jnp.asarray(
                    np.asarray(get("lm_head.weight")).T, dtype=self.dtype
                )
            }
        return params

    # ---------------------------------------------------------------- forward
    def _attention(self, lp, h, step: StepArrays, kc, vc, li):
        cfg = self.config
        B, E = step.input_ids.shape
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        normed = rms_norm(h, lp["input_layernorm"], self.rms_eps)
        q = apply_linear(lp["q_proj"], normed).reshape(B, E, Hq, D)
        k = apply_linear(lp["k_proj"], normed).reshape(B, E, Hkv, D)
        v = apply_linear(lp["v_proj"], normed).reshape(B, E, Hkv, D)

        rope_on = self.rope_on_layers[li]
        qr, kr = apply_rope(q, k, step.positions, self.cos_sin_cache,
                            style=self.rope_style)
        q = jnp.where(rope_on, qr, q)
        k = jnp.where(rope_on, kr, k)
        if self.use_qk_norm:
            q = jnp.where(rope_on, _l2norm(q, self.rms_eps), q)
            k = jnp.where(rope_on, _l2norm(k, self.rms_eps), k)
        if self.temp_tuning:
            pos = step.positions.astype(jnp.float32)  # [B, E]
            scales = 1.0 + self.attn_scale * jnp.log1p(
                jnp.floor((pos + 1.0) / self.floor_scale)
            )
            qs = (q.astype(jnp.float32) * scales[:, :, None, None]).astype(q.dtype)
            q = jnp.where(rope_on, q, qs)

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
        # Chunked attention (rope layers): zero chunk disables.
        chunk = jnp.where(
            self.chunk_on_layers[li], jnp.int32(self.chunk_size), jnp.int32(0)
        )
        attn = self.attn_impl(
            q_att, k_pages, v_pages, step.kv_indices, step.seq_lens,
            step.prefix_lens, self.sm_scale, sliding_window=0,
            chunk_size=chunk,
        )
        if vsc is not None:
            attn = (attn.astype(jnp.float32) * vsc).astype(h.dtype)
        out = apply_linear(lp["o_proj"], attn.reshape(B, E, Hq * D))
        return h + out, kc, vc

    def _moe_mlp(self, lp, normed, tok_valid=None):
        B, E_, Dm = normed.shape
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"],
            preferred_element_type=jnp.float32,
        )
        # llama4 router: top-k on RAW logits; sigmoid(top) scales the INPUT.
        top_vals, idx = jax.lax.top_k(logits, self.top_k)
        w = jax.nn.sigmoid(top_vals)
        from ltp_sglang_tpu.eplb.expert_distribution import recorder

        recorder.record_in_program(
            idx, self.n_experts,
            valid=None if tok_valid is None else tok_valid.reshape(-1),
            layer_tag=lp.get("moe_layer_idx"),
        )
        out = moe_ffn_auto(
            x, w, idx.astype(jnp.int32),
            lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False),
            expert_perm=lp.get("expert_perm"),
            scale_input=True,
        )
        g = apply_linear(lp["shared_gate_proj"], x)
        u = apply_linear(lp["shared_up_proj"], x)
        out = out + apply_linear(lp["shared_down_proj"], jax.nn.silu(g) * u)
        return out.reshape(B, E_, Dm)

    def forward(self, params, step: StepArrays, k_cache, v_cache,
                all_logits=False, lora=None, return_hidden=False):
        cfg = self.config
        hidden = params["embed"]["weight"][step.input_ids]
        L = cfg.num_layers
        moe_set = set(self.moe_layers)
        tok_valid = (
            jnp.arange(hidden.shape[1], dtype=jnp.int32)[None, :]
            < step.extend_lens[:, None]
        )

        def moe_layer(h, kc, vc, li, mi):
            lp = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mi, 0, keepdims=False),
                params["layers_moe"],
            )
            h, kc, vc = self._attention(lp, h, step, kc, vc, li)
            normed = rms_norm(h, lp["post_attention_layernorm"], self.rms_eps)
            return h + self._moe_mlp(lp, normed, tok_valid), kc, vc

        def dense_layer(h, kc, vc, li, di):
            lp = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, di, 0, keepdims=False),
                params["layers_dense"],
            )
            h, kc, vc = self._attention(lp, h, step, kc, vc, li)
            normed = rms_norm(h, lp["post_attention_layernorm"], self.rms_eps)
            gate = apply_linear(lp["gate_proj"], normed)
            up = apply_linear(lp["up_proj"], normed)
            return (
                h + apply_linear(lp["down_proj"], jax.nn.silu(gate) * up),
                kc, vc,
            )

        if len(moe_set) == L:
            # All-MoE (Scout): plain scan over the stack.
            def body(carry, xs):
                h, kc, vc = carry
                mi = xs
                h, kc, vc = moe_layer(h, kc, vc, mi, mi)
                return (h, kc, vc), None

            (hidden, k_cache, v_cache), _ = jax.lax.scan(
                body, (hidden, k_cache, v_cache),
                jnp.arange(L, dtype=jnp.int32),
            )
        else:
            # Interleaved (Maverick): per-layer cond over the two stacks.
            is_moe = jnp.asarray(
                np.asarray([i in moe_set for i in range(L)])
            )
            moe_idx = np.cumsum([i in moe_set for i in range(L)]) - 1
            dense_idx = np.cumsum([i not in moe_set for i in range(L)]) - 1
            moe_idx = jnp.asarray(np.maximum(moe_idx, 0), jnp.int32)
            dense_idx = jnp.asarray(np.maximum(dense_idx, 0), jnp.int32)

            def body(li, carry):
                h, kc, vc = carry
                return jax.lax.cond(
                    is_moe[li],
                    lambda c: moe_layer(c[0], c[1], c[2], li, moe_idx[li]),
                    lambda c: dense_layer(c[0], c[1], c[2], li, dense_idx[li]),
                    carry,
                )

            hidden, k_cache, v_cache = jax.lax.fori_loop(
                0, L, body, (hidden, k_cache, v_cache)
            )

        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        if return_hidden:
            return hidden, k_cache, v_cache
        logits = self._lm_head(params, hidden, step, all_logits)
        return logits, k_cache, v_cache
