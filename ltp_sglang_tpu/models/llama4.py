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
        if step.mm_embeds is not None:
            # VLM embedding injection (models/llama.py forward): placeholder
            # positions take the projected image embeddings.
            hidden = jnp.where(
                step.mm_mask[:, :, None],
                step.mm_embeds.astype(hidden.dtype),
                hidden,
            )
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


class Llama4ForConditionalGeneration(Llama4ForCausalLM):
    """Llama-4 VLM (the reference's mllama4.py): Llama4VisionModel tower —
    unfold-conv patch embed, CLS appended LAST, learned position embeddings,
    2D rotary (x/y coords, interleaved complex pairs, zeroed for CLS),
    pre-norm ViT layers with q/k/v/o+fc biases — then layernorm_post, drop
    CLS, HF pixel_shuffle, the vision_adapter MLP (fc1-gelu-fc2-gelu, no
    bias) and the bias-free multi_modal_projector into the text stream.
    Verified against transformers modeling_llama4.py:677-1120.

    Served at a fixed square resolution (vision_config.image_size) through
    the generic multimodal pipeline, like the other towers here."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        vc = hf.get("vision_config", {})
        self.vc = vc
        self.v_img = int(vc.get("image_size", 336))
        self.v_patch = int(vc.get("patch_size", 14))
        self.v_dim = int(vc.get("hidden_size", 1408))
        self.v_heads = int(vc.get("num_attention_heads", 16))
        self.v_layers = int(vc.get("num_hidden_layers", 34))
        self.v_inter = int(vc.get("intermediate_size", 5632))
        self.v_ratio = float(vc.get("pixel_shuffle_ratio", 0.5))
        self.v_theta = float(vc.get("rope_theta", 10000))
        self.v_eps = float(vc.get("norm_eps", 1e-5))
        self.proj_in = int(vc.get("projector_input_dim", 4096))
        self.proj_out = int(vc.get("projector_output_dim", 4096))
        self.image_token_index = hf.get("image_token_index", 200092)
        self.fixed_image_size = self.v_img
        side = self.v_img // self.v_patch
        self.num_image_tokens = int((side * side) * self.v_ratio * self.v_ratio)
        # 2D vision rope (modeling_llama4.py:982-1002): coords+1 scaled by
        # the per-dim frequencies, x|y halves subsampled [::2], CLS zeroed.
        hd = self.v_dim // self.v_heads
        img_idx = np.arange(side * side, dtype=np.int64).reshape(-1, 1)
        img_idx = np.concatenate([img_idx, img_idx[:1]], axis=0)
        img_idx[-1, -1] = -2  # CLS marker
        fx = img_idx % side
        fy = img_idx // side
        freq_dim = hd // 2
        rope_freq = 1.0 / (
            self.v_theta
            ** (
                np.arange(0, freq_dim, 2, dtype=np.float64)[: freq_dim // 2]
                / freq_dim
            )
        )
        freqs_x = np.repeat((fx + 1)[..., None] * rope_freq[None, None, :], 2, -1)
        freqs_y = np.repeat((fy + 1)[..., None] * rope_freq[None, None, :], 2, -1)
        freqs = np.concatenate([freqs_x, freqs_y], axis=-1)[..., ::2]
        freqs = np.where(img_idx.reshape(-1, 1, 1) < 0, 0.0, freqs)
        freqs = freqs[:, 0, :]  # [T+1, hd/2]
        self.v_rope_cos = jnp.asarray(np.cos(freqs), jnp.float32)
        self.v_rope_sin = jnp.asarray(np.sin(freqs), jnp.float32)

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        rng = np.random.RandomState(seed + 17)
        Dv, Iv, Hl = self.v_dim, self.v_inter, self.v_layers
        side = self.v_img // self.v_patch
        T = side * side + 1

        def lin(K, N, bias=True):
            p = {"kernel": jnp.asarray(
                rng.randn(Hl, K, N).astype(np.float32) * 0.02, self.dtype)}
            if bias:
                p["bias"] = jnp.zeros((Hl, N), self.dtype)
            return p

        sh_ch = int(Dv / (self.v_ratio * self.v_ratio))
        params["vision"] = {
            "patch": {"kernel": jnp.asarray(
                rng.randn(3 * self.v_patch ** 2, Dv).astype(np.float32) * 0.02,
                self.dtype)},
            "cls": jnp.zeros((Dv,), self.dtype),
            "pos": jnp.zeros((T, Dv), self.dtype),
            "ln_pre_w": jnp.ones((Dv,), self.dtype),
            "ln_pre_b": jnp.zeros((Dv,), self.dtype),
            "ln_post_w": jnp.ones((Dv,), self.dtype),
            "ln_post_b": jnp.zeros((Dv,), self.dtype),
            "layers": {
                "q_proj": lin(Dv, Dv), "k_proj": lin(Dv, Dv),
                "v_proj": lin(Dv, Dv), "o_proj": lin(Dv, Dv),
                "fc1": lin(Dv, Iv), "fc2": lin(Iv, Dv),
                "ln1_w": jnp.ones((Hl, Dv), self.dtype),
                "ln1_b": jnp.zeros((Hl, Dv), self.dtype),
                "ln2_w": jnp.ones((Hl, Dv), self.dtype),
                "ln2_b": jnp.zeros((Hl, Dv), self.dtype),
            },
            "adapter_fc1": {"kernel": jnp.asarray(
                rng.randn(sh_ch, self.proj_in).astype(np.float32) * 0.02,
                self.dtype)},
            "adapter_fc2": {"kernel": jnp.asarray(
                rng.randn(self.proj_out, self.proj_out).astype(np.float32) * 0.02,
                self.dtype)},
        }
        params["projector"] = {"kernel": jnp.asarray(
            rng.randn(self.proj_out, self.config.hidden_size).astype(np.float32)
            * 0.02, self.dtype)}
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        probe = self.init_params(0)
        for key in ("vision", "projector"):
            specs[key] = jax.tree.map(
                lambda a: P(*([None] * a.ndim)), probe[key]
            )
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        lm_weights = {}
        for name, wv in weights.items():
            if name.startswith("language_model."):
                lm_weights[name[len("language_model."):]] = wv
            elif name.startswith("model.language_model."):
                lm_weights["model." + name[len("model.language_model."):]] = wv
        if "lm_head.weight" in weights:
            lm_weights["lm_head.weight"] = weights["lm_head.weight"]
        params = super().convert_hf_weights(lm_weights)

        def g(n):
            for pref in ("vision_model.", "model.vision_model."):
                if pref + n in weights:
                    return np.asarray(weights[pref + n])
            raise KeyError(n)

        Hl = self.v_layers

        def stack_lin(sub):
            return {
                "kernel": jnp.asarray(
                    np.stack(
                        [g(f"model.layers.{i}.{sub}.weight").T for i in range(Hl)]
                    ), self.dtype),
                "bias": jnp.asarray(
                    np.stack(
                        [g(f"model.layers.{i}.{sub}.bias") for i in range(Hl)]
                    ), self.dtype),
            }

        def stack_vec(sub):
            return jnp.asarray(
                np.stack([g(f"model.layers.{i}.{sub}") for i in range(Hl)]),
                self.dtype,
            )

        params["vision"] = {
            "patch": {"kernel": jnp.asarray(
                g("patch_embedding.linear.weight").T, self.dtype)},
            "cls": jnp.asarray(g("class_embedding"), self.dtype),
            "pos": jnp.asarray(g("positional_embedding_vlm"), self.dtype),
            "ln_pre_w": jnp.asarray(g("layernorm_pre.weight"), self.dtype),
            "ln_pre_b": jnp.asarray(g("layernorm_pre.bias"), self.dtype),
            "ln_post_w": jnp.asarray(g("layernorm_post.weight"), self.dtype),
            "ln_post_b": jnp.asarray(g("layernorm_post.bias"), self.dtype),
            "layers": {
                "q_proj": stack_lin("self_attn.q_proj"),
                "k_proj": stack_lin("self_attn.k_proj"),
                "v_proj": stack_lin("self_attn.v_proj"),
                "o_proj": stack_lin("self_attn.o_proj"),
                "fc1": stack_lin("mlp.fc1"),
                "fc2": stack_lin("mlp.fc2"),
                "ln1_w": stack_vec("input_layernorm.weight"),
                "ln1_b": stack_vec("input_layernorm.bias"),
                "ln2_w": stack_vec("post_attention_layernorm.weight"),
                "ln2_b": stack_vec("post_attention_layernorm.bias"),
            },
            "adapter_fc1": {"kernel": jnp.asarray(
                g("vision_adapter.mlp.fc1.weight").T, self.dtype)},
            "adapter_fc2": {"kernel": jnp.asarray(
                g("vision_adapter.mlp.fc2.weight").T, self.dtype)},
        }

        def pj(n):
            for pref in ("multi_modal_projector.", "model.multi_modal_projector."):
                if pref + n in weights:
                    return np.asarray(weights[pref + n])
            raise KeyError(n)

        params["projector"] = {
            "kernel": jnp.asarray(pj("linear_1.weight").T, self.dtype)
        }
        return params

    # ---------------------------------------------------------------- vision
    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] -> projected embeddings [N, num_image_tokens, Dm]."""

        def ln(x, w, b):
            x32 = x.astype(jnp.float32)
            mu = x32.mean(-1, keepdims=True)
            var = x32.var(-1, keepdims=True)
            return (((x32 - mu) * jax.lax.rsqrt(var + self.v_eps)) * w + b).astype(
                x.dtype
            )

        vp = params["vision"]
        N = pixel_values.shape[0]
        P_, side = self.v_patch, self.v_img // self.v_patch
        Dv, nh = self.v_dim, self.v_heads
        hd = Dv // nh
        # Unfold + linear (modeling_llama4.py:962-979): channel-major
        # (c, ph, pw) patch flattening, row-major patch order.
        x = pixel_values.astype(jnp.float32).reshape(N, 3, side, P_, side, P_)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, side * side, 3 * P_ * P_)
        h = (x @ vp["patch"]["kernel"].astype(jnp.float32)).astype(self.dtype)
        h = jnp.concatenate(
            [h, jnp.broadcast_to(vp["cls"][None, None], (N, 1, Dv))], axis=1
        )
        h = h + vp["pos"][None]
        h = ln(h, vp["ln_pre_w"], vp["ln_pre_b"])

        cos = self.v_rope_cos[None, :, None, :]  # [1, T, 1, hd/2]
        sin = self.v_rope_sin[None, :, None, :]

        def rot(x):
            x1, x2 = x[..., ::2], x[..., 1::2]
            out = jnp.stack(
                [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
            )
            return out.reshape(x.shape).astype(x.dtype)

        def layer(h, lp):
            T = h.shape[1]
            hn = ln(h, lp["ln1_w"], lp["ln1_b"])
            q = (hn @ lp["q_proj"]["kernel"] + lp["q_proj"]["bias"]).reshape(
                N, T, nh, hd
            )
            k = (hn @ lp["k_proj"]["kernel"] + lp["k_proj"]["bias"]).reshape(
                N, T, nh, hd
            )
            v = (hn @ lp["v_proj"]["kernel"] + lp["v_proj"]["bias"]).reshape(
                N, T, nh, hd
            )
            q, k = rot(q.astype(jnp.float32)), rot(k.astype(jnp.float32))
            s = jnp.einsum(
                "bthd,bchd->bhtc", q, k, preferred_element_type=jnp.float32
            ) * (hd ** -0.5)
            probs = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum(
                "bhtc,bchd->bthd", probs, v.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).reshape(N, T, Dv).astype(h.dtype)
            h = h + (o @ lp["o_proj"]["kernel"] + lp["o_proj"]["bias"])
            hn2 = ln(h, lp["ln2_w"], lp["ln2_b"])
            m = jax.nn.gelu(
                hn2 @ lp["fc1"]["kernel"] + lp["fc1"]["bias"], approximate=False
            )
            h = h + (m @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])
            return h, None

        h, _ = jax.lax.scan(layer, h, vp["layers"])
        h = ln(h, vp["ln_post_w"], vp["ln_post_b"])
        h = h[:, :-1, :]  # drop CLS
        # HF pixel_shuffle (modeling_llama4.py:708-725), r = shuffle ratio.
        r = self.v_ratio
        s1 = side
        h = h.reshape(N, s1, int(s1 * r), int(Dv / r))
        h = h.transpose(0, 2, 1, 3)
        h = h.reshape(N, int(s1 * r), int(s1 * r), int(Dv / (r * r)))
        h = h.transpose(0, 2, 1, 3)
        h = h.reshape(N, int(s1 * s1 * r * r), int(Dv / (r * r)))
        h = jax.nn.gelu(h @ vp["adapter_fc1"]["kernel"], approximate=False)
        h = jax.nn.gelu(h @ vp["adapter_fc2"]["kernel"], approximate=False)
        return h @ params["projector"]["kernel"]
