"""Gemma-2: sandwich norms, soft-capping, alternating sliding-window layers.

Reference: python/sglang/srt/models/gemma2.py. Facts replicated:
- embeddings scaled by sqrt(hidden_size); all RMS norms are (1 + w) style.
- four norms per layer: pre/post attention and pre/post feedforward (the
  post-norms apply to the block OUTPUT before the residual add).
- gelu_tanh gated MLP; query scaling by query_pre_attn_scalar^-0.5.
- attention logit softcap and final lm-head logit softcap.
- even layers use sliding-window attention, odd layers are global (handled
  with a per-layer window value carried through the scan; global layers get
  a window larger than the context so the same masked kernel serves both).
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
from ltp_sglang_tpu.models.llama import LlamaForCausalLM, StepArrays


class Gemma2ForCausalLM(LlamaForCausalLM):
    forward_window_token = None  # incompatible attention structure
    forward_window_token_paged = None
    supports_quant_fusion = False  # custom forward keeps per-proj names
    supports_pp = False
    # This custom forward consumes swa_caches (per-request ring pools for
    # the sliding layers); llama-forward hybrids instead mask over full KV.
    swa_pool_capable = True
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.tie_word_embeddings = hf.get("tie_word_embeddings", True)
        self.attn_logit_softcap = hf.get("attn_logit_softcapping", 50.0) or 0.0
        self.final_logit_softcap = hf.get("final_logit_softcapping", 30.0) or 0.0
        qpas = hf.get("query_pre_attn_scalar", config.head_dim)
        self.sm_scale = qpas**-0.5
        self.sw_size = hf.get("sliding_window", 4096)
        # Even layers slide, odd are global (HF gemma2 convention).
        self.layer_windows = np.array(
            [
                self.sw_size if i % 2 == 0 else config.context_len + 1
                for i in range(config.num_layers)
            ],
            dtype=np.int32,
        )
        self.embed_scale = config.hidden_size**0.5

    # ------------------------------------------------------------- parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        # Gemma norms store (w) with effective weight (1 + w): zeros == unit.
        for name in ("input_layernorm", "post_attention_layernorm"):
            params["layers"][name] = jnp.zeros((L, Dm), dtype=self.dtype)
        params["layers"]["pre_feedforward_layernorm"] = jnp.zeros((L, Dm), dtype=self.dtype)
        params["layers"]["post_feedforward_layernorm"] = jnp.zeros((L, Dm), dtype=self.dtype)
        params["norm"] = jnp.zeros((Dm,), dtype=self.dtype)
        params.pop("lm_head", None)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"]["pre_feedforward_layernorm"] = P(None, None)
        specs["layers"]["post_feedforward_layernorm"] = P(None, None)
        specs.pop("lm_head", None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        cfg = self.config
        L = cfg.num_layers

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        for name in ("pre_feedforward_layernorm", "post_feedforward_layernorm"):
            params["layers"][name] = jnp.asarray(
                np.stack(
                    [np.asarray(get(f"model.layers.{i}.{name}.weight")) for i in range(L)]
                ),
                dtype=self.dtype,
            )
        return params

    # ---------------------------------------------------------------- forward
    def forward(self, params, step: StepArrays, k_cache, v_cache,
                all_logits=False, lora=None, return_hidden=False,
                swa_caches=None):
        cfg = self.config
        B, E = step.input_ids.shape
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        hidden = params["embed"]["weight"][step.input_ids] * jnp.asarray(
            self.embed_scale, dtype=self.dtype
        )
        if step.mm_embeds is not None:
            # VLM injection AFTER the embed scale (HF gemma3 masked_scatter
            # replaces the scaled embeds with raw projected features).
            hidden = jnp.where(
                step.mm_mask[:, :, None], step.mm_embeds.astype(hidden.dtype),
                hidden,
            )
        # Gemma3 VLM: image tokens attend BIDIRECTIONALLY within their own
        # span (HF token_type_ids mask). Span identity comes free from the
        # radix pad ids: image positions carry their image's hash id, so
        # same-id ∧ both-image == same-span. Expressed through the attention
        # contract's tree_mask (causal-within-block ∨ same-span; prefix
        # stays fully visible). Caveat: on SWA ring layers the block-column
        # mapping assumes positions < ring (true until a prompt wraps the
        # ring; images that deep in context lose the forward half of the
        # bidirectional mask, never correctness of causal attention).
        mm_bidir = None
        if getattr(self, "mm_bidirectional", False) and step.mm_mask is not None:
            ids = step.input_ids
            img = step.mm_mask
            same = (
                (ids[:, :, None] == ids[:, None, :])
                & img[:, :, None] & img[:, None, :]
            )
            ee = jnp.arange(E, dtype=jnp.int32)
            mm_bidir = (ee[None, :, None] >= ee[None, None, :]) | same
        cache_locs_flat = step.cache_locs.reshape(-1)

        layers, quant_stacked = self._split_quant_leaves(params["layers"])

        # Hybrid SWA pool: sliding layers write/read per-request rings
        # (slot = req_row*ring + pos % ring, in-program — no table or
        # allocator; mem_cache/memory_pool.py:420 SWAKVPool analog).
        use_swa = swa_caches is not None
        if use_swa:
            k_swa, v_swa = swa_caches
            ring = self.swa_pool["ring"]
            is_swa_arr = self.swa_pool["is_swa"]
            sub_arr = self.swa_pool["sub_index"]
            # Rings have no garbage slot 0: padded tokens inside the extend
            # bucket (positions 0) would clobber the request's own position-0
            # slot, so they are routed to the DUMP ring (last row).
            dump_ring0 = (swa_caches[0].shape[1] // ring - 1) * ring
            e_valid = (
                jnp.arange(E, dtype=jnp.int32)[None, :]
                < step.extend_lens[:, None]
            ).reshape(-1)
            ring_locs = jnp.where(
                e_valid,
                jnp.repeat(step.req_rows, E) * ring
                + jax.lax.rem(step.positions.reshape(-1), ring),
                dump_ring0,
            ).astype(jnp.int32)
            Cw0 = step.kv_indices.shape[1]
            cols = jnp.arange(Cw0, dtype=jnp.int32)[None, :]
            ring_idx = (
                step.req_rows[:, None] * ring + jax.lax.rem(cols, ring)
            ).astype(jnp.int32)
        else:
            k_swa = v_swa = None
            is_swa_arr = jnp.zeros((cfg.num_layers,), bool)
            sub_arr = jnp.arange(cfg.num_layers, dtype=jnp.int32)

        def layer_body(carry, xs):
            h, kc, vc, ks, vs = carry
            lp, li, window, layer_is_swa, li_sub = xs

            def lin(name, x):
                if quant_stacked is not None and name in quant_stacked:
                    return apply_linear(
                        quant_stacked[name], x, self.quant_group_size, li=li
                    )
                return apply_linear(lp[name], x, self.quant_group_size)

            normed = rms_norm(h, lp["input_layernorm"], self.rms_eps, gemma_style=True)
            q = lin("q_proj", normed)
            k = lin("k_proj", normed)
            v = lin("v_proj", normed)
            q = q.reshape(B, E, Hq, D)
            k = k.reshape(B, E, Hkv, D)
            v = v.reshape(B, E, Hkv, D)
            if self.has_qk_norm:  # gemma3: per-head (1+w) norms before rope
                q = rms_norm(q, lp["q_norm"], self.rms_eps, gemma_style=True)
                k = rms_norm(k, lp["k_norm"], self.rms_eps, gemma_style=True)
            if self.rope_local_layer is not None:
                # gemma3 dual rope: sliding layers use the local-theta cache.
                qg, kg = apply_rope(q, k, step.positions, self.cos_sin_cache)
                ql, kl = apply_rope(
                    q, k, step.positions, self.cos_sin_cache_local
                )
                sel = self.rope_local_layer[li]
                q = jnp.where(sel, ql, qg)
                k = jnp.where(sel, kl, kg)
            else:
                q, k = apply_rope(q, k, step.positions, self.cos_sin_cache)
            k_st, v_st, q_att, vsc = self._kv_quantize(
                lp, kc.dtype, k.reshape(-1, Hkv, D), v.reshape(-1, Hkv, D), q
            )
            use_ring_kernel = (
                use_swa and E == 1 and mm_bidir is None
                and getattr(self, "swa_ring_kernel", False)
            )
            if use_ring_kernel:
                # Decode fast path: SWA layers stream their contiguous ring
                # region through the Pallas ring kernel (logit cap applied
                # in-kernel) instead of the whole-region XLA gather
                # (ops/attention/pallas_swa_decode.py). Attention moves
                # INSIDE the cond so both branches return the attn output.
                from ltp_sglang_tpu.ops.attention.pallas_swa_decode import (
                    ring_decode_attention,
                )

                def swa_branch(kc, vc, ks, vs):
                    ks, vs = self.kv_write(
                        ks, vs, li_sub, ring_locs, k_st, v_st,
                        jnp.asarray(B * E, jnp.int32),
                    )
                    attn = ring_decode_attention(
                        q_att[:, 0], ks, vs, li_sub, step.req_rows,
                        step.seq_lens,
                        ring=int(self.swa_pool["ring"]),
                        window=int(self.sw_size),
                        num_kv_heads=Hkv, sm_scale=self.sm_scale,
                        logit_cap=float(self.attn_logit_softcap or 0.0),
                    )[:, None]  # [B, 1, Hq, D]
                    return kc, vc, ks, vs, attn.astype(q_att.dtype)

                def full_branch(kc, vc, ks, vs):
                    kc, vc = self.kv_write(
                        kc, vc, li_sub, cache_locs_flat, k_st, v_st,
                        jnp.asarray(B * E, jnp.int32),
                    )
                    kp = kc[li_sub, step.kv_indices].reshape(B, -1, Hkv, D)
                    vp = vc[li_sub, step.kv_indices].reshape(B, -1, Hkv, D)
                    if vsc is not None:
                        kp = kp.astype(q_att.dtype)
                        vp = vp.astype(q_att.dtype)
                    attn = self.attn_impl(
                        q_att, kp, vp, step.kv_indices, step.seq_lens,
                        step.prefix_lens, self.sm_scale,
                        logit_cap=self.attn_logit_softcap,
                        sliding_window=0,
                    )
                    return kc, vc, ks, vs, attn.astype(q_att.dtype)

                kc, vc, ks, vs, attn_out = jax.lax.cond(
                    layer_is_swa, swa_branch, full_branch, kc, vc, ks, vs
                )
                if vsc is not None:
                    attn_out = (
                        attn_out.astype(jnp.float32) * vsc
                    ).astype(h.dtype)
                attn_out = lin("o_proj", attn_out.reshape(B, E, Hq * D))
                attn_out = rms_norm(
                    attn_out, lp["post_attention_layernorm"], self.rms_eps,
                    gemma_style=True,
                )
                h = h + attn_out
                normed = rms_norm(
                    h, lp["pre_feedforward_layernorm"], self.rms_eps,
                    gemma_style=True,
                )
                gate = lin("gate_proj", normed)
                up = lin("up_proj", normed)
                mlp = lin("down_proj", jax.nn.gelu(gate, approximate=True) * up)
                mlp = rms_norm(
                    mlp, lp["post_feedforward_layernorm"], self.rms_eps,
                    gemma_style=True,
                )
                h = h + mlp
                return (h, kc, vc, ks, vs), None
            if use_swa:
                def swa_branch(kc, vc, ks, vs):
                    ks, vs = self.kv_write(
                        ks, vs, li_sub, ring_locs, k_st, v_st,
                        jnp.asarray(B * E, jnp.int32),
                    )
                    kp = ks[li_sub, ring_idx].reshape(B, -1, Hkv, D)
                    vp = vs[li_sub, ring_idx].reshape(B, -1, Hkv, D)
                    return kc, vc, ks, vs, kp, vp

                def full_branch(kc, vc, ks, vs):
                    kc, vc = self.kv_write(
                        kc, vc, li_sub, cache_locs_flat, k_st, v_st,
                        jnp.asarray(B * E, jnp.int32),
                    )
                    kp = kc[li_sub, step.kv_indices].reshape(B, -1, Hkv, D)
                    vp = vc[li_sub, step.kv_indices].reshape(B, -1, Hkv, D)
                    return kc, vc, ks, vs, kp, vp

                kc, vc, ks, vs, k_pages, v_pages = jax.lax.cond(
                    layer_is_swa, swa_branch, full_branch, kc, vc, ks, vs
                )
            else:
                kc, vc = self.kv_write(
                    kc, vc, li, cache_locs_flat, k_st, v_st,
                    jnp.asarray(B * E, jnp.int32),
                )
                Cw = step.kv_indices.shape[1]
                k_pages = kc[li, step.kv_indices].reshape(B, Cw, Hkv, D)
                v_pages = vc[li, step.kv_indices].reshape(B, Cw, Hkv, D)
            if vsc is not None:
                k_pages = k_pages.astype(q.dtype)
                v_pages = v_pages.astype(q.dtype)
            attn_out = self.attn_impl(
                q_att,
                k_pages,
                v_pages,
                step.kv_indices,
                step.seq_lens,
                step.prefix_lens,
                self.sm_scale,
                logit_cap=self.attn_logit_softcap,
                sliding_window=window,
                tree_mask=mm_bidir,
            )
            if vsc is not None:
                attn_out = (attn_out.astype(jnp.float32) * vsc).astype(h.dtype)
            attn_out = lin("o_proj", attn_out.reshape(B, E, Hq * D))
            attn_out = rms_norm(
                attn_out, lp["post_attention_layernorm"], self.rms_eps, gemma_style=True
            )
            h = h + attn_out

            normed = rms_norm(
                h, lp["pre_feedforward_layernorm"], self.rms_eps, gemma_style=True
            )
            gate = lin("gate_proj", normed)
            up = lin("up_proj", normed)
            mlp = lin("down_proj", jax.nn.gelu(gate, approximate=True) * up)
            mlp = rms_norm(
                mlp, lp["post_feedforward_layernorm"], self.rms_eps, gemma_style=True
            )
            h = h + mlp
            return (h, kc, vc, ks, vs), None

        L = cfg.num_layers
        dummy = jnp.zeros((0,), self.dtype)
        (hidden, k_cache, v_cache, k_swa, v_swa), _ = jax.lax.scan(
            layer_body,
            (hidden, k_cache, v_cache,
             k_swa if use_swa else dummy, v_swa if use_swa else dummy),
            (
                layers,
                jnp.arange(L, dtype=jnp.int32),
                jnp.asarray(self.layer_windows),
                is_swa_arr,
                sub_arr,
            ),
        )

        hidden = rms_norm(hidden, params["norm"], self.rms_eps, gemma_style=True)
        if use_swa:
            k_out, v_out = (k_cache, k_swa), (v_cache, v_swa)
        else:
            k_out, v_out = k_cache, v_cache
        if return_hidden:
            return hidden, k_out, v_out
        logits = self._lm_head(params, hidden, step, all_logits)
        if self.final_logit_softcap:
            cap = self.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        return logits, k_out, v_out
