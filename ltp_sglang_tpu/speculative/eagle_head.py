"""EAGLE draft head: FC-fused single decoder layer driven by target hiddens.

Reference: speculative/eagle_worker.py + the EAGLE-1/2 checkpoint layout
(fc.weight, layers.0.{self_attn,mlp,norms}). The head autoregresses in
feature space: at position i its input is
    u_i = FC(concat(embed(x_i), h_{i-1}))
where h_{i-1} is the hidden state of the previous token — the TARGET's
hidden for committed tokens, the head's own output hidden while chaining
draft tokens. Token logits come from the target's lm_head applied to the
head's output hidden, so no separate vocab projection is stored.

The head keeps a 1-"layer" KV cache of its own, paged exactly like the
target's (kv_write + page table), so the whole spec round stays one jitted
device program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from ltp_sglang_tpu.models.llama import StepArrays
from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention


class EagleDraftHead:
    """One llama-style decoder layer with a 2D->D input FC."""

    def __init__(self, config: ModelConfig, kv_write_impl=None):
        from ltp_sglang_tpu.ops.kv_cache_ops import kv_write_pallas, kv_write_xla

        self.config = config
        from ltp_sglang_tpu.models.llama import to_jnp_dtype

        self.dtype = to_jnp_dtype(config.dtype)
        hf = config.hf_config
        self.rms_eps = hf.get("rms_norm_eps", 1e-6)
        self.rope_theta = hf.get("rope_theta", 10000.0)
        self.sm_scale = config.head_dim**-0.5
        self.kv_write = kv_write_impl or (
            kv_write_pallas if jax.default_backend() == "tpu" else kv_write_xla
        )
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim, config.context_len, self.rope_theta
        )

    # ------------------------------------------------------------- parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        key = jax.random.PRNGKey(seed)

        def w(key, *shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02).astype(
                self.dtype
            )

        ks = jax.random.split(key, 10)
        return {
            "fc": {"kernel": w(ks[0], 2 * Dm, Dm)},
            "input_layernorm": jnp.ones((Dm,), dtype=self.dtype),
            "hidden_norm": jnp.ones((Dm,), dtype=self.dtype),
            "q_proj": {"kernel": w(ks[1], Dm, Hq * D)},
            "k_proj": {"kernel": w(ks[2], Dm, Hkv * D)},
            "v_proj": {"kernel": w(ks[3], Dm, Hkv * D)},
            "o_proj": {"kernel": w(ks[4], Hq * D, Dm)},
            "post_attention_layernorm": jnp.ones((Dm,), dtype=self.dtype),
            "gate_proj": {"kernel": w(ks[5], Dm, I)},
            "up_proj": {"kernel": w(ks[6], Dm, I)},
            "down_proj": {"kernel": w(ks[7], I, Dm)},
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """EAGLE HF checkpoints: fc.weight, layers.0.*."""
        def lin(name):
            for cand in (name, f"model.{name}"):
                if cand in weights:
                    return jnp.asarray(
                        np.asarray(weights[cand]).T, dtype=self.dtype
                    )
            raise KeyError(name)

        def vec(name, default=None):
            for cand in (name, f"model.{name}"):
                if cand in weights:
                    return jnp.asarray(np.asarray(weights[cand]), dtype=self.dtype)
            if default is not None:
                return default
            raise KeyError(name)

        Dm = self.config.hidden_size
        ones = jnp.ones((Dm,), dtype=self.dtype)
        return {
            "fc": {"kernel": lin("fc.weight")},
            # EAGLE-1 heads have no pre-norms; EAGLE-3 style adds them.
            "input_layernorm": vec("layers.0.input_layernorm.weight", ones),
            "hidden_norm": vec("layers.0.hidden_norm.weight", ones),
            "q_proj": {"kernel": lin("layers.0.self_attn.q_proj.weight")},
            "k_proj": {"kernel": lin("layers.0.self_attn.k_proj.weight")},
            "v_proj": {"kernel": lin("layers.0.self_attn.v_proj.weight")},
            "o_proj": {"kernel": lin("layers.0.self_attn.o_proj.weight")},
            "post_attention_layernorm": vec(
                "layers.0.post_attention_layernorm.weight", ones
            ),
            "gate_proj": {"kernel": lin("layers.0.mlp.gate_proj.weight")},
            "up_proj": {"kernel": lin("layers.0.mlp.up_proj.weight")},
            "down_proj": {"kernel": lin("layers.0.mlp.down_proj.weight")},
        }

    # ---------------------------------------------------------------- forward
    def forward(
        self,
        params: Dict[str, Any],
        embeds: jnp.ndarray,  # [B, E, Dm] embed(x_i) from the TARGET's table
        hiddens: jnp.ndarray,  # [B, E, Dm] h_{i-1} (target or own)
        step: StepArrays,
        k_cache: jnp.ndarray,  # [1, S, r, ln]
        v_cache: jnp.ndarray,
    ):
        """Returns (out_hidden [B, E, Dm], k_cache, v_cache)."""
        cfg = self.config
        B, E, Dm = embeds.shape
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        u = jnp.concatenate(
            [
                rms_norm(embeds, params["input_layernorm"], self.rms_eps),
                rms_norm(hiddens, params["hidden_norm"], self.rms_eps),
            ],
            axis=-1,
        )
        h = apply_linear(params["fc"], u)

        normed = h  # single layer; norms already applied to the two inputs
        q = apply_linear(params["q_proj"], normed).reshape(B, E, Hq, D)
        k = apply_linear(params["k_proj"], normed).reshape(B, E, Hkv, D)
        v = apply_linear(params["v_proj"], normed).reshape(B, E, Hkv, D)
        q, k = apply_rope(q, k, step.positions, self.cos_sin_cache)
        cache_locs_flat = step.cache_locs.reshape(-1)
        k_cache, v_cache = self.kv_write(
            k_cache, v_cache, jnp.int32(0), cache_locs_flat,
            k.reshape(-1, Hkv, D).astype(k_cache.dtype),
            v.reshape(-1, Hkv, D).astype(v_cache.dtype),
            jnp.asarray(B * E, jnp.int32),
        )
        C = step.kv_indices.shape[1]
        k_pages = k_cache[0, step.kv_indices].reshape(B, C, Hkv, D)
        v_pages = v_cache[0, step.kv_indices].reshape(B, C, Hkv, D)
        attn = ref_paged_attention(
            q, k_pages, v_pages, step.kv_indices, step.seq_lens,
            step.prefix_lens, self.sm_scale,
        )
        h = h + apply_linear(params["o_proj"], attn.reshape(B, E, Hq * D))
        normed = rms_norm(h, params["post_attention_layernorm"], self.rms_eps)
        gate = apply_linear(params["gate_proj"], normed)
        up = apply_linear(params["up_proj"], normed)
        h = h + apply_linear(params["down_proj"], jax.nn.silu(gate) * up)
        return h, k_cache, v_cache
