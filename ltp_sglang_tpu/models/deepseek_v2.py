"""DeepSeek-V2/V3 family: MLA attention + shared-expert MoE.

Reference: python/sglang/srt/models/deepseek_v2.py (2629 LoC). The default
cache mode is LATENT-KV (kv_lora+rope rows with weight absorption at decode —
the reference's absorb path / flashinfer_mla_backend analog); the
MHA-materialized mode (decompressed K/V in the paged cache, the reference's
non-absorb path) remains available via `mla_latent_cache: false` and serves
as the parity oracle in tests.

Architecture facts replicated:
- q path: q_proj (V2-Lite) or q_a_proj -> rmsnorm -> q_b_proj; per head the
  query splits into [qk_nope_head_dim | qk_rope_head_dim].
- kv path: kv_a_proj_with_mqa -> [kv_lora_rank | qk_rope_head_dim]; the lora
  part is rms-normed then kv_b_proj expands to per-head [nope | v]; the rope
  part is a single shared key channel, broadcast to all heads.
- MoE: first_k_dense_replace dense layers, then n_routed_experts with
  num_experts_per_tok routing (softmax for V2, sigmoid + e_score bias for V3),
  routed_scaling_factor, plus n_shared_experts always-on experts.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.moe import moe_ffn, moe_ffn_auto, moe_topk
from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from ltp_sglang_tpu.models.llama import LlamaForCausalLM, StepArrays


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    # Two-source windows never apply (MLA keeps no per-head K/V buffers);
    # the PAGED window path is supported via the latent-MQA Pallas kernel
    # (forward_window_token_paged below) when the runner enables it.
    forward_window_token = None
    supports_quant_fusion = False  # MLA projections use their own names
    supports_pp = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.q_lora_rank = hf.get("q_lora_rank") or 0
        self.kv_lora_rank = hf["kv_lora_rank"]
        self.qk_nope = hf["qk_nope_head_dim"]
        self.qk_rope = hf["qk_rope_head_dim"]
        self.v_head_dim = hf["v_head_dim"]
        self.qk_head_dim = self.qk_nope + self.qk_rope
        self.first_k_dense = hf.get("first_k_dense_replace", 0)
        self.n_routed_experts = hf.get("n_routed_experts", 0)
        self.n_shared_experts = hf.get("n_shared_experts", 0)
        self.top_k = hf.get("num_experts_per_tok", 6)
        self.moe_intermediate = hf.get("moe_intermediate_size", 0)
        self.norm_topk_prob = hf.get("norm_topk_prob", hf.get("topk_method") == "noaux_tc")
        self.scoring = hf.get("scoring_func", "softmax")
        self.routed_scaling_factor = hf.get("routed_scaling_factor", 1.0)
        self.topk_method = hf.get("topk_method", "greedy")
        # Group-limited routing (reference topk.py grouped/biased topk).
        self.n_group = int(hf.get("n_group", 1) or 1)
        self.topk_group = int(hf.get("topk_group", 1) or 1)
        self.latent_cache = bool(hf.get("mla_latent_cache", True))
        from ltp_sglang_tpu.utils import round_up

        self.latent_k_row = round_up(self.kv_lora_rank + self.qk_rope, 256)

        # MLA softmax scale includes yarn mscale (deepseek_v2.py reference).
        self.sm_scale = self.qk_head_dim**-0.5
        rs = hf.get("rope_scaling")
        if rs and rs.get("type", rs.get("rope_type")) == "yarn":
            mscale_all_dim = rs.get("mscale_all_dim", 0)
            factor = rs.get("factor", 1.0)
            if mscale_all_dim:
                m = 0.1 * mscale_all_dim * math.log(factor) + 1.0 if factor > 1 else 1.0
                self.sm_scale = self.sm_scale * m * m
        self.cos_sin_cache = build_cos_sin_cache(
            self.qk_rope,
            config.context_len,
            base=self.rope_theta,
            rope_scaling=self.rope_scaling,
        )

    # KV cache rows. Latent mode (default; the reference's absorb path,
    # models/deepseek_v2.py:1179 forward_absorb_prepare): ONE shared row of
    # [normed latent (kv_lora) | roped k_pe (qk_rope) | pad] per token per
    # layer — ~7x smaller than materialized MHA rows — padded to a
    # 256-elem multiple so the Pallas row-DMA write stays eligible; the
    # v_cache holds a minimal dummy row (V is the latent slice of K).
    # MHA mode (model_override_args {"mla_latent_cache": false}) keeps
    # materialized per-head K/V rows.
    @staticmethod
    def _sublane_legal(row: int) -> int:
        """Mosaic DMA can slice an HBM [.., r, 128] block only when r is a
        divisor or multiple of the 8-sublane tile (observed on v5e: r=6
        fails 'slice must be aligned to tiling (8)'; r in {1,2,4,8,16,...}
        work). XLA pads the minor-2 dim to the tile in HBM anyway, so
        rounding the row up costs no extra memory."""
        r = row // 128
        if r in (1, 2, 4) or r % 8 == 0:
            return row
        return ((r + 7) // 8 * 8) * 128

    def kv_row_elems(self):
        H = self.config.num_attention_heads
        if self.latent_cache:
            # On tp meshes, pad the row so its [r, 128] sublane count
            # divides tp: the runner then FEATURE-SHARDS the latent cache
            # over tp (XLA psums the score/value contractions) instead of
            # replicating it — the memory benefit the reference gets from
            # hybrid DP-attention (dp_attention.py:62), GSPMD-style.
            tp = self.mesh_ctx.tp_size if self.mesh_ctx is not None else 1
            if tp > 1:
                from ltp_sglang_tpu.utils import round_up

                self.latent_k_row = round_up(
                    self.kv_lora_rank + self.qk_rope, 128 * tp
                )
            self.latent_k_row = self._sublane_legal(self.latent_k_row)
            return self.latent_k_row, 128
        return H * self.qk_head_dim, H * self.v_head_dim

    # ------------------------------------------------------------- parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        hf = cfg.hf_config
        L, Dm = cfg.num_layers, cfg.hidden_size
        H = cfg.num_attention_heads
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (jax.random.normal(sub, shape, dtype=jnp.float32) * scale).astype(
                self.dtype
            )

        def attn_layer(nl):
            p = {
                "input_layernorm": jnp.ones((nl, Dm), dtype=self.dtype),
                "post_attention_layernorm": jnp.ones((nl, Dm), dtype=self.dtype),
                "kv_a_proj": {"kernel": w(nl, Dm, self.kv_lora_rank + self.qk_rope)},
                "kv_a_norm": jnp.ones((nl, self.kv_lora_rank), dtype=self.dtype),
                "kv_b_proj": {
                    "kernel": w(nl, self.kv_lora_rank, H * (self.qk_nope + self.v_head_dim))
                },
                "o_proj": {"kernel": w(nl, H * self.v_head_dim, Dm)},
            }
            if self.q_lora_rank:
                p["q_a_proj"] = {"kernel": w(nl, Dm, self.q_lora_rank)}
                p["q_a_norm"] = jnp.ones((nl, self.q_lora_rank), dtype=self.dtype)
                p["q_b_proj"] = {"kernel": w(nl, self.q_lora_rank, H * self.qk_head_dim)}
            else:
                p["q_proj"] = {"kernel": w(nl, Dm, H * self.qk_head_dim)}
            return p

        Ld = self.first_k_dense
        Lm = L - Ld
        I = cfg.intermediate_size
        Im = self.moe_intermediate
        E = self.n_routed_experts

        dense = attn_layer(Ld)
        dense.update(
            {
                "gate_proj": {"kernel": w(Ld, Dm, I)},
                "up_proj": {"kernel": w(Ld, Dm, I)},
                "down_proj": {"kernel": w(Ld, I, Dm)},
            }
        )
        def experts_w(K, N):
            """Dummy expert stack: bf16, or quantized leaves when the config
            carries a quantization_config (fp8 blockwise per the DeepSeek
            convention when dims divide the block, else per-channel; int8
            per-channel). Mirrors the dense proj() dummy in llama.py."""
            if self.quant_is_fp8 or self.quant_is_int8:
                key_box[0], sub = jax.random.split(key_box[0])
            if self.quant_is_int8:
                return {
                    "w8i": jax.random.randint(
                        sub, (Lm, E, K, N), -128, 128, dtype=jnp.int32
                    ).astype(jnp.int8),
                    "weight_scale": jnp.full(
                        (Lm, E, 1, N), 0.0005, dtype=jnp.float32
                    ),
                }
            if self.quant_is_fp8:
                w8 = (
                    jax.random.normal(sub, (Lm, E, K, N), dtype=jnp.float32)
                    * 4.0
                ).astype(jnp.float8_e4m3fn)
                bs = self.fp8_block
                if K % bs == 0 and N % bs == 0:
                    return {
                        "w8": w8,
                        f"weight_scale_block{bs}": jnp.full(
                            (Lm, E, K // bs, N // bs), 0.005, dtype=jnp.float32
                        ),
                    }
                return {
                    "w8": w8,
                    "weight_scale": jnp.full(
                        (Lm, E, 1, N), 0.005, dtype=jnp.float32
                    ),
                }
            return w(Lm, E, K, N)

        moe = attn_layer(Lm)
        moe.update(
            {
                "router": {"kernel": w(Lm, Dm, E)},
                "experts_gate": experts_w(Dm, Im),
                "experts_up": experts_w(Dm, Im),
                "experts_down": experts_w(Im, Dm),
            }
        )
        if self.topk_method == "noaux_tc":
            moe["e_score_bias"] = jnp.zeros((Lm, E), dtype=jnp.float32)
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
        """Multi-chip sharding: MLA attention head dims over tp (q_b/kv_b
        outputs column-sharded, o_proj row-sharded), routed experts sharded
        on the EXPERT dim over tp (consumed by moe_ffn_ep's shard_map),
        shared/dense FFN Megatron-style. Reference: EPMoE expert ranges
        (layers/moe/ep_moe/layer.py:63) + MLA TP (models/deepseek_v2.py)."""

        def attn_specs():
            p = {
                "input_layernorm": P(None, None),
                "post_attention_layernorm": P(None, None),
                "kv_a_proj": {"kernel": P(None, None, None)},
                "kv_a_norm": P(None, None),
                "kv_b_proj": {"kernel": P(None, None, "tp")},
                "o_proj": {"kernel": P(None, "tp", None)},
            }
            if self.q_lora_rank:
                p["q_a_proj"] = {"kernel": P(None, None, None)}
                p["q_a_norm"] = P(None, None)
                p["q_b_proj"] = {"kernel": P(None, None, "tp")}
            else:
                p["q_proj"] = {"kernel": P(None, None, "tp")}
            return p

        dense = attn_specs()
        dense.update(
            {
                "gate_proj": {"kernel": P(None, None, "tp")},
                "up_proj": {"kernel": P(None, None, "tp")},
                "down_proj": {"kernel": P(None, "tp", None)},
            }
        )
        moe = attn_specs()
        moe.update(
            {
                "router": {"kernel": P(None, None, None)},
                "experts_gate": P(None, "tp", None, None),
                "experts_up": P(None, "tp", None, None),
                "experts_down": P(None, "tp", None, None),
            }
        )
        if self.topk_method == "noaux_tc":
            moe["e_score_bias"] = P(None, None)
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
        L, Dm = cfg.num_layers, cfg.hidden_size
        H = cfg.num_attention_heads
        Ld = self.first_k_dense

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def lin(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight")).T

        def vec(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight"))

        def attn_stack(layer_ids):
            p = {
                "input_layernorm": np.stack([vec(i, "input_layernorm") for i in layer_ids]),
                "post_attention_layernorm": np.stack(
                    [vec(i, "post_attention_layernorm") for i in layer_ids]
                ),
                "kv_a_proj": {
                    "kernel": np.stack([lin(i, "self_attn.kv_a_proj_with_mqa") for i in layer_ids])
                },
                "kv_a_norm": np.stack([vec(i, "self_attn.kv_a_layernorm") for i in layer_ids]),
                "kv_b_proj": {"kernel": np.stack([lin(i, "self_attn.kv_b_proj") for i in layer_ids])},
                "o_proj": {"kernel": np.stack([lin(i, "self_attn.o_proj") for i in layer_ids])},
            }
            if self.q_lora_rank:
                p["q_a_proj"] = {"kernel": np.stack([lin(i, "self_attn.q_a_proj") for i in layer_ids])}
                p["q_a_norm"] = np.stack([vec(i, "self_attn.q_a_layernorm") for i in layer_ids])
                p["q_b_proj"] = {"kernel": np.stack([lin(i, "self_attn.q_b_proj") for i in layer_ids])}
            else:
                p["q_proj"] = {"kernel": np.stack([lin(i, "self_attn.q_proj") for i in layer_ids])}
            return p

        dense_ids = list(range(Ld))
        moe_ids = list(range(Ld, L))
        dense = attn_stack(dense_ids)
        if not moe_ids:
            # All-dense MLA model (minicpm3: first_k_dense_replace == L).
            # Zero-length moe stacks keep the pytree shape; the forward
            # skips the moe scan entirely so they are never traced.
            moe = jax.tree.map(lambda a: np.asarray(a)[:0], attn_stack([0]))
            # Expert dims sized 8 so the "tp"-sharded specs stay divisible
            # on multi-chip meshes (the arrays are empty either way).
            moe["router"] = {"kernel": np.zeros((0, Dm, 8), np.float32)}
            moe["experts_gate"] = np.zeros((0, 8, Dm, 8), np.float32)
            moe["experts_up"] = np.zeros((0, 8, Dm, 8), np.float32)
            moe["experts_down"] = np.zeros((0, 8, 8, Dm), np.float32)
        if dense_ids:
            dense.update(
                {
                    "gate_proj": {"kernel": np.stack([lin(i, "mlp.gate_proj") for i in dense_ids])},
                    "up_proj": {"kernel": np.stack([lin(i, "mlp.up_proj") for i in dense_ids])},
                    "down_proj": {"kernel": np.stack([lin(i, "mlp.down_proj") for i in dense_ids])},
                }
            )
        E = self.n_routed_experts
        if moe_ids:
            moe = attn_stack(moe_ids)
            moe["router"] = {
                "kernel": np.stack([lin(i, "mlp.gate") for i in moe_ids])
            }
            if self.topk_method == "noaux_tc":
                moe["e_score_bias"] = np.stack(
                    [np.asarray(get(f"model.layers.{i}.mlp.gate.e_score_correction_bias")) for i in moe_ids]
                ).astype(np.float32)

        def has(name):
            return name in weights or name.replace("model.", "", 1) in weights

        def experts(sub):
            """Stacked expert weights [Lm, E, K, N] — bf16, or quantized leaf
            dicts when the checkpoint carries fp8 (weight_scale_inv blockwise,
            DeepSeek convention / weight_scale per-channel) or int8 expert
            tensors. Consumed by moe.resolve_expert_weights."""
            name0 = f"model.layers.{moe_ids[0]}.mlp.experts.0.{sub}"
            if self.quant_is_fp8 and (
                has(f"{name0}.weight_scale_inv") or has(f"{name0}.weight_scale")
            ):
                from ltp_sglang_tpu.layers.quantization.fp8 import (
                    fp8_scale_key,
                    unpack_fp8_to_internal,
                )

                def one(i, e):
                    name = f"model.layers.{i}.mlp.experts.{e}.{sub}"
                    d = unpack_fp8_to_internal(
                        np.asarray(get(f"{name}.weight")),
                        np.asarray(get(f"{name}.weight_scale"), dtype=np.float32)
                        if has(f"{name}.weight_scale")
                        else None,
                        np.asarray(
                            get(f"{name}.weight_scale_inv"), dtype=np.float32
                        )
                        if has(f"{name}.weight_scale_inv")
                        else None,
                        block=self.fp8_block,
                    )
                    skey, bs = fp8_scale_key(d)
                    s = d[skey]
                    if bs is not None:
                        K, N = d["w8"].shape
                        kb, nb = s.shape
                        # resolve_expert_weights needs EXACT block grids
                        # (its reshape cannot crop ceil-padded scales).
                        assert kb * bs == K and nb * bs == N, (
                            f"expert fp8 block grid {s.shape} does not tile "
                            f"{d['w8'].shape} exactly (block {bs})"
                        )
                    elif s.ndim == 0:
                        d[skey] = s.reshape(1, 1)  # broadcast vs [K, N]
                    return d

                per = [[one(i, e) for e in range(E)] for i in moe_ids]
                skey, _ = fp8_scale_key(per[0][0])
                return {
                    "w8": jnp.stack(
                        [jnp.stack([d["w8"] for d in row]) for row in per]
                    ),
                    skey: jnp.stack(
                        [jnp.stack([d[skey] for d in row]) for row in per]
                    ),
                }
            if self.quant_is_int8 and has(f"{name0}.weight_scale"):
                from ltp_sglang_tpu.layers.quantization.w8a8_int8 import (
                    unpack_int8_to_internal,
                )

                def one8(i, e):
                    name = f"model.layers.{i}.mlp.experts.{e}.{sub}"
                    d = unpack_int8_to_internal(
                        np.asarray(get(f"{name}.weight")),
                        np.asarray(
                            get(f"{name}.weight_scale"), dtype=np.float32
                        ),
                    )
                    if d["weight_scale"].ndim == 0:
                        d["weight_scale"] = d["weight_scale"].reshape(1, 1)
                    return d

                per = [[one8(i, e) for e in range(E)] for i in moe_ids]
                return {
                    "w8i": jnp.stack(
                        [jnp.stack([d["w8i"] for d in row]) for row in per]
                    ),
                    "weight_scale": jnp.stack(
                        [jnp.stack([d["weight_scale"] for d in row]) for row in per]
                    ),
                }
            return np.stack(
                [
                    np.stack([lin(i, f"mlp.experts.{e}.{sub}") for e in range(E)])
                    for i in moe_ids
                ]
            )

        if moe_ids:
            moe["experts_gate"] = experts("gate_proj")
            moe["experts_up"] = experts("up_proj")
            moe["experts_down"] = experts("down_proj")
        if moe_ids and self.n_shared_experts:
            moe["shared_gate_proj"] = {
                "kernel": np.stack([lin(i, "mlp.shared_experts.gate_proj") for i in moe_ids])
            }
            moe["shared_up_proj"] = {
                "kernel": np.stack([lin(i, "mlp.shared_experts.up_proj") for i in moe_ids])
            }
            moe["shared_down_proj"] = {
                "kernel": np.stack([lin(i, "mlp.shared_experts.down_proj") for i in moe_ids])
            }

        def _to_dev_leaf(a):
            # Quantized expert leaves (fp8/int8 + f32 scales) arrive as jnp
            # arrays from experts() — keep their dtypes; raw numpy floats are
            # the dense weights and cast to the model dtype.
            if isinstance(a, jnp.ndarray):
                return a
            a = np.asarray(a)
            if a.dtype in (np.float32, np.float64):
                return jnp.asarray(a, dtype=self.dtype)
            return jnp.asarray(a)

        to_dev = lambda x: jax.tree.map(_to_dev_leaf, x)
        params = {
            "embed": {"weight": jnp.asarray(get("model.embed_tokens.weight"), dtype=self.dtype)},
            "layers_dense": to_dev(dense),
            "layers_moe": to_dev(moe),
            "norm": jnp.asarray(get("model.norm.weight"), dtype=self.dtype),
        }
        if self.topk_method == "noaux_tc" and moe_ids:
            params["layers_moe"]["e_score_bias"] = jnp.asarray(
                moe["e_score_bias"], dtype=jnp.float32
            )
        if not self.tie_word_embeddings:
            params["lm_head"] = {"kernel": jnp.asarray(np.asarray(get("lm_head.weight")).T, dtype=self.dtype)}
        return params

    # ---------------------------------------------------------------- forward

    # ------------------------------------------------- mup-style multipliers
    def _res(self, h, out):
        """Residual add with the body's residual_multiplier hook (minicpm3:
        scale_depth/sqrt(L); 1.0 for deepseek — reference minicpm3.py:331-340)."""
        rm = self.residual_multiplier
        return h + (out if rm == 1.0 else out * jnp.asarray(rm, h.dtype))

    def _embed(self, params, input_ids):
        hidden = params["embed"]["weight"][input_ids]
        if self.embed_multiplier != 1.0:
            hidden = hidden * jnp.asarray(self.embed_multiplier, hidden.dtype)
        return hidden

    def _attention(self, lp, h, step: StepArrays, kc, vc, li):
        cfg = self.config
        B, E = step.input_ids.shape
        H = cfg.num_attention_heads

        normed = rms_norm(h, lp["input_layernorm"], self.rms_eps)
        if self.q_lora_rank:
            qa = apply_linear(lp["q_a_proj"], normed)
            qa = rms_norm(qa, lp["q_a_norm"], self.rms_eps)
            q = apply_linear(lp["q_b_proj"], qa)
        else:
            q = apply_linear(lp["q_proj"], normed)
        q = q.reshape(B, E, H, self.qk_head_dim)
        q_nope, q_rope = q[..., : self.qk_nope], q[..., self.qk_nope :]

        kva = apply_linear(lp["kv_a_proj"], normed)  # [B,E, lora+rope]
        kv_lora = rms_norm(kva[..., : self.kv_lora_rank], lp["kv_a_norm"], self.rms_eps)
        k_rope = kva[..., self.kv_lora_rank :][:, :, None, :]  # [B,E,1,rope]

        kv = apply_linear(lp["kv_b_proj"], kv_lora).reshape(
            B, E, H, self.qk_nope + self.v_head_dim
        )
        k_nope, v = kv[..., : self.qk_nope], kv[..., self.qk_nope :]

        q_rope, k_rope = apply_rope(q_rope, k_rope, step.positions, self.cos_sin_cache)
        if self.latent_cache:
            return self._attention_absorbed(
                lp, h, step, kc, vc, li, q_nope, q_rope, kv_lora, k_rope
            )
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_rope, (B, E, H, self.qk_rope))], axis=-1
        )
        q = jnp.concatenate([q_nope, q_rope], axis=-1)

        cache_locs_flat = step.cache_locs.reshape(-1)
        k_st, v_st, q_att, vsc = self._kv_quantize(
            lp, kc.dtype,
            k.reshape(-1, H, self.qk_head_dim),
            v.reshape(-1, H, self.v_head_dim),
            q,
        )
        kc, vc = self.kv_write(
            kc, vc, li, cache_locs_flat, k_st, v_st,
            jnp.asarray(B * E, jnp.int32),
        )
        Cw = step.kv_indices.shape[1]
        k_pages = kc[li, step.kv_indices].reshape(B, Cw, H, self.qk_head_dim)
        v_pages = vc[li, step.kv_indices].reshape(B, Cw, H, self.v_head_dim)
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
            sliding_window=0,
            tree_mask=step.spec_mask,  # NEXTN tree verify (eagle_tree.py)
        )
        if vsc is not None:
            attn_out = (attn_out.astype(jnp.float32) * vsc).astype(h.dtype)
        out = apply_linear(lp["o_proj"], attn_out.reshape(B, E, H * self.v_head_dim))
        return self._res(h, out), kc, vc

    def _attention_absorbed(self, lp, h, step, kc, vc, li,
                            q_nope, q_rope, kv_lora, k_rope):
        """MQA over the latent cache with kv_b absorbed into the query and
        the output (reference forward_absorb_prepare/core): scores use
        q_nope @ W_kc in latent space against the cached [latent | k_pe]
        row; the value IS the latent, expanded per head by W_vc after."""
        from ltp_sglang_tpu.models.llama import kv_is_fp8

        cfg = self.config
        B, E = step.input_ids.shape
        H = cfg.num_attention_heads
        R = self.kv_lora_rank
        pad = self.latent_k_row - R - self.qk_rope

        krow = jnp.concatenate(
            [kv_lora, k_rope[:, :, 0, :]]
            + ([jnp.zeros((B, E, pad), kv_lora.dtype)] if pad else []),
            axis=-1,
        )  # [B, E, latent_k_row]
        one = jnp.float32(1.0)
        if kv_is_fp8(kc.dtype):
            ks = lp["k_scale"].astype(jnp.float32) if "k_scale" in lp else one
            k_st = (krow.astype(jnp.float32) / ks).reshape(
                B * E, 1, -1
            ).astype(kc.dtype)
            out_scale = ks
        else:
            ks = None
            k_st = krow.reshape(B * E, 1, -1).astype(kc.dtype)
            out_scale = None
        v_st = jnp.zeros((B * E, 1, 128), vc.dtype)
        kc, vc = self.kv_write(
            kc, vc, li, step.cache_locs.reshape(-1), k_st, v_st,
            jnp.asarray(B * E, jnp.int32),
        )

        # Absorb kv_b's K half into the query (one einsum per layer).
        w_kv = lp["kv_b_proj"]["kernel"].reshape(
            R, H, self.qk_nope + self.v_head_dim
        )
        q_lat = jnp.einsum(
            "behn,khn->behk", q_nope, w_kv[..., : self.qk_nope],
            preferred_element_type=jnp.float32,
        ).astype(q_nope.dtype)
        q_cat = jnp.concatenate([q_lat, q_rope], axis=-1)  # [B,E,H,R+rope]
        if ks is not None:
            q_cat = (q_cat.astype(jnp.float32) * ks).astype(q_cat.dtype)

        Cw = step.kv_indices.shape[1]
        P = getattr(self, "mla_kernel_page_size", 0)
        if E == 1 and P and Cw % P == 0 and step.spec_mask is None:
            # Decode fast path: the Pallas latent-MQA kernel streams pages
            # HBM -> VMEM once (ops/attention/pallas_mla_decode.py) instead
            # of the three-pass XLA gather below. Page ids from the slot
            # table (slots are page-contiguous under the paged allocator).
            from ltp_sglang_tpu.ops.attention.pallas_mla_decode import (
                mla_paged_decode_attention,
            )

            pg = step.kv_indices[:, ::P] // P
            attn = mla_paged_decode_attention(
                q_cat[:, 0], kc, li, pg, step.seq_lens,
                page_size=P, sm_scale=self.sm_scale,
            )[..., :R].astype(q_cat.dtype)[:, None]  # [B, 1, H, R]
        else:
            pages = kc[li, step.kv_indices].reshape(B, Cw, self.latent_k_row)
            k_cat = pages[..., : R + self.qk_rope][:, :, None, :]
            v_lat = pages[..., :R][:, :, None, :]
            if ks is not None:
                k_cat = k_cat.astype(q_cat.dtype)
                v_lat = v_lat.astype(q_cat.dtype)
            attn = self.attn_impl(
                q_cat, k_cat, v_lat, step.kv_indices, step.seq_lens,
                step.prefix_lens, self.sm_scale, sliding_window=0,
                tree_mask=step.spec_mask,  # NEXTN tree verify
            )  # [B, E, H, R]
        if out_scale is not None:
            attn = (attn.astype(jnp.float32) * out_scale).astype(h.dtype)
        out_h = jnp.einsum(
            "behk,khv->behv", attn, w_kv[..., self.qk_nope :],
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        out = apply_linear(lp["o_proj"], out_h.reshape(B, E, H * self.v_head_dim))
        return self._res(h, out), kc, vc

    def _moe_mlp(self, lp, normed, tok_valid=None):
        B, E_, Dm = normed.shape
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"], preferred_element_type=jnp.float32
        )
        bias = lp.get("e_score_bias") if self.topk_method == "noaux_tc" else None
        w, idx = moe_topk(
            logits,
            self.top_k,
            self.norm_topk_prob,
            scoring=self.scoring,
            routed_scaling_factor=self.routed_scaling_factor,
            e_score_bias=bias,
            valid=None if tok_valid is None else tok_valid.reshape(-1),
            layer_tag=lp.get("moe_layer_idx"),
            n_group=self.n_group,
            topk_group=self.topk_group,
        )
        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            # Batch-level TBO already split the batch; a second token-level
            # split inside the layer would fragment the a2a for nothing.
            tbo=(getattr(self, "moe_tbo", False)
                 and not getattr(self, "_in_batch_tbo", False)),
            expert_perm=lp.get("expert_perm"),
        )
        if self.n_shared_experts:
            g = apply_linear(lp["shared_gate_proj"], x)
            u = apply_linear(lp["shared_up_proj"], x)
            out = out + apply_linear(lp["shared_down_proj"], jax.nn.silu(g) * u)
        return out.reshape(B, E_, Dm)

    def forward_window_token_paged(
        self, params, tok, pos, k_cache, v_cache, pages, seq_lens, slot_t,
        page_size,
    ):
        """One decode step over the live paged latent cache for the K-step
        window driver (model_runner._build_window_fn_paged). Synthesizes an
        E=1 StepArrays whose kv_indices expand the window's page ids; the
        E==1 branch of _attention_absorbed then routes attention through the
        Pallas latent-MQA kernel (the runner only enables this path when
        mla_kernel_page_size is set), so the per-token whole-page gather
        that kept deepseek decode on the slow path never materializes."""
        B = tok.shape[0]
        P = page_size
        Cp = pages.shape[1]
        kv_indices = (
            pages[:, :, None] * P
            + jnp.arange(P, dtype=jnp.int32)[None, None, :]
        ).reshape(B, Cp * P)
        step = StepArrays(
            input_ids=tok[:, None],
            positions=pos[:, None],
            cache_locs=slot_t[:, None],
            seq_lens=seq_lens,
            prefix_lens=jnp.maximum(seq_lens - 1, 0),
            extend_lens=jnp.ones((B,), jnp.int32),
            kv_indices=kv_indices,
            lora_ids=None,
        )
        return self.forward(params, step, k_cache, v_cache)

    def forward(self, params, step: StepArrays, k_cache, v_cache, all_logits=False,
                lora=None, return_hidden=False):
        cfg = self.config
        B, E = step.input_ids.shape
        if (
            getattr(self, "moe_tbo", False)
            and not getattr(self, "_in_batch_tbo", False)
            and B >= 2
            and (E > 1 or B >= 16)  # a2a big enough to be worth hiding
            and self.n_routed_experts
            and cfg.num_layers - self.first_k_dense >= 2
        ):
            # Batch-level two-batch overlap (reference two_batch_overlap.py:
            # 53-370 + operations_strategy.py): see _forward_tbo.
            return self._forward_tbo(
                params, step, k_cache, v_cache, all_logits, return_hidden
            )
        hidden = self._embed(params, step.input_ids)

        def dense_body(carry, xs):
            h, kc, vc = carry
            lp, li = xs
            h, kc, vc = self._attention(lp, h, step, kc, vc, li)
            normed = rms_norm(h, lp["post_attention_layernorm"], self.rms_eps)
            gate = apply_linear(lp["gate_proj"], normed)
            up = apply_linear(lp["up_proj"], normed)
            h = self._res(h, apply_linear(lp["down_proj"], jax.nn.silu(gate) * up))
            return (h, kc, vc), None

        def moe_body(carry, xs):
            h, kc, vc = carry
            lp, li = xs
            h, kc, vc = self._attention(lp, h, step, kc, vc, li)
            normed = rms_norm(h, lp["post_attention_layernorm"], self.rms_eps)
            tok_valid = (
                jnp.arange(normed.shape[1], dtype=jnp.int32)[None, :]
                < step.extend_lens[:, None]
            )
            h = self._res(h, self._moe_mlp(lp, normed, tok_valid))
            return (h, kc, vc), None

        Ld = self.first_k_dense
        carry = (hidden, k_cache, v_cache)
        if Ld > 0:
            carry, _ = jax.lax.scan(
                dense_body, carry, (params["layers_dense"], jnp.arange(Ld, dtype=jnp.int32))
            )
        if cfg.num_layers - Ld > 0:
            carry, _ = jax.lax.scan(
                moe_body,
                carry,
                (
                    params["layers_moe"],
                    jnp.arange(Ld, cfg.num_layers, dtype=jnp.int32),
                ),
            )
        hidden, k_cache, v_cache = carry

        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        if return_hidden:
            return hidden, k_cache, v_cache
        logits = self._lm_head(params, hidden, step, all_logits)
        return logits, k_cache, v_cache

    # ------------------------------------------------- batch-level TBO
    @staticmethod
    def _slice_step(step: StepArrays, lo: int, hi: int) -> StepArrays:
        # Every StepArrays field is batch-leading; slice them all so
        # optional arrays (spec_mask, mm_embeds, pages...) survive the split.
        sl = lambda a: None if a is None else a[lo:hi]
        return step._replace(
            **{f: sl(getattr(step, f)) for f in step._fields}
        )

    def _forward_tbo(self, params, step: StepArrays, k_cache, v_cache,
                     all_logits, return_hidden):
        """Batch-level two-batch overlap (reference two_batch_overlap.py:53-370
        + operations_strategy.py:1-211, redesigned for XLA): the batch splits
        into two micro-batches and the MoE layer stack runs STAGGERED — one
        pipeline step computes micro-batch 0's layer i and micro-batch 1's
        layer i-1. Inside that step mb0's dispatch/combine all-to-alls and
        mb1's attention + expert GEMMs are independent dataflow (mb1 only
        depends on mb0 through the cheap KV row write), so XLA's
        latency-hiding scheduler overlaps the a2a with compute — the overlap
        the reference hand-schedules with its operations list. The per-layer
        token-split TBO (moe_ffn_auto tbo=) is disabled underneath to avoid
        double-splitting. Dense layers (no a2a) run unstaggered."""
        cfg = self.config
        B, E = step.input_ids.shape
        Ld = self.first_k_dense
        Lm = cfg.num_layers - Ld
        hidden = self._embed(params, step.input_ids)

        self._in_batch_tbo = True
        try:
            def dense_body(carry, xs):
                h, kc, vc = carry
                lp, li = xs
                h, kc, vc = self._attention(lp, h, step, kc, vc, li)
                normed = rms_norm(h, lp["post_attention_layernorm"], self.rms_eps)
                gate = apply_linear(lp["gate_proj"], normed)
                up = apply_linear(lp["up_proj"], normed)
                h = self._res(h, apply_linear(lp["down_proj"], jax.nn.silu(gate) * up))
                return (h, kc, vc), None

            carry = (hidden, k_cache, v_cache)
            if Ld > 0:
                carry, _ = jax.lax.scan(
                    dense_body, carry,
                    (params["layers_dense"], jnp.arange(Ld, dtype=jnp.int32)),
                )
            hidden, k_cache, v_cache = carry

            half = B // 2
            step0 = self._slice_step(step, 0, half)
            step1 = self._slice_step(step, half, B)
            h0, h1 = hidden[:half], hidden[half:]
            moe = params["layers_moe"]

            def moe_layer_half(li_moe, h, sstep, kc, vc):
                lp = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, li_moe, axis=0, keepdims=False
                    ),
                    moe,
                )
                li = Ld + li_moe
                h, kc, vc = self._attention(lp, h, sstep, kc, vc, li)
                normed = rms_norm(
                    h, lp["post_attention_layernorm"], self.rms_eps
                )
                tok_valid = (
                    jnp.arange(normed.shape[1], dtype=jnp.int32)[None, :]
                    < sstep.extend_lens[:, None]
                )
                return self._res(h, self._moe_mlp(lp, normed, tok_valid)), kc, vc

            # Pipeline: prologue (mb0 layer 0), steady state (mb0 layer i,
            # mb1 layer i-1), epilogue (mb1 layer Lm-1). Peeling avoids both
            # wasted masked steps and lax.cond scheduling barriers.
            h0, k_cache, v_cache = moe_layer_half(
                jnp.int32(0), h0, step0, k_cache, v_cache
            )

            def body(i, carry):
                h0, h1, kc, vc = carry
                h0, kc, vc = moe_layer_half(i, h0, step0, kc, vc)
                h1, kc, vc = moe_layer_half(i - 1, h1, step1, kc, vc)
                return h0, h1, kc, vc

            h0, h1, k_cache, v_cache = jax.lax.fori_loop(
                1, Lm, body, (h0, h1, k_cache, v_cache)
            )
            h1, k_cache, v_cache = moe_layer_half(
                jnp.int32(Lm - 1), h1, step1, k_cache, v_cache
            )
            hidden = jnp.concatenate([h0, h1], axis=0)
        finally:
            self._in_batch_tbo = False

        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        if return_hidden:
            return hidden, k_cache, v_cache
        logits = self._lm_head(params, hidden, step, all_logits)
        return logits, k_cache, v_cache
