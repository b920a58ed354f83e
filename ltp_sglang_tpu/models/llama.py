"""Llama-family model (Llama 2/3, and the template for most dense models).

Functional TPU-first redesign of the reference implementation
(python/sglang/srt/models/llama.py:61-484). Differences by design:

- Parameters are a pytree with *stacked* layer leaves ([L, ...]) consumed by a
  `lax.scan` over layers — one compiled layer body instead of 32 unrolled
  modules, which keeps compile times flat across the jit bucket ladder.
- No ColumnParallel/RowParallel classes: tensor parallelism is expressed as
  `PartitionSpec`s on the stacked leaves (param_specs()); XLA inserts the
  all-reduces the reference issues manually after o_proj/down_proj.
- Attention runs against the paged KV cache through a pluggable kernel with
  the same contract as the reference attention backends (SURVEY B.2).

Weight checkpoint names follow HF llama (model.layers.N.self_attn.q_proj...),
converted by convert_hf_weights (reference mapping: models/llama.py:574-631).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.activation import silu_and_mul
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention
from ltp_sglang_tpu.ops.kv_cache_ops import kv_write_pallas, kv_write_xla
from ltp_sglang_tpu.utils.dtypes import to_jnp_dtype


def kv_is_fp8(dtype) -> bool:
    """True for fp8 KV-cache dtypes (scaled storage path)."""
    return jnp.dtype(dtype) in (
        jnp.dtype(jnp.float8_e4m3fn),
        jnp.dtype(jnp.float8_e5m2),
    )


class StepArrays(NamedTuple):
    """Device-side step input (one bucket's padded arrays)."""

    input_ids: jnp.ndarray  # [B, E] int32
    positions: jnp.ndarray  # [B, E] int32
    cache_locs: jnp.ndarray  # [B, E] int32 (0 = garbage slot for pads)
    seq_lens: jnp.ndarray  # [B] int32
    prefix_lens: jnp.ndarray  # [B] int32
    extend_lens: jnp.ndarray  # [B] int32
    kv_indices: jnp.ndarray  # [B, C] int32
    lora_ids: jnp.ndarray = None  # [B] int32 adapter ids (0 = none); optional
    pages: jnp.ndarray = None  # [B, Cp] int32 page ids; set when the Pallas
    #                            ragged extend kernel is engaged (page_size>1)
    spec_mask: jnp.ndarray = None  # [B, E, E] bool: EAGLE tree-verify
    #                                visibility (ancestor-or-self), XLA path
    mm_embeds: jnp.ndarray = None  # [B, E, Dm] projected multimodal embeds
    mm_mask: jnp.ndarray = None  # [B, E] bool: positions taken from mm_embeds
    req_rows: jnp.ndarray = None  # [B] int32 request-pool rows (SWA rings)


class LlamaForCausalLM:
    # Int4 q/k/v + gate/up column fusion (int4.fuse_quant_projections) is
    # valid for any model whose layer body goes through this class's lin()
    # dispatch; models with custom forwards opt out.
    supports_quant_fusion = True
    # Pipeline parallelism needs this class's forward (input_embeds /
    # pp_raw_hidden hooks); models with custom forwards opt out.
    supports_pp = True
    has_bias = False  # qwen2 subclass sets qkv bias
    has_qk_norm = False  # qwen3 subclass: per-head RMS norm on q/k before RoPE
    qk_norm_post_rope = False  # hunyuan: per-head RMS norm on q/k AFTER RoPE
    has_attn_sinks = False  # gpt-oss: per-head learnable softmax sink logits

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        self.config = config
        self.dtype = to_jnp_dtype(config.dtype)
        if kv_write_impl is None:
            kv_write_impl = (
                kv_write_pallas if jax.default_backend() == "tpu" else kv_write_xla
            )
        self.kv_write = kv_write_impl
        hf = config.hf_config
        self.rms_eps = hf.get("rms_norm_eps", 1e-6)
        self.rope_theta = hf.get("rope_theta", 10000.0)
        self.rope_scaling = hf.get("rope_scaling")
        self.tie_word_embeddings = hf.get("tie_word_embeddings", False)
        self.attn_impl = attn_impl or ref_paged_attention
        # Multi-chip: the runner injects a shard_map-wrapped paged-attention
        # kernel (ops/sharded_ops.py); None = call the plain kernel.
        self.paged_attn = None
        self.extend_attn = None  # set by ModelRunner when the layout allows
        self.mesh_ctx = None
        # Double sparsity (set by ModelRunner when enable_double_sparsity):
        # ds_cfg = {"r", "heavy_k", "threshold"}, ds_channels [L, Hkv, r].
        self.ds_cfg = None
        self.ds_channels = None
        self.sm_scale = config.head_dim**-0.5
        # Weight-only quantization (awq/gptq): projections carry packed
        # int4 leaves instead of dense kernels (layers/quantization).
        self.quant = (
            config.quantization
            if config.quantization
            in ("awq", "awq_marlin", "gptq", "gptq_marlin", "fp8",
                "compressed-tensors", "w8a8_fp8", "w8a8_int8", "int8")
            else None
        )
        # FP8 (weight fp8 + scales; layers/quantization/fp8.py) vs INT4
        # (packed nibbles) vs W8A8-INT8 take different param leaves.
        qc = config.quant_config or {}
        ct_int8 = False
        if self.quant == "compressed-tensors":
            # compressed-tensors checkpoints (reference layers/quantization/
            # compressed_tensors/compressed_tensors.py:77 target_scheme_map):
            # config_groups announce the weight scheme — num_bits=8
            # type="int" routes to the int8-MXU path (w8a8_int8.py), float
            # to the fp8 path. The "ignore" list needs no handling here:
            # convert_hf_weights keeps any leaf without scales dense.
            groups = qc.get("config_groups") or {}
            for g in groups.values():
                w = (g or {}).get("weights") or {}
                if int(w.get("num_bits", 8)) == 8 and w.get("type") == "int":
                    ct_int8 = True
                elif int(w.get("num_bits", 8)) != 8:
                    raise NotImplementedError(
                        f"compressed-tensors num_bits={w.get('num_bits')}: "
                        "only 8-bit int/float schemes are supported"
                    )
        self.quant_is_fp8 = (
            self.quant in ("fp8", "w8a8_fp8")
            or (self.quant == "compressed-tensors" and not ct_int8)
        )
        self.quant_is_int8 = self.quant in ("w8a8_int8", "int8") or ct_int8
        self.quant_group_size = int(qc.get("group_size", 128))
        wbs = qc.get("weight_block_size")
        self.fp8_block = int(wbs[0]) if wbs else 128
        self.quant_format = (
            "gptq_v2" if qc.get("checkpoint_format") == "gptq_v2" else "gptq"
        )
        self.sliding_window = 0
        # Subclass hooks: gemma scales embeddings; starcoder2-style models
        # use LayerNorm instead of RMSNorm (override norm()).
        self.embed_multiplier = 1.0
        # --- family knobs (reference models/{olmo,olmo2,granite,cohere,glm4,
        # smollm3}.py are all llama bodies modulo these) ---
        self.clip_qkv = None  # olmo: clamp q/k/v post-projection
        self.qk_norm_full = False  # olmo2: RMS over the FULL q/k width pre-rope
        self.qk_norm_fn = None  # cohere: callable(x[B,..,H,D], w) pre-rope
        # Block-norm placement: "pre" (llama), "post_out" (olmo2: norm on the
        # block OUTPUT, no pre-norm), "sandwich" (glm4: pre-norm AND output
        # norm), "parallel" (cohere: one pre-norm feeds attn+mlp, summed).
        self.norm_style = "pre"
        self.residual_multiplier = 1.0  # granite
        self.logits_multiplier = 1.0  # cohere logit_scale / granite 1/scaling
        self.rope_style = "neox"  # "gptj" (cohere) | "glm" (layers/rotary.py)
        self.rope_layer_on = None  # smollm3: [L] 0/1 rope toggle per layer
        # Hybrid local/global attention (exaone4/olmo3/gemma3 layer_types):
        # [L] per-layer window (>= context_len = global layer), masked over
        # full-length KV in this forward. (gemma2's custom forward instead
        # pairs layer_windows with per-request ring pools — swa_pool_capable.)
        self.layer_windows = None
        # [L] bool: layer uses cos_sin_cache_local (olmo3: unscaled rope on
        # sliding layers; gemma3: rope_local_base_freq) instead of the main
        # (scaled/global) cache.
        self.rope_local_layer = None
        self.cos_sin_cache_local = None
        self.pos_embed_mode = None  # "learned" (gpt2) | "learned_opt" (+2)
        self.lm_head_bias = False  # gptj/phi: bias on the output head
        self.alibi_slopes = None  # [Hq] f32 (bloom/mpt); XLA attention only
        self.attn_logit_cap = 0.0  # grok: tanh score softcap, all attn paths
        # DP-attention (reference layers/dp_attention.py:62-366): attention
        # runs data-parallel over the "dp" groups (tp-sharded heads inside a
        # group) while the MLP is tensor-parallel over the UNION dp x tp —
        # expressed here as MLP weights sharded on the flattened ("dp","tp")
        # axis (param_specs below); XLA inserts the dp gather/scatter the
        # reference issues manually. Set by ModelRunner from
        # --enable-dp-attention.
        self.dp_attention_mlp = False
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim,
            config.context_len,
            base=self.rope_theta,
            rope_scaling=self.rope_scaling,
        )

    # ------------------------------------------------------------- parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random (dummy-loader) initialization, reference DummyModelLoader
        (model_loader/loader.py:531)."""
        cfg = self.config
        L, Dm, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        # Device-side init: host RNG + H2D for billions of params is far too
        # slow (and the driver bench runs through a network-attached chip).
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (jax.random.normal(sub, shape, dtype=jnp.float32) * scale).astype(
                self.dtype
            )

        def proj(K, N):
            """Dense or (dummy) quantized projection params."""
            if not self.quant:
                return {"kernel": w(K, N)}
            key_box[0], sub = jax.random.split(key_box[0])
            if self.quant_is_int8:
                return {
                    "w8i": jax.random.randint(
                        sub, (K, N), -128, 128, dtype=jnp.int32
                    ).astype(jnp.int8),
                    "weight_scale": jnp.full((1, N), 0.0005, dtype=jnp.float32),
                }
            if self.quant_is_fp8:
                return {
                    "w8": (
                        jax.random.normal(sub, (K, N), dtype=jnp.float32) * 4.0
                    ).astype(jnp.float8_e4m3fn),
                    "weight_scale": jnp.full((1, N), 0.005, dtype=jnp.float32),
                }
            G = self.quant_group_size
            # Scales/zeros stored f32: the fused kernel DMAs them raw and a
            # per-call astype would materialize the whole stacked array.
            return {
                "w4": jax.random.randint(sub, (K // 2, N), -128, 128, dtype=jnp.int32)
                .astype(jnp.int8),
                "scales": jnp.full((K // G, N), 0.005, dtype=jnp.float32),
                "zeros": jnp.full((K // G, N), 8.0, dtype=jnp.float32),
            }

        def stack_proj(K, N):
            parts = [proj(K, N) for _ in range(L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *parts)

        layers = {
            "input_layernorm": jnp.ones((L, Dm), dtype=self.dtype),
            "post_attention_layernorm": jnp.ones((L, Dm), dtype=self.dtype),
            # FP8/INT8 KV-cache scales (reference kv_cache.py:19-62); 1.0
            # unless the checkpoint provides calibrated scales.
            "k_scale": jnp.ones((L,), dtype=jnp.float32),
            "v_scale": jnp.ones((L,), dtype=jnp.float32),
            "q_proj": stack_proj(Dm, Hq * D),
            "k_proj": stack_proj(Dm, Hkv * D),
            "v_proj": stack_proj(Dm, Hkv * D),
            "o_proj": stack_proj(Hq * D, Dm),
            "gate_proj": stack_proj(Dm, I),
            "up_proj": stack_proj(Dm, I),
            "down_proj": stack_proj(I, Dm),
        }
        if self.has_bias:
            layers["q_proj"]["bias"] = jnp.zeros((L, Hq * D), dtype=self.dtype)
            layers["k_proj"]["bias"] = jnp.zeros((L, Hkv * D), dtype=self.dtype)
            layers["v_proj"]["bias"] = jnp.zeros((L, Hkv * D), dtype=self.dtype)
        params = {
            "embed": {"weight": w(cfg.vocab_size, Dm)},
            "layers": layers,
            "norm": jnp.ones((Dm,), dtype=self.dtype),
        }
        if not self.tie_word_embeddings:
            params["lm_head"] = {"kernel": w(Dm, cfg.vocab_size)}
        return params

    def param_specs(self) -> Dict[str, Any]:
        """PartitionSpecs over mesh axes ("dp", "tp"): head/ffn dims sharded on
        tp (the ColumnParallel/RowParallel translation, layers/linear.py).
        With dp_attention_mlp the MLP shards over the union ("dp","tp")."""
        mlp_tp = ("dp", "tp") if self.dp_attention_mlp else "tp"
        layer_specs = {
            "input_layernorm": P(None, None),
            "post_attention_layernorm": P(None, None),
            "k_scale": P(None),
            "v_scale": P(None),
            "q_proj": {"kernel": P(None, None, "tp")},
            "k_proj": {"kernel": P(None, None, "tp")},
            "v_proj": {"kernel": P(None, None, "tp")},
            "o_proj": {"kernel": P(None, "tp", None)},
            "gate_proj": {"kernel": P(None, None, mlp_tp)},
            "up_proj": {"kernel": P(None, None, mlp_tp)},
            "down_proj": {"kernel": P(None, mlp_tp, None)},
        }
        if self.has_bias:
            layer_specs["q_proj"]["bias"] = P(None, "tp")
            layer_specs["k_proj"]["bias"] = P(None, "tp")
            layer_specs["v_proj"]["bias"] = P(None, "tp")
        specs = {
            "embed": {"weight": P("tp", None)},
            "layers": layer_specs,
            "norm": P(None),
        }
        if not self.tie_word_embeddings:
            specs["lm_head"] = {"kernel": P(None, "tp")}
        return specs

    # ------------------------------------------------------------ hf weights
    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Stack per-layer HF tensors into the scan layout. HF linear weights
        are [out, in]; ours are [in, out]."""
        cfg = self.config
        L = cfg.num_layers

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def has(name):
            return name in weights or name.replace("model.", "", 1) in weights

        def stack_linear(sub):
            """Dense or quantized projection -> stacked param dict."""
            if self.quant_is_int8 and has(f"model.layers.0.{sub}.weight_scale"):
                from ltp_sglang_tpu.layers.quantization.w8a8_int8 import (
                    unpack_int8_to_internal,
                )

                per_layer = [
                    unpack_int8_to_internal(
                        np.asarray(get(f"model.layers.{i}.{sub}.weight")),
                        np.asarray(
                            get(f"model.layers.{i}.{sub}.weight_scale"),
                            dtype=np.float32,
                        ),
                    )
                    for i in range(L)
                ]
                return {
                    "w8i": jnp.stack([d["w8i"] for d in per_layer]),
                    "weight_scale": jnp.stack(
                        [d["weight_scale"] for d in per_layer]
                    ),
                }
            if self.quant_is_fp8 and (
                has(f"model.layers.0.{sub}.weight_scale")
                or has(f"model.layers.0.{sub}.weight_scale_inv")
            ):
                from ltp_sglang_tpu.layers.quantization.fp8 import (
                    fp8_scale_key,
                    unpack_fp8_to_internal,
                )

                per_layer = []
                for i in range(L):
                    name = f"model.layers.{i}.{sub}"
                    per_layer.append(
                        unpack_fp8_to_internal(
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
                    )
                skey, _ = fp8_scale_key(per_layer[0])
                return {
                    "w8": jnp.stack([d["w8"] for d in per_layer]),
                    skey: jnp.stack([d[skey] for d in per_layer]),
                }
            if self.quant and has(f"model.layers.0.{sub}.qweight"):
                from ltp_sglang_tpu.layers.quantization.int4 import (
                    unpack_awq_to_internal,
                    unpack_gptq_to_internal,
                )

                per_layer = []
                for i in range(L):
                    qw = np.asarray(get(f"model.layers.{i}.{sub}.qweight"))
                    qz = np.asarray(get(f"model.layers.{i}.{sub}.qzeros"))
                    sc = np.asarray(
                        get(f"model.layers.{i}.{sub}.scales"), dtype=np.float32
                    )
                    if self.quant.startswith("awq"):
                        per_layer.append(unpack_awq_to_internal(qw, qz, sc))
                    else:
                        g_idx = (
                            np.asarray(get(f"model.layers.{i}.{sub}.g_idx"))
                            if has(f"model.layers.{i}.{sub}.g_idx")
                            else None
                        )
                        per_layer.append(
                            unpack_gptq_to_internal(
                                qw, qz, sc, g_idx, self.quant_format
                            )
                        )
                out = {
                    "w4": jnp.asarray(np.stack([d["w4"] for d in per_layer])),
                    # f32 on purpose (see init_params proj()).
                    "scales": jnp.asarray(
                        np.stack([d["scales"] for d in per_layer]),
                        dtype=jnp.float32,
                    ),
                    "zeros": jnp.asarray(
                        np.stack([d["zeros"] for d in per_layer]),
                        dtype=jnp.float32,
                    ),
                }
                if "perm" in per_layer[0]:
                    out["perm"] = jnp.asarray(np.stack([d["perm"] for d in per_layer]))
                return out
            return {
                "kernel": jnp.asarray(
                    np.stack(
                        [
                            np.asarray(get(f"model.layers.{i}.{sub}.weight")).T
                            for i in range(L)
                        ]
                    ),
                    dtype=self.dtype,
                )
            }

        def stack_vec(sub, field="weight"):
            return jnp.asarray(
                np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.{field}")) for i in range(L)]
                ),
                dtype=self.dtype,
            )

        def kv_scale(which):
            """Per-layer k/v cache scales; several checkpoint conventions
            (maybe_remap_kv_scale_name, weight_utils.py:784)."""
            vals = []
            for i in range(L):
                cands = [
                    f"model.layers.{i}.self_attn.{which}_scale",
                    f"model.layers.{i}.self_attn.attn.{which}_scale",
                    f"model.layers.{i}.self_attn.kv_scale",
                ]
                v = 1.0
                for c in cands:
                    if has(c):
                        v = float(np.asarray(get(c)).reshape(()))
                        break
                vals.append(v)
            return jnp.asarray(vals, dtype=jnp.float32)

        layers = {
            "input_layernorm": stack_vec("input_layernorm"),
            "post_attention_layernorm": stack_vec("post_attention_layernorm"),
            "k_scale": kv_scale("k"),
            "v_scale": kv_scale("v"),
            "q_proj": stack_linear("self_attn.q_proj"),
            "k_proj": stack_linear("self_attn.k_proj"),
            "v_proj": stack_linear("self_attn.v_proj"),
            "o_proj": stack_linear("self_attn.o_proj"),
            "gate_proj": stack_linear("mlp.gate_proj"),
            "up_proj": stack_linear("mlp.up_proj"),
            "down_proj": stack_linear("mlp.down_proj"),
        }
        if self.has_bias:
            layers["q_proj"]["bias"] = stack_vec("self_attn.q_proj", "bias")
            layers["k_proj"]["bias"] = stack_vec("self_attn.k_proj", "bias")
            layers["v_proj"]["bias"] = stack_vec("self_attn.v_proj", "bias")

        params = {
            "embed": {
                "weight": jnp.asarray(get("model.embed_tokens.weight"), dtype=self.dtype)
            },
            "layers": layers,
            "norm": jnp.asarray(get("model.norm.weight"), dtype=self.dtype),
        }
        if not self.tie_word_embeddings:
            params["lm_head"] = {
                "kernel": jnp.asarray(
                    np.asarray(get("lm_head.weight")).T, dtype=self.dtype
                )
            }
        return params

    # -------------------------------------------------------- quant leaves
    def _split_quant_leaves(self, layers):
        """Split layer params into (scan_xs, stacked_quant_or_None).

        INT4 leaves stay OUT of the lax.scan xs and are indexed inside the
        Pallas kernel by layer id: a slice cannot fuse into a custom-call
        operand, so scanning them copies every layer's packed weights each
        step (traced at ~35% of a quantized decode step)."""
        quant = {
            k: v for k, v in layers.items() if isinstance(v, dict) and "w4" in v
        }
        if not quant:
            return layers, None
        return {k: v for k, v in layers.items() if k not in quant}, quant

    # ------------------------------------------------------------- fp8 KV
    def _kv_quantize(self, lp, cache_dtype, k, v, q):
        """Scaled fp8 KV storage (reference memory_pool.py:369-407 scale-on-
        write + kv_cache.py:19-62 checkpoint scales): stored k = k / k_scale.

        Dequant never materializes: scores need (q · k*ks) = ks·(q · k_q),
        so k_scale folds into q; the output needs probs·(v*vs) = vs·(probs·v_q),
        so the caller multiplies the attention output by the returned v_scale.
        Softmax sees true dequantized scores either way (ks applied pre-max).

        Returns (k_store, v_store, q_scaled, v_scale_or_None)."""
        if not kv_is_fp8(cache_dtype):
            return k.astype(cache_dtype), v.astype(cache_dtype), q, None
        one = jnp.float32(1.0)
        ks = lp["k_scale"].astype(jnp.float32) if "k_scale" in lp else one
        vs = lp["v_scale"].astype(jnp.float32) if "v_scale" in lp else one
        k_q = (k.astype(jnp.float32) / ks).astype(cache_dtype)
        v_q = (v.astype(jnp.float32) / vs).astype(cache_dtype)
        q_s = (q.astype(jnp.float32) * ks).astype(q.dtype)
        return k_q, v_q, q_s, vs

    # --------------------------------------------- block-residual scaffolding
    def _combine_attn(self, h, attn_in, lp, lin, attn):
        """o_proj + norm_style-specific residual. Returns (h, mlp_input,
        attn_res) — attn_res is only consumed by the parallel styles."""
        attn_res = lin("o_proj", attn)
        rm = self.residual_multiplier
        if self.norm_style == "post_out":
            attn_res = self.norm(attn_res, lp["post_attention_layernorm"])
        elif self.norm_style == "sandwich":
            attn_res = self.norm(attn_res, lp["post_self_attn_layernorm"])
        parallel = self.norm_style in ("parallel", "parallel_dual")
        if not parallel:
            h = h + (attn_res if rm == 1.0 else attn_res * jnp.asarray(rm, h.dtype))
        if self.norm_style == "post_out":
            normed = h
        elif self.norm_style == "parallel":
            normed = attn_in  # gptj/phi/cohere: one norm feeds both blocks
        elif self.norm_style == "parallel_dual":
            # gpt-neox use_parallel_residual: mlp reads its own pre-norm of
            # the ORIGINAL h (not h+attn).
            normed = self.norm(h, lp["post_attention_layernorm"])
        else:
            normed = self.norm(h, lp["post_attention_layernorm"])
        return h, normed, attn_res

    def _window_mlp(self, lp, lin, normed, tok_valid, quant_stacked):
        if "gate_up_proj" in (quant_stacked or {}) or "gate_up_proj" in lp:
            gate, up = jnp.split(lin("gate_up_proj", normed), 2, axis=-1)
            return lin("down_proj", jax.nn.silu(gate) * up)
        if quant_stacked is not None and "gate_proj" in quant_stacked:
            gate = lin("gate_proj", normed)
            up = lin("up_proj", normed)
            return lin("down_proj", jax.nn.silu(gate) * up)
        return self.mlp(lp, normed, tok_valid)

    def _combine_mlp(self, h, lp, mlp_out, attn_res=None):
        rm = self.residual_multiplier
        if self.norm_style == "post_out":
            mlp_out = self.norm(mlp_out, lp["post_feedforward_layernorm"])
        elif self.norm_style == "sandwich":
            mlp_out = self.norm(mlp_out, lp["post_mlp_layernorm"])
        if self.norm_style in ("parallel", "parallel_dual"):
            return h + attn_res + mlp_out
        return h + (mlp_out if rm == 1.0 else mlp_out * jnp.asarray(rm, h.dtype))

    # ------------------------------------------------- decode-window forward
    def forward_window_token(
        self,
        params: Dict[str, Any],
        tok: jnp.ndarray,  # [B] current input token
        pos: jnp.ndarray,  # [B] its absolute position
        prefix_len: jnp.ndarray,  # [B] tokens resident in the pre-gathered pages
        k_pages: jnp.ndarray,  # [L, B, C, Hkv, D] prefix pages (pre-gathered)
        v_pages: jnp.ndarray,
        win_k: jnp.ndarray,  # [L, B, K, Hkv, D] this window's K (carried)
        win_v: jnp.ndarray,
        t: jnp.ndarray,  # step index within the window
    ):
        """One decode step with two-source attention: pre-gathered prefix
        pages (positions < prefix_len, gathered ONCE per window — profiling
        showed per-step per-layer gather+relayout costing ~2x the attention)
        plus the in-flight window buffer (positions prefix_len..prefix_len+t).
        The big cache is neither read nor written here; the runner flushes
        win_k/win_v once per window."""
        cfg = self.config
        B = tok.shape[0]
        K = win_k.shape[2]
        C = k_pages.shape[2]
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        group = Hq // Hkv

        hidden = params["embed"]["weight"][tok]  # [B, Dm]
        if self.embed_multiplier != 1.0:
            hidden = hidden * jnp.asarray(self.embed_multiplier, hidden.dtype)
        if self.pos_embed_mode is not None:
            off = 2 if self.pos_embed_mode == "learned_opt" else 0
            hidden = hidden + params["pos_embed"]["weight"][pos + off]
        # Single-position rope (avoids [B, 1, ...] singleton relayouts).
        rot = self.cos_sin_cache.shape[-1]
        cs = self.cos_sin_cache[pos]  # [B, rot]
        cos, sin = jnp.split(cs, 2, axis=-1)  # [B, rot/2]
        cos = cos[:, None, :]
        sin = sin[:, None, :]
        if self.cos_sin_cache_local is not None:
            cs_l = self.cos_sin_cache_local[pos]
            cos_l, sin_l = jnp.split(cs_l, 2, axis=-1)
            cos_l, sin_l = cos_l[:, None, :], sin_l[:, None, :]

        def rope1(x, c, s):  # x: [B, H, D]; neox or interleaved
            x_rot = x[..., :rot]
            x_pass = x[..., rot:]
            if self.rope_style == "neox":
                x1, x2 = jnp.split(x_rot, 2, axis=-1)
                o = jnp.concatenate(
                    [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
                )
            else:  # gptj interleaved
                x1 = x_rot[..., ::2]
                x2 = x_rot[..., 1::2]
                o = jnp.stack(
                    [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
                ).reshape(x_rot.shape)
            if x_pass.shape[-1]:
                o = jnp.concatenate([o, x_pass], axis=-1)
            return o.astype(x.dtype)

        def rope_li(x, li):
            o = rope1(x, cos, sin)
            if self.rope_local_layer is not None:
                o = jnp.where(
                    self.rope_local_layer[li], rope1(x, cos_l, sin_l), o
                )
            if self.rope_layer_on is not None:
                o = jnp.where(self.rope_layer_on[li], o, x)
            return o

        kposw = jnp.arange(K, dtype=jnp.int32)[None, :]
        cpos = jnp.arange(C, dtype=jnp.int32)[None, :]
        mask_pre = cpos < prefix_len[:, None]
        if self.sliding_window:
            mask_pre = mask_pre & (cpos > (pos - self.sliding_window)[:, None])
        if self.alibi_slopes is not None:
            # ALiBi bias = slope_h · key_absolute_position (same shift-
            # invariant form as ops/attention/reference.py): prefix pages
            # sit at positions 0..prefix_len, window slot j at prefix_len+j.
            slopes = self.alibi_slopes.reshape(1, Hkv, group, 1)
            alibi_pre = slopes * cpos[:, None, None, :].astype(jnp.float32)
            alibi_win = (
                slopes
                * (prefix_len[:, None] + kposw)[:, None, None, :].astype(
                    jnp.float32
                )
            )

        layers, quant_stacked = self._split_quant_leaves(params["layers"])

        def layer_body(carry, xs):
            h, wk, wv = carry
            lp, li, kp, vp = xs  # kp/vp: [B, C, Hkv, D]

            def lin(name, x):
                if quant_stacked is not None and name in quant_stacked:
                    return apply_linear(
                        quant_stacked[name], x, self.quant_group_size, li=li
                    )
                return apply_linear(lp[name], x, self.quant_group_size)

            if self.norm_style == "post_out":
                normed = h
            else:
                normed = self.norm(h, lp["input_layernorm"])
            attn_in = normed
            if "qkv_proj" in (quant_stacked or {}) or "qkv_proj" in lp:
                y = lin("qkv_proj", normed)
                q, k, v = jnp.split(y, [Hq * D, (Hq + Hkv) * D], axis=-1)
            else:
                q = lin("q_proj", normed)
                k = lin("k_proj", normed)
                v = lin("v_proj", normed)
            if self.clip_qkv is not None:
                c = jnp.asarray(self.clip_qkv, q.dtype)
                q, k, v = jnp.clip(q, -c, c), jnp.clip(k, -c, c), jnp.clip(v, -c, c)
            if self.qk_norm_full:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            q = q.reshape(B, Hq, D)
            k = k.reshape(B, Hkv, D)
            v = v.reshape(B, Hkv, D)
            if self.has_qk_norm:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            if self.qk_norm_fn is not None:
                q = self.qk_norm_fn(q, lp["q_norm"])
                k = self.qk_norm_fn(k, lp["k_norm"])
            q = rope_li(q, li)
            k = rope_li(k, li)
            if self.qk_norm_post_rope:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)

            k_st, v_st, q_att, vsc = self._kv_quantize(lp, wk.dtype, k, v, q)
            wk = jax.lax.dynamic_update_slice(
                wk, k_st.reshape(1, B, 1, Hkv, D), (li, 0, t, 0, 0)
            )
            wv = jax.lax.dynamic_update_slice(
                wv, v_st.reshape(1, B, 1, Hkv, D), (li, 0, t, 0, 0)
            )

            qg = q_att.reshape(B, Hkv, group, D)
            s_pre = (
                jnp.einsum("bhgd,bchd->bhgc", qg, kp.astype(q.dtype),
                           preferred_element_type=jnp.float32)
                * self.sm_scale
            )
            wk_l = jax.lax.dynamic_index_in_dim(wk, li, axis=0, keepdims=False)
            wv_l = jax.lax.dynamic_index_in_dim(wv, li, axis=0, keepdims=False)
            s_win = (
                jnp.einsum("bhgd,bkhd->bhgk", qg, wk_l.astype(q.dtype),
                           preferred_element_type=jnp.float32)
                * self.sm_scale
            )
            if self.attn_logit_cap:
                cap = jnp.float32(self.attn_logit_cap)
                s_pre = cap * jnp.tanh(s_pre / cap)
                s_win = cap * jnp.tanh(s_win / cap)
            if self.alibi_slopes is not None:
                s_pre = s_pre + alibi_pre
                s_win = s_win + alibi_win
            mask_pre_l, mask_win_l = mask_pre, (kposw <= t)
            if self.layer_windows is not None:
                lw = self.layer_windows[li]
                mask_pre_l = mask_pre_l & (cpos > (pos - lw)[:, None])
                mask_win_l = mask_win_l & (
                    prefix_len[:, None] + kposw > (pos - lw)[:, None]
                )
            s_pre = jnp.where(mask_pre_l[:, None, None, :], s_pre, -jnp.inf)
            s_win = jnp.where(mask_win_l[:, None, None, :], s_win, -jnp.inf)
            s_all = jnp.concatenate([s_pre, s_win], axis=-1)
            m = jnp.maximum(jnp.max(s_all, axis=-1, keepdims=True), -1e30)
            e = jnp.exp(s_all - m)
            probs = (e / jnp.maximum(e.sum(-1, keepdims=True), 1e-30)).astype(q.dtype)
            out = jnp.einsum(
                "bhgc,bchd->bhgd", probs[..., :C], vp.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bhgk,bkhd->bhgd", probs[..., C:], wv_l.astype(q.dtype),
                preferred_element_type=jnp.float32,
            )
            if vsc is not None:
                out = out * vsc
            attn = out.reshape(B, Hq * D).astype(h.dtype)
            h, normed2, attn_res = self._combine_attn(h, attn_in, lp, lin, attn)
            mlp_out = self._window_mlp(lp, lin, normed2, prefix_len > 0,
                                       quant_stacked)
            h = self._combine_mlp(h, lp, mlp_out, attn_res)
            return (h, wk, wv), None

        L = cfg.num_layers
        import os as _os

        (hidden, win_k, win_v), _ = jax.lax.scan(
            layer_body,
            (hidden, win_k, win_v),
            (layers, jnp.arange(L, dtype=jnp.int32), k_pages, v_pages),
            unroll=int(_os.environ.get("LTP_SCAN_UNROLL", "1")),
        )
        hidden = self.norm(hidden, params["norm"])
        if self.tie_word_embeddings:
            logits = jnp.einsum(
                "bd,vd->bv", hidden, params["embed"]["weight"],
                preferred_element_type=jnp.float32,
            )
        else:
            logits = jnp.einsum(
                "bd,dv->bv", hidden, params["lm_head"]["kernel"],
                preferred_element_type=jnp.float32,
            )
        if self.lm_head_bias:
            logits = logits + params["lm_head"]["bias"].astype(jnp.float32)
        if self.logits_multiplier != 1.0:
            logits = logits * jnp.float32(self.logits_multiplier)
        return logits, win_k, win_v

    def forward_window_token_paged(
        self,
        params: Dict[str, Any],
        tok: jnp.ndarray,  # [B] current input token
        pos: jnp.ndarray,  # [B] its absolute position
        k_cache: jnp.ndarray,  # [L, S, r, ln] native layout (carried)
        v_cache: jnp.ndarray,
        pages: jnp.ndarray,  # [B, Cp] page ids (position-ordered)
        seq_lens: jnp.ndarray,  # [B] kv length incl. this token
        slot_t: jnp.ndarray,  # [B] this token's cache slot
        page_size: int,
    ):
        """One decode step over the live paged cache: per layer, a DMA row
        write (kv_write) then the Pallas paged decode-attention kernel reads
        pages straight from HBM. No pre-gather, no page copies — each KV byte
        moves exactly once per layer-step (ops/attention/pallas_decode.py)."""
        from ltp_sglang_tpu.ops.attention.pallas_decode import paged_decode_attention

        paged_attn = self.paged_attn or paged_decode_attention
        cfg = self.config
        B = tok.shape[0]
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        hidden = params["embed"]["weight"][tok]  # [B, Dm]
        if self.embed_multiplier != 1.0:
            hidden = hidden * jnp.asarray(self.embed_multiplier, hidden.dtype)
        if self.pos_embed_mode is not None:
            off = 2 if self.pos_embed_mode == "learned_opt" else 0
            hidden = hidden + params["pos_embed"]["weight"][pos + off]
        rot = self.cos_sin_cache.shape[-1]
        cs = self.cos_sin_cache[pos]
        cos, sin = jnp.split(cs, 2, axis=-1)
        cos = cos[:, None, :]
        sin = sin[:, None, :]
        if self.cos_sin_cache_local is not None:
            cs_l = self.cos_sin_cache_local[pos]
            cos_l, sin_l = jnp.split(cs_l, 2, axis=-1)
            cos_l, sin_l = cos_l[:, None, :], sin_l[:, None, :]

        def rope1(x, c=None, s=None):
            c = cos if c is None else c
            s = sin if s is None else s
            x_rot = x[..., :rot]
            x_pass = x[..., rot:]
            if self.rope_style == "neox":
                x1, x2 = jnp.split(x_rot, 2, axis=-1)
                o = jnp.concatenate(
                    [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
                )
            else:  # gptj interleaved
                x1 = x_rot[..., ::2]
                x2 = x_rot[..., 1::2]
                o = jnp.stack(
                    [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
                ).reshape(x_rot.shape)
            if x_pass.shape[-1]:
                o = jnp.concatenate([o, x_pass], axis=-1)
            return o.astype(x.dtype)

        layers, quant_stacked = self._split_quant_leaves(params["layers"])

        def layer_body(carry, xs):
            h, kc, vc = carry
            lp, li = xs

            def lin(name, x):
                if quant_stacked is not None and name in quant_stacked:
                    return apply_linear(
                        quant_stacked[name], x, self.quant_group_size, li=li
                    )
                return apply_linear(lp[name], x, self.quant_group_size)

            if self.norm_style == "post_out":
                normed = h
            else:
                normed = self.norm(h, lp["input_layernorm"])
            attn_in = normed
            if "qkv_proj" in (quant_stacked or {}) or "qkv_proj" in lp:
                y = lin("qkv_proj", normed)
                q, k, v = jnp.split(y, [Hq * D, (Hq + Hkv) * D], axis=-1)
            else:
                q = lin("q_proj", normed)
                k = lin("k_proj", normed)
                v = lin("v_proj", normed)
            if self.clip_qkv is not None:
                c = jnp.asarray(self.clip_qkv, q.dtype)
                q, k, v = jnp.clip(q, -c, c), jnp.clip(k, -c, c), jnp.clip(v, -c, c)
            if self.qk_norm_full:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            q = q.reshape(B, Hq, D)
            k = k.reshape(B, Hkv, D)
            v = v.reshape(B, Hkv, D)
            if self.has_qk_norm:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            if self.qk_norm_fn is not None:
                q = self.qk_norm_fn(q, lp["q_norm"])
                k = self.qk_norm_fn(k, lp["k_norm"])
            def rope_li(x):
                o = rope1(x)
                if self.rope_local_layer is not None:
                    o = jnp.where(
                        self.rope_local_layer[li], rope1(x, cos_l, sin_l), o
                    )
                if self.rope_layer_on is not None:
                    o = jnp.where(self.rope_layer_on[li], o, x)
                return o

            q = rope_li(q)
            k = rope_li(k)
            if self.qk_norm_post_rope:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)

            k_st, v_st, q_att, vsc = self._kv_quantize(lp, kc.dtype, k, v, q)
            kc, vc = self.kv_write(
                kc, vc, li, slot_t, k_st, v_st,
                jnp.asarray(B, jnp.int32),
            )
            attn = paged_attn(
                q_att, kc, vc, li, pages, seq_lens,
                page_size=page_size, num_kv_heads=Hkv, sm_scale=self.sm_scale,
                **(
                    {"logit_cap": self.attn_logit_cap}
                    if self.attn_logit_cap
                    else {}
                ),
            )  # [B, Hq, D]
            if vsc is not None:
                attn = attn.astype(jnp.float32) * vsc
            attn = attn.reshape(B, Hq * D).astype(h.dtype)
            h, normed2, attn_res = self._combine_attn(h, attn_in, lp, lin, attn)
            mlp_out = self._window_mlp(lp, lin, normed2, seq_lens > 0,
                                       quant_stacked)
            h = self._combine_mlp(h, lp, mlp_out, attn_res)
            return (h, kc, vc), None

        L = cfg.num_layers
        (hidden, k_cache, v_cache), _ = jax.lax.scan(
            layer_body,
            (hidden, k_cache, v_cache),
            (layers, jnp.arange(L, dtype=jnp.int32)),
        )
        hidden = self.norm(hidden, params["norm"])
        if self.tie_word_embeddings:
            logits = jnp.einsum(
                "bd,vd->bv", hidden, params["embed"]["weight"],
                preferred_element_type=jnp.float32,
            )
        else:
            logits = jnp.einsum(
                "bd,dv->bv", hidden, params["lm_head"]["kernel"],
                preferred_element_type=jnp.float32,
            )
        if self.lm_head_bias:
            logits = logits + params["lm_head"]["bias"].astype(jnp.float32)
        if self.logits_multiplier != 1.0:
            logits = logits * jnp.float32(self.logits_multiplier)
        return logits, k_cache, v_cache

    # ---------------------------------------------------------------- forward
    def norm(self, x, w):
        return rms_norm(x, w, self.rms_eps)

    def mlp(self, lp, normed, tok_valid=None):
        gs = self.quant_group_size
        gate = apply_linear(lp["gate_proj"], normed, gs)
        up = apply_linear(lp["up_proj"], normed, gs)
        return apply_linear(lp["down_proj"], jax.nn.silu(gate) * up, gs)

    def _rope_layer(self, q, k, positions, li):
        """Per-layer RoPE: the plain cache, plus optional per-layer
        local-cache select (hybrid dual-rope models: olmo3/gemma3) and
        per-layer rope toggle (NoPE layers: smollm3/exaone4 globals)."""
        qr, kr = apply_rope(
            q, k, positions, self.cos_sin_cache, style=self.rope_style
        )
        if self.rope_local_layer is not None:
            ql, kl = apply_rope(
                q, k, positions, self.cos_sin_cache_local, style=self.rope_style
            )
            sel = self.rope_local_layer[li]
            qr = jnp.where(sel, ql, qr)
            kr = jnp.where(sel, kl, kr)
        if self.rope_layer_on is not None:
            on = self.rope_layer_on[li]
            qr = jnp.where(on, qr, q)
            kr = jnp.where(on, kr, k)
        return qr, kr

    def _layer_window(self, li):
        """Per-layer sliding window for the masked attention path (0 = no
        window); traced scalar when layer_windows is set."""
        if self.layer_windows is not None:
            return self.layer_windows[li]
        return self.sliding_window

    def forward(
        self,
        params: Dict[str, Any],
        step: StepArrays,
        k_cache: jnp.ndarray,  # [L, S, r, ln] native DMA row layout (kv_layout)
        v_cache: jnp.ndarray,  # [L, S, r, ln]
        all_logits: bool = False,
        lora: Optional[Dict[str, Any]] = None,
        return_hidden: bool = False,
        input_embeds: Optional[jnp.ndarray] = None,  # PP mid-stage input
        pp_raw_hidden: bool = False,  # PP non-last stage: skip norm + head
        return_aux: bool = False,  # EAGLE3: also return concat aux hiddens
        label_cache: Optional[jnp.ndarray] = None,  # [L,S,Hkv,r] double sparsity
    ):
        """Returns (logits, k_cache, v_cache): last-token logits [B, V], or
        per-position logits [B, E, V] when all_logits (speculative verify)."""
        cfg = self.config
        B, E = step.input_ids.shape
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        if input_embeds is not None:
            hidden = input_embeds
        else:
            hidden = params["embed"]["weight"][step.input_ids]  # [B, E, Dm]
        if input_embeds is None and self.embed_multiplier != 1.0:
            hidden = hidden * jnp.asarray(self.embed_multiplier, hidden.dtype)
        if input_embeds is None and self.pos_embed_mode is not None:
            off = 2 if self.pos_embed_mode == "learned_opt" else 0
            hidden = hidden + params["pos_embed"]["weight"][step.positions + off]
        if input_embeds is None and getattr(self, "embed_norm", False):
            # bloom: LayerNorm over the embeddings before the first block.
            hidden = self.norm(hidden, params["embed_norm"])
        if step.mm_embeds is not None:
            # VLM embedding injection: placeholder positions (ids are image
            # hashes >= vocab; the gather above clamps harmlessly) take the
            # projected image embeddings instead (models/llava.py).
            hidden = jnp.where(
                step.mm_mask[:, :, None], step.mm_embeds.astype(hidden.dtype),
                hidden,
            )
        cache_locs_flat = step.cache_locs.reshape(-1)  # [B*E]
        if lora is not None:
            from ltp_sglang_tpu.lora.lora_manager import lora_apply

            lora_scaling = lora["scaling"]
            lora_ids_tok = jnp.repeat(step.lora_ids, E)  # [B*E]
            lora_layers = {k: v for k, v in lora.items() if k != "scaling"}
        else:
            lora_layers = None
        layers, quant_stacked = self._split_quant_leaves(params["layers"])

        # EAGLE3 aux-hidden capture (speculative/eagle3.py; reference
        # llama_eagle3 capture_aux_hidden_states): the residual stream at
        # three depths, concatenated [B, E, 3*Dm] for the draft head's fc.
        aux_ids = None
        if return_aux:
            Lm = cfg.num_layers
            aux_ids = jnp.asarray(
                getattr(self, "aux_capture_layers", None)
                or [1, max(Lm // 2 - 1, 0), max(Lm - 4, 0)],
                jnp.int32,
            )

        ds_on = label_cache is not None and self.ds_cfg is not None

        def layer_body(carry, xs):
            lc = None
            if aux_ids is not None:
                h, kc, vc, aux = carry
            elif ds_on:
                h, kc, vc, lc = carry
            else:
                h, kc, vc = carry
            if lora_layers is not None:
                lp, li, ll = xs
            else:
                lp, li = xs

            def lin(name, x):
                if quant_stacked is not None and name in quant_stacked:
                    y = apply_linear(
                        quant_stacked[name], x, self.quant_group_size, li=li
                    )
                else:
                    y = apply_linear(lp[name], x, self.quant_group_size)
                if lora_layers is not None and name in ll:
                    T = x.shape[0] * x.shape[1]
                    delta = lora_apply(
                        x.reshape(T, x.shape[-1]),
                        lora_ids_tok,
                        ll[name]["A"],
                        ll[name]["B"],
                        lora_scaling,
                    )
                    y = y + delta.reshape(y.shape)
                return y

            # Self-attention. Norm placement per self.norm_style:
            #   pre/sandwich/parallel: pre-norm feeds the block;
            #   post_out (olmo2): the block reads h directly.
            if self.norm_style == "post_out":
                normed = h
            else:
                normed = self.norm(h, lp["input_layernorm"])
            attn_in = normed
            gs = self.quant_group_size
            if "qkv_proj" in (quant_stacked or {}) or "qkv_proj" in lp:
                y = (
                    apply_linear(quant_stacked["qkv_proj"], normed, gs, li=li)
                    if quant_stacked is not None and "qkv_proj" in quant_stacked
                    else apply_linear(lp["qkv_proj"], normed, gs)
                )
                q, k, v = jnp.split(y, [Hq * D, (Hq + Hkv) * D], axis=-1)
                if lora_layers is not None:
                    T = normed.shape[0] * normed.shape[1]
                    xt = normed.reshape(T, normed.shape[-1])
                    segs = []
                    for nm, seg in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
                        if nm in ll:
                            seg = seg + lora_apply(
                                xt, lora_ids_tok, ll[nm]["A"], ll[nm]["B"],
                                lora_scaling,
                            ).reshape(seg.shape)
                        segs.append(seg)
                    q, k, v = segs
            else:
                q = lin("q_proj", normed)
                k = lin("k_proj", normed)
                v = lin("v_proj", normed)
            if self.clip_qkv is not None:
                c = jnp.asarray(self.clip_qkv, q.dtype)
                q, k, v = jnp.clip(q, -c, c), jnp.clip(k, -c, c), jnp.clip(v, -c, c)
            if self.qk_norm_full:
                # olmo2: RMS over the full projection width, before reshape.
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            q = q.reshape(B, E, Hq, D)
            k = k.reshape(B, E, Hkv, D)
            v = v.reshape(B, E, Hkv, D)
            if self.has_qk_norm:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            if self.qk_norm_fn is not None:
                q = self.qk_norm_fn(q, lp["q_norm"])
                k = self.qk_norm_fn(k, lp["k_norm"])
            q, k = self._rope_layer(q, k, step.positions, li)
            if self.qk_norm_post_rope:  # hunyuan: per-head RMS AFTER rope
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)

            # Write new KV into the paged cache (pads land in garbage slot 0),
            # then attend over the gathered pages (SURVEY §7.5a). fp8 caches
            # store scaled values; the scales fold into q / the output.
            k_st, v_st, q_att, vsc = self._kv_quantize(
                lp, kc.dtype, k.reshape(-1, Hkv, D), v.reshape(-1, Hkv, D), q
            )
            kc, vc = self.kv_write(
                kc, vc, li, cache_locs_flat, k_st, v_st,
                jnp.asarray(B * E, jnp.int32),
            )
            if ds_on:
                # Double sparsity: mirror the heavy channels of the new K
                # rows into the label cache (ops/attention/double_sparsity).
                from ltp_sglang_tpu.ops.attention.double_sparsity import (
                    extract_labels,
                )

                labels_new = extract_labels(k_st, self.ds_channels[li])
                lc = lc.at[li, cache_locs_flat].set(labels_new)
            if (
                self.extend_attn is not None
                and self.alibi_slopes is None
                and not self.attn_logit_cap
                and self.layer_windows is None
                and step.pages is not None
                and step.spec_mask is None
                and step.kv_indices.shape[1] >= 2048
            ):
                # Pallas ragged extend kernel: streams pages HBM->VMEM once
                # (ops/attention/pallas_extend.py) instead of the triple
                # byte-move gather below. Measured crossover: the gather
                # path's materialization cost passes the kernel around
                # C~2k (1k: 26% vs 21% MFU for gather; 8k: 17% vs 21%).
                attn_out = self.extend_attn(
                    q_att, kc, vc, li, step.pages, step.seq_lens,
                    step.prefix_lens, num_kv_heads=Hkv,
                    sm_scale=self.sm_scale,
                )
            elif (
                ds_on
                and E == 1
                and step.kv_indices.shape[1] >= self.ds_cfg["threshold"]
                and step.spec_mask is None
                and self.layer_windows is None
                and self.alibi_slopes is None
            ):
                # Double-sparsity decode: score against the label cache
                # (r/D of the K bytes), top-k per request, exact attention
                # over only the selected rows.
                from ltp_sglang_tpu.ops.attention.double_sparsity import (
                    ds_sparse_attention,
                )

                Cw = step.kv_indices.shape[1]
                r = self.ds_cfg["r"]
                labels = lc[li, step.kv_indices].reshape(B, Cw, Hkv, r)
                attn_out = ds_sparse_attention(
                    q_att, kc, vc, li, labels, step.kv_indices,
                    step.seq_lens, self.ds_channels[li],
                    self.ds_cfg["heavy_k"], self.sm_scale,
                )
            else:
                Cw = step.kv_indices.shape[1]
                k_pages = kc[li, step.kv_indices].reshape(B, Cw, Hkv, D)
                v_pages = vc[li, step.kv_indices].reshape(B, Cw, Hkv, D)
                if vsc is not None:
                    # fp8 -> compute dtype is exact (e4m3/e5m2 ⊂ bf16); XLA
                    # fuses the convert into the gather/matmul.
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
                    sliding_window=self._layer_window(li),
                    tree_mask=step.spec_mask,
                    **(
                        {"alibi_slopes": self.alibi_slopes}
                        if self.alibi_slopes is not None
                        else {}
                    ),
                    **(
                        {"logit_cap": self.attn_logit_cap}
                        if self.attn_logit_cap
                        else {}
                    ),
                    **(
                        {"sinks": lp["sinks"]}
                        if self.has_attn_sinks
                        else {}
                    ),
                )
            if vsc is not None:
                attn_out = (attn_out.astype(jnp.float32) * vsc).astype(h.dtype)
            attn_res = lin("o_proj", attn_out.reshape(B, E, Hq * D))
            rm = self.residual_multiplier
            if self.norm_style == "post_out":
                attn_res = self.norm(attn_res, lp["post_attention_layernorm"])
            elif self.norm_style == "sandwich":
                attn_res = self.norm(attn_res, lp["post_self_attn_layernorm"])
            if self.norm_style not in ("parallel", "parallel_dual"):
                h = h + (attn_res if rm == 1.0 else attn_res * jnp.asarray(rm, h.dtype))

            # MLP (subclasses override mlp() — MoE models route here)
            if self.norm_style == "post_out":
                normed = h
            elif self.norm_style == "parallel":
                normed = attn_in
            else:
                normed = self.norm(h, lp["post_attention_layernorm"])
            if "gate_up_proj" in (quant_stacked or {}) or "gate_up_proj" in lp:
                gu = (
                    apply_linear(quant_stacked["gate_up_proj"], normed, gs, li=li)
                    if quant_stacked is not None
                    and "gate_up_proj" in quant_stacked
                    else apply_linear(lp["gate_up_proj"], normed, gs)
                )
                gate, up = jnp.split(gu, 2, axis=-1)
                if lora_layers is not None:
                    T = normed.shape[0] * normed.shape[1]
                    xt = normed.reshape(T, normed.shape[-1])
                    if "gate_proj" in ll:
                        gate = gate + lora_apply(
                            xt, lora_ids_tok, ll["gate_proj"]["A"],
                            ll["gate_proj"]["B"], lora_scaling,
                        ).reshape(gate.shape)
                    if "up_proj" in ll:
                        up = up + lora_apply(
                            xt, lora_ids_tok, ll["up_proj"]["A"],
                            ll["up_proj"]["B"], lora_scaling,
                        ).reshape(up.shape)
                mlp_out = lin("down_proj", jax.nn.silu(gate) * up)
            else:
                has_gate = "gate_proj" in lp or (
                    quant_stacked is not None and "gate_proj" in quant_stacked
                )
                if has_gate and (
                    lora_layers is not None or quant_stacked is not None
                ):
                    gate = lin("gate_proj", normed)
                    up = lin("up_proj", normed)
                    mlp_out = lin("down_proj", jax.nn.silu(gate) * up)
                else:
                    tok_valid = (
                        jnp.arange(E, dtype=jnp.int32)[None, :]
                        < step.extend_lens[:, None]
                    )
                    mlp_out = self.mlp(lp, normed, tok_valid)
            if self.norm_style == "post_out":
                mlp_out = self.norm(mlp_out, lp["post_feedforward_layernorm"])
            elif self.norm_style == "sandwich":
                mlp_out = self.norm(mlp_out, lp["post_mlp_layernorm"])
            if self.norm_style in ("parallel", "parallel_dual"):
                h = h + attn_res + mlp_out
            else:
                h = h + (mlp_out if rm == 1.0 else mlp_out * jnp.asarray(rm, h.dtype))
            if aux_ids is not None:
                sel = (li == aux_ids)[:, None, None, None]  # [3, 1, 1, 1]
                aux = jnp.where(sel, h[None], aux)
                return (h, kc, vc, aux), None
            if ds_on:
                return (h, kc, vc, lc), None
            return (h, kc, vc), None

        # Local layer count: under pipeline parallelism (shard_map over
        # "pp") the stacked leaves are this stage's slice, not all L layers.
        L = jax.tree.leaves(layers)[0].shape[0]
        xs = (layers, jnp.arange(L, dtype=jnp.int32))
        if lora_layers is not None:
            xs = xs + (lora_layers,)
        if aux_ids is not None:
            aux0 = jnp.zeros((3,) + hidden.shape, hidden.dtype)
            (hidden, k_cache, v_cache, aux), _ = jax.lax.scan(
                layer_body, (hidden, k_cache, v_cache, aux0), xs,
            )
            aux_cat = jnp.concatenate([aux[0], aux[1], aux[2]], axis=-1)
        elif ds_on:
            (hidden, k_cache, v_cache, label_cache), _ = jax.lax.scan(
                layer_body, (hidden, k_cache, v_cache, label_cache), xs,
            )
        else:
            (hidden, k_cache, v_cache), _ = jax.lax.scan(
                layer_body,
                (hidden, k_cache, v_cache),
                xs,
            )

        if pp_raw_hidden:
            # Pipeline-parallel non-final stage: hand the raw residual stream
            # to the next stage (parallel/pipeline.py).
            return hidden, k_cache, v_cache
        hidden = self.norm(hidden, params["norm"])
        if return_hidden:
            # Embedding mode (reference: models with pooling heads served via
            # is_embedding; pooling happens in the caller).
            if return_aux:
                return hidden, aux_cat, k_cache, v_cache
            if ds_on:
                return hidden, k_cache, v_cache, label_cache
            return hidden, k_cache, v_cache
        logits = self._lm_head(params, hidden, step, all_logits)
        if ds_on:
            return logits, k_cache, v_cache, label_cache
        return logits, k_cache, v_cache

    def _lm_head(self, params, hidden, step: StepArrays, all_logits: bool):
        # MXU-friendly: low-precision operands, fp32 accumulation (never cast
        # the [V, D] weight to fp32 — that materializes a vocab-sized buffer).
        if not all_logits:
            # Last-token hidden per request (LogitsProcessor last-token path,
            # layers/logits_processor.py:237).
            last_idx = jnp.maximum(step.extend_lens - 1, 0)  # [B]
            hidden = jnp.take_along_axis(
                hidden, last_idx[:, None, None], axis=1
            )[:, 0]  # [B, Dm]
        if self.tie_word_embeddings:
            logits = jnp.einsum(
                "...d,vd->...v",
                hidden,
                params["embed"]["weight"],
                preferred_element_type=jnp.float32,
            )
        else:
            logits = jnp.einsum(
                "...d,dv->...v",
                hidden,
                params["lm_head"]["kernel"],
                preferred_element_type=jnp.float32,
            )
        if self.lm_head_bias:
            logits = logits + params["lm_head"]["bias"].astype(jnp.float32)
        if self.logits_multiplier != 1.0:
            logits = logits * jnp.float32(self.logits_multiplier)
        return logits
