"""Classic decoder families: GPT-2, GPT-J, GPT-NeoX, OPT, Phi, Bloom,
Falcon, GPT-BigCode, MPT.

Reference: python/sglang/srt/models/{gpt2,gptj?,gpt_bigcode,...}.py and the
HF modeling files (exact formulas). All run on the shared llama body via the
family hooks (norm styles, learned positions, alibi, rope toggles); what
differs per family is the parameter schema and the HF name/packing mapping,
expressed declaratively below.

Packing facts replicated bit-faithfully:
- GPT-2 Conv1D stores [in, out] (no transpose); c_attn fuses q|k|v columns.
- NeoX/Bloom query_key_value packs PER HEAD: view [H, 3, D] (q=0, k=1, v=2).
- Falcon (multi_query) fuses [Hq·D | D | D] (all q heads, one k, one v).
- GPT-BigCode c_attn fuses [Hq·D | D | D] with nn.Linear ([out, in] → .T).
- MPT Wqkv chunks into whole q|k|v blocks.
- Bloom applies a LayerNorm to the embeddings (word_embeddings_layernorm).
- ALiBi slopes: Bloom formula (geometric, power-of-2 pad) vs MPT formula
  (alibi_bias_max=8, odd/even interleave) — both shift-invariant forms.
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
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    o = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    if b is not None:
        o = o + b.astype(jnp.float32)
    return o.astype(x.dtype)


def bloom_alibi_slopes(num_heads: int) -> np.ndarray:
    """transformers.models.bloom.modeling_bloom.build_alibi_tensor slopes."""
    cp2 = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp2) - 3)))
    slopes = base ** np.arange(1, 1 + cp2, dtype=np.float64)
    if cp2 != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp2) - 3)))
        n_extra = min(2 * cp2, num_heads) - cp2
        extra = extra_base ** np.arange(1, 1 + 2 * n_extra, 2, dtype=np.float64)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


def mpt_alibi_slopes(num_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """transformers.models.mpt.modeling_mpt.build_mpt_alibi_tensor slopes."""
    np2 = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, np2 + 1, dtype=np.float64) * (alibi_bias_max / np2)
    slopes = 1.0 / np.power(2, base)
    if np2 != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes.astype(np.float32)


class ClassicBase(LlamaForCausalLM):
    """Schema-driven parameters: subclasses declare the layer/top schema and
    an HF-name mapping; init/specs/convert are generated."""

    supports_quant_fusion = False
    supports_pp = False
    norm_has_bias = True

    def norm(self, x, w):
        return _layer_norm(
            x, w["w"], w.get("b") if isinstance(w, dict) else None, self.norm_eps
        )

    # --- schema: {"leaf": ("ln",)} | {"leaf": ("lin", K, N, has_bias)}
    def layer_schema(self) -> Dict[str, tuple]:
        raise NotImplementedError

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (jax.random.normal(sub, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        layers = {}
        for name, spec in self.layer_schema().items():
            if spec[0] == "ln":
                layers[name] = {"w": jnp.ones((L, Dm), self.dtype)}
                if self.norm_has_bias:
                    layers[name]["b"] = jnp.zeros((L, Dm), self.dtype)
            else:
                _, K, N, bias = spec
                layers[name] = {"kernel": w(L, K, N)}
                if bias:
                    layers[name]["bias"] = jnp.zeros((L, N), self.dtype)
        params = {
            "embed": {"weight": w(cfg.vocab_size, Dm)},
            "layers": layers,
            "norm": {"w": jnp.ones((Dm,), self.dtype)},
        }
        if self.norm_has_bias:
            params["norm"]["b"] = jnp.zeros((Dm,), self.dtype)
        if self.pos_embed_mode is not None:
            off = 2 if self.pos_embed_mode == "learned_opt" else 0
            params["pos_embed"] = {"weight": w(cfg.context_len + off, Dm)}
        if getattr(self, "embed_norm", False):
            params["embed_norm"] = {"w": jnp.ones((Dm,), self.dtype)}
            if self.norm_has_bias:
                params["embed_norm"]["b"] = jnp.zeros((Dm,), self.dtype)
        if not self.tie_word_embeddings:
            params["lm_head"] = {"kernel": w(Dm, cfg.vocab_size)}
            if self.lm_head_bias:
                params["lm_head"]["bias"] = jnp.zeros(
                    (cfg.vocab_size,), self.dtype
                )
        return params

    def param_specs(self) -> Dict[str, Any]:
        col = {"q_proj", "k_proj", "v_proj", "c_fc", "up_proj", "fc_in", "fc1",
               "dense_h_to_4h"}
        row = {"o_proj", "c_proj", "down_proj", "fc_out", "fc2",
               "dense_4h_to_h"}
        layers = {}
        for name, spec in self.layer_schema().items():
            if spec[0] == "ln":
                layers[name] = {"w": P(None, None)}
                if self.norm_has_bias:
                    layers[name]["b"] = P(None, None)
            else:
                if name in col:
                    layers[name] = {"kernel": P(None, None, "tp")}
                    if spec[3]:
                        layers[name]["bias"] = P(None, "tp")
                elif name in row:
                    layers[name] = {"kernel": P(None, "tp", None)}
                    if spec[3]:
                        layers[name]["bias"] = P(None, None)
                else:
                    layers[name] = {"kernel": P(None, None, None)}
                    if spec[3]:
                        layers[name]["bias"] = P(None, None)
        specs = {
            "embed": {"weight": P("tp", None)},
            "layers": layers,
            "norm": {"w": P(None)} | ({"b": P(None)} if self.norm_has_bias else {}),
        }
        if self.pos_embed_mode is not None:
            specs["pos_embed"] = {"weight": P(None, None)}
        if getattr(self, "embed_norm", False):
            specs["embed_norm"] = {"w": P(None)} | (
                {"b": P(None)} if self.norm_has_bias else {}
            )
        if not self.tie_word_embeddings:
            specs["lm_head"] = {"kernel": P(None, "tp")}
            if self.lm_head_bias:
                specs["lm_head"]["bias"] = P(None)
        return specs

    # --- HF conversion helpers ---------------------------------------------
    @staticmethod
    def _get(weights, name):
        if name in weights:
            return np.asarray(weights[name])
        raise KeyError(name)

    def _stack_ln(self, weights, fmt, L):
        out = {"w": jnp.asarray(np.stack(
            [self._get(weights, fmt.format(i) + ".weight") for i in range(L)]
        ), dtype=self.dtype)}
        if self.norm_has_bias:
            out["b"] = jnp.asarray(np.stack(
                [self._get(weights, fmt.format(i) + ".bias") for i in range(L)]
            ), dtype=self.dtype)
        return out

    def _stack_lin(self, weights, fmt, L, transpose=True, bias=True):
        ws = [self._get(weights, fmt.format(i) + ".weight") for i in range(L)]
        if transpose:
            ws = [w.T for w in ws]
        out = {"kernel": jnp.asarray(np.stack(ws), dtype=self.dtype)}
        if bias:
            out["bias"] = jnp.asarray(np.stack(
                [self._get(weights, fmt.format(i) + ".bias") for i in range(L)]
            ), dtype=self.dtype)
        return out

    def _ln1(self, weights, name):
        out = {"w": jnp.asarray(self._get(weights, name + ".weight"), self.dtype)}
        if self.norm_has_bias:
            out["b"] = jnp.asarray(self._get(weights, name + ".bias"), self.dtype)
        return out


class GPT2LMHeadModel(ClassicBase):
    """GPT-2: learned positions, pre-LN, fused Conv1D c_attn, gelu_new MLP,
    tied head. HF names transformer.h.N.* ; Conv1D weights are [in, out]."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_epsilon", 1e-5)
        self.tie_word_embeddings = True
        self.pos_embed_mode = "learned"
        # no rotary at all
        self.rope_layer_on = jnp.zeros((config.num_layers,), dtype=bool)

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["c_fc"], normed)
        return apply_linear(lp["c_proj"], jax.nn.gelu(h, approximate=True))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        HkD = cfg.num_kv_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "post_attention_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, True),
            "k_proj": ("lin", Dm, HkD, True),
            "v_proj": ("lin", Dm, HkD, True),
            "o_proj": ("lin", HqD, Dm, True),
            "c_fc": ("lin", Dm, I, True),
            "c_proj": ("lin", I, Dm, True),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        qs, ks, vs, qb, kb, vb = [], [], [], [], [], []
        for i in range(L):
            w = self._get(weights, f"transformer.h.{i}.attn.c_attn.weight")
            b = self._get(weights, f"transformer.h.{i}.attn.c_attn.bias")
            q, k, v = np.split(w, 3, axis=1)  # Conv1D [in, 3D]
            bq, bk, bv = np.split(b, 3)
            qs.append(q); ks.append(k); vs.append(v)
            qb.append(bq); kb.append(bk); vb.append(bv)

        def lin(ws, bs):
            return {
                "kernel": jnp.asarray(np.stack(ws), self.dtype),
                "bias": jnp.asarray(np.stack(bs), self.dtype),
            }

        layers = {
            "input_layernorm": self._stack_ln(weights, "transformer.h.{}.ln_1", L),
            "post_attention_layernorm": self._stack_ln(
                weights, "transformer.h.{}.ln_2", L
            ),
            "q_proj": lin(qs, qb),
            "k_proj": lin(ks, kb),
            "v_proj": lin(vs, vb),
            "o_proj": self._stack_lin(
                weights, "transformer.h.{}.attn.c_proj", L, transpose=False
            ),
            "c_fc": self._stack_lin(
                weights, "transformer.h.{}.mlp.c_fc", L, transpose=False
            ),
            "c_proj": self._stack_lin(
                weights, "transformer.h.{}.mlp.c_proj", L, transpose=False
            ),
        }
        return {
            "embed": {"weight": jnp.asarray(
                self._get(weights, "transformer.wte.weight"), self.dtype)},
            "pos_embed": {"weight": jnp.asarray(
                self._get(weights, "transformer.wpe.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "transformer.ln_f"),
        }


class GPTJForCausalLM(ClassicBase):
    """GPT-J: parallel single-norm block, interleaved partial rotary
    (rotary_dim), fc_in/fc_out gelu_new MLP, untied head WITH bias."""

    lm_head_bias = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_epsilon", 1e-5)
        self.norm_style = "parallel"
        self.rope_style = "gptj"
        self.rotary_dim = hf.get("rotary_dim") or config.head_dim
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim, config.context_len, base=self.rope_theta,
            rotary_dim=self.rotary_dim,
        )

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["fc_in"], normed)
        return apply_linear(lp["fc_out"], jax.nn.gelu(h, approximate=True))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, False),
            "k_proj": ("lin", Dm, HqD, False),
            "v_proj": ("lin", Dm, HqD, False),
            "o_proj": ("lin", HqD, Dm, False),
            "fc_in": ("lin", Dm, I, True),
            "fc_out": ("lin", I, Dm, True),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.config.num_layers
        layers = {
            "input_layernorm": self._stack_ln(weights, "transformer.h.{}.ln_1", L),
            "q_proj": self._stack_lin(
                weights, "transformer.h.{}.attn.q_proj", L, bias=False),
            "k_proj": self._stack_lin(
                weights, "transformer.h.{}.attn.k_proj", L, bias=False),
            "v_proj": self._stack_lin(
                weights, "transformer.h.{}.attn.v_proj", L, bias=False),
            "o_proj": self._stack_lin(
                weights, "transformer.h.{}.attn.out_proj", L, bias=False),
            "fc_in": self._stack_lin(weights, "transformer.h.{}.mlp.fc_in", L),
            "fc_out": self._stack_lin(weights, "transformer.h.{}.mlp.fc_out", L),
        }
        return {
            "embed": {"weight": jnp.asarray(
                self._get(weights, "transformer.wte.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "transformer.ln_f"),
            "lm_head": {
                "kernel": jnp.asarray(
                    self._get(weights, "lm_head.weight").T, self.dtype),
                "bias": jnp.asarray(
                    self._get(weights, "lm_head.bias"), self.dtype),
            },
        }


class GPTNeoXForCausalLM(ClassicBase):
    """GPT-NeoX (pythia): dual-norm parallel residual, partial neox rotary,
    per-head-packed fused query_key_value, untied embed_out."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_eps", 1e-5)
        if not hf.get("use_parallel_residual", True):
            self.norm_style = "pre"
        else:
            self.norm_style = "parallel_dual"
        self.rotary_dim = int(config.head_dim * hf.get("rotary_pct", 0.25))
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim, config.context_len, base=self.rope_theta,
            rotary_dim=self.rotary_dim,
        )

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["dense_h_to_4h"], normed)
        return apply_linear(lp["dense_4h_to_h"], jax.nn.gelu(h, approximate=False))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "post_attention_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, True),
            "k_proj": ("lin", Dm, HqD, True),
            "v_proj": ("lin", Dm, HqD, True),
            "o_proj": ("lin", HqD, Dm, True),
            "dense_h_to_4h": ("lin", Dm, I, True),
            "dense_4h_to_h": ("lin", I, Dm, True),
        }

    def _split_headpacked(self, weights, fmt, L, H, D):
        """query_key_value [3HD, Din] viewed [H, 3, D, Din] → q/k/v."""
        out = {k: {"kernel": [], "bias": []} for k in ("q", "k", "v")}
        for i in range(L):
            w = self._get(weights, fmt.format(i) + ".weight")
            b = self._get(weights, fmt.format(i) + ".bias")
            w = w.reshape(H, 3, D, -1)
            b = b.reshape(H, 3, D)
            for j, k in enumerate(("q", "k", "v")):
                out[k]["kernel"].append(w[:, j].reshape(H * D, -1).T)
                out[k]["bias"].append(b[:, j].reshape(H * D))
        return {
            k: {
                "kernel": jnp.asarray(np.stack(v["kernel"]), self.dtype),
                "bias": jnp.asarray(np.stack(v["bias"]), self.dtype),
            }
            for k, v in out.items()
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, H, D = cfg.num_layers, cfg.num_attention_heads, cfg.head_dim
        qkv = self._split_headpacked(
            weights, "gpt_neox.layers.{}.attention.query_key_value", L, H, D
        )
        layers = {
            "input_layernorm": self._stack_ln(
                weights, "gpt_neox.layers.{}.input_layernorm", L),
            "post_attention_layernorm": self._stack_ln(
                weights, "gpt_neox.layers.{}.post_attention_layernorm", L),
            "q_proj": qkv["q"],
            "k_proj": qkv["k"],
            "v_proj": qkv["v"],
            "o_proj": self._stack_lin(
                weights, "gpt_neox.layers.{}.attention.dense", L),
            "dense_h_to_4h": self._stack_lin(
                weights, "gpt_neox.layers.{}.mlp.dense_h_to_4h", L),
            "dense_4h_to_h": self._stack_lin(
                weights, "gpt_neox.layers.{}.mlp.dense_4h_to_h", L),
        }
        return {
            "embed": {"weight": jnp.asarray(
                self._get(weights, "gpt_neox.embed_in.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "gpt_neox.final_layer_norm"),
            "lm_head": {"kernel": jnp.asarray(
                self._get(weights, "embed_out.weight").T, self.dtype)},
        }


class OPTForCausalLM(ClassicBase):
    """OPT: learned positions with a +2 offset, pre-LN, relu fc1/fc2, tied
    head (word_embed_proj_dim == hidden_size only)."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = 1e-5
        if hf.get("word_embed_proj_dim", config.hidden_size) != config.hidden_size:
            raise NotImplementedError("OPT word_embed_proj_dim != hidden_size")
        if not hf.get("do_layer_norm_before", True):
            raise NotImplementedError("OPT post-LN (350m) variant")
        self.tie_word_embeddings = True
        self.pos_embed_mode = "learned_opt"
        self.rope_layer_on = jnp.zeros((config.num_layers,), dtype=bool)

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["fc1"], normed)
        return apply_linear(lp["fc2"], jax.nn.relu(h))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "post_attention_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, True),
            "k_proj": ("lin", Dm, HqD, True),
            "v_proj": ("lin", Dm, HqD, True),
            "o_proj": ("lin", HqD, Dm, True),
            "fc1": ("lin", Dm, I, True),
            "fc2": ("lin", I, Dm, True),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.config.num_layers
        pre = "model.decoder.layers.{}"
        layers = {
            "input_layernorm": self._stack_ln(
                weights, pre + ".self_attn_layer_norm", L),
            "post_attention_layernorm": self._stack_ln(
                weights, pre + ".final_layer_norm", L),
            "q_proj": self._stack_lin(weights, pre + ".self_attn.q_proj", L),
            "k_proj": self._stack_lin(weights, pre + ".self_attn.k_proj", L),
            "v_proj": self._stack_lin(weights, pre + ".self_attn.v_proj", L),
            "o_proj": self._stack_lin(weights, pre + ".self_attn.out_proj", L),
            "fc1": self._stack_lin(weights, pre + ".fc1", L),
            "fc2": self._stack_lin(weights, pre + ".fc2", L),
        }
        return {
            "embed": {"weight": jnp.asarray(self._get(
                weights, "model.decoder.embed_tokens.weight"), self.dtype)},
            "pos_embed": {"weight": jnp.asarray(self._get(
                weights, "model.decoder.embed_positions.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "model.decoder.final_layer_norm"),
        }


class PhiForCausalLM(ClassicBase):
    """Phi-1/1.5/2: parallel single-norm block, partial neox rotary, fc1/fc2
    gelu_new MLP, untied head WITH bias."""

    lm_head_bias = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_eps", 1e-5)
        self.norm_style = "parallel"
        if hf.get("qk_layernorm"):
            raise NotImplementedError("phi qk_layernorm variant")
        self.rotary_dim = int(config.head_dim * hf.get("partial_rotary_factor", 0.5))
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim, config.context_len, base=self.rope_theta,
            rotary_dim=self.rotary_dim,
        )

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["fc1"], normed)
        return apply_linear(lp["fc2"], jax.nn.gelu(h, approximate=True))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        HkD = cfg.num_kv_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, True),
            "k_proj": ("lin", Dm, HkD, True),
            "v_proj": ("lin", Dm, HkD, True),
            "o_proj": ("lin", HqD, Dm, True),
            "fc1": ("lin", Dm, I, True),
            "fc2": ("lin", I, Dm, True),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.config.num_layers
        pre = "model.layers.{}"
        layers = {
            "input_layernorm": self._stack_ln(weights, pre + ".input_layernorm", L),
            "q_proj": self._stack_lin(weights, pre + ".self_attn.q_proj", L),
            "k_proj": self._stack_lin(weights, pre + ".self_attn.k_proj", L),
            "v_proj": self._stack_lin(weights, pre + ".self_attn.v_proj", L),
            "o_proj": self._stack_lin(weights, pre + ".self_attn.dense", L),
            "fc1": self._stack_lin(weights, pre + ".mlp.fc1", L),
            "fc2": self._stack_lin(weights, pre + ".mlp.fc2", L),
        }
        return {
            "embed": {"weight": jnp.asarray(
                self._get(weights, "model.embed_tokens.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "model.final_layernorm"),
            "lm_head": {
                "kernel": jnp.asarray(
                    self._get(weights, "lm_head.weight").T, self.dtype),
                "bias": jnp.asarray(
                    self._get(weights, "lm_head.bias"), self.dtype),
            },
        }


class BloomForCausalLM(ClassicBase):
    """Bloom: ALiBi (no positions), embedding LayerNorm, per-head-packed
    fused qkv, gelu MLP, tied head. XLA attention path only (alibi)."""

    forward_window_token = None
    forward_window_token_paged = None
    embed_norm = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_epsilon", 1e-5)
        self.tie_word_embeddings = True
        self.rope_layer_on = jnp.zeros((config.num_layers,), dtype=bool)
        self.alibi_slopes = jnp.asarray(
            bloom_alibi_slopes(config.num_attention_heads)
        )

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["dense_h_to_4h"], normed)
        return apply_linear(lp["dense_4h_to_h"], jax.nn.gelu(h, approximate=True))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "post_attention_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, True),
            "k_proj": ("lin", Dm, HqD, True),
            "v_proj": ("lin", Dm, HqD, True),
            "o_proj": ("lin", HqD, Dm, True),
            "dense_h_to_4h": ("lin", Dm, I, True),
            "dense_4h_to_h": ("lin", I, Dm, True),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, H, D = cfg.num_layers, cfg.num_attention_heads, cfg.head_dim
        qkv = GPTNeoXForCausalLM._split_headpacked(
            self, weights, "transformer.h.{}.self_attention.query_key_value",
            L, H, D,
        )
        layers = {
            "input_layernorm": self._stack_ln(
                weights, "transformer.h.{}.input_layernorm", L),
            "post_attention_layernorm": self._stack_ln(
                weights, "transformer.h.{}.post_attention_layernorm", L),
            "q_proj": qkv["q"],
            "k_proj": qkv["k"],
            "v_proj": qkv["v"],
            "o_proj": self._stack_lin(
                weights, "transformer.h.{}.self_attention.dense", L),
            "dense_h_to_4h": self._stack_lin(
                weights, "transformer.h.{}.mlp.dense_h_to_4h", L),
            "dense_4h_to_h": self._stack_lin(
                weights, "transformer.h.{}.mlp.dense_4h_to_h", L),
        }
        return {
            "embed": {"weight": jnp.asarray(self._get(
                weights, "transformer.word_embeddings.weight"), self.dtype)},
            "embed_norm": self._ln1(
                weights, "transformer.word_embeddings_layernorm"),
            "layers": layers,
            "norm": self._ln1(weights, "transformer.ln_f"),
        }


class FalconForCausalLM(ClassicBase):
    """Falcon (7B lineage: multi_query + parallel_attn, no biases, full-dim
    neox rotary, fused [Hq·D | D | D] qkv, tied head)."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_epsilon", 1e-5)
        self.tie_word_embeddings = True
        if hf.get("new_decoder_architecture"):
            raise NotImplementedError("falcon new_decoder_architecture (40B/180B)")
        if hf.get("alibi"):
            raise NotImplementedError("falcon alibi variant")
        self.bias = bool(hf.get("bias", False))
        if hf.get("parallel_attn", True):
            self.norm_style = "parallel"

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["dense_h_to_4h"], normed)
        return apply_linear(lp["dense_4h_to_h"], jax.nn.gelu(h, approximate=False))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        HkD = cfg.num_kv_heads * cfg.head_dim
        b = self.bias
        schema = {
            "input_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, b),
            "k_proj": ("lin", Dm, HkD, b),
            "v_proj": ("lin", Dm, HkD, b),
            "o_proj": ("lin", HqD, Dm, b),
            "dense_h_to_4h": ("lin", Dm, I, b),
            "dense_4h_to_h": ("lin", I, Dm, b),
        }
        if self.norm_style != "parallel":
            schema["post_attention_layernorm"] = ("ln",)
        return schema

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        qs, ks, vs = [], [], []
        for i in range(L):
            w = self._get(
                weights, f"transformer.h.{i}.self_attention.query_key_value.weight"
            )
            # [Hq·D + Hkv·D + Hkv·D, Din]: q heads first, then k, then v.
            q = w[: Hq * D]
            k = w[Hq * D: (Hq + Hkv) * D]
            v = w[(Hq + Hkv) * D:]
            qs.append(q.T); ks.append(k.T); vs.append(v.T)
        layers = {
            "input_layernorm": self._stack_ln(
                weights, "transformer.h.{}.input_layernorm", L),
            "q_proj": {"kernel": jnp.asarray(np.stack(qs), self.dtype)},
            "k_proj": {"kernel": jnp.asarray(np.stack(ks), self.dtype)},
            "v_proj": {"kernel": jnp.asarray(np.stack(vs), self.dtype)},
            "o_proj": self._stack_lin(
                weights, "transformer.h.{}.self_attention.dense", L,
                bias=self.bias),
            "dense_h_to_4h": self._stack_lin(
                weights, "transformer.h.{}.mlp.dense_h_to_4h", L,
                bias=self.bias),
            "dense_4h_to_h": self._stack_lin(
                weights, "transformer.h.{}.mlp.dense_4h_to_h", L,
                bias=self.bias),
        }
        if self.norm_style != "parallel":
            layers["post_attention_layernorm"] = self._stack_ln(
                weights, "transformer.h.{}.post_attention_layernorm", L
            )
        return {
            "embed": {"weight": jnp.asarray(self._get(
                weights, "transformer.word_embeddings.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "transformer.ln_f"),
        }


class GPTBigCodeForCausalLM(ClassicBase):
    """GPT-BigCode (starcoder1): MQA, learned positions, fused c_attn
    ([Hq·D | D | D], nn.Linear), gelu_pytorch_tanh, tied head."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_epsilon", 1e-5)
        self.tie_word_embeddings = True
        self.pos_embed_mode = "learned"
        self.rope_layer_on = jnp.zeros((config.num_layers,), dtype=bool)
        if not hf.get("multi_query", True):
            raise NotImplementedError("gpt_bigcode MHA variant")

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["c_fc"], normed)
        return apply_linear(lp["c_proj"], jax.nn.gelu(h, approximate=True))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        HkD = cfg.num_kv_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "post_attention_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, True),
            "k_proj": ("lin", Dm, HkD, True),
            "v_proj": ("lin", Dm, HkD, True),
            "o_proj": ("lin", HqD, Dm, True),
            "c_fc": ("lin", Dm, I, True),
            "c_proj": ("lin", I, Dm, True),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        qs, ks, vs, qb, kb, vb = [], [], [], [], [], []
        for i in range(L):
            w = self._get(weights, f"transformer.h.{i}.attn.c_attn.weight")
            b = self._get(weights, f"transformer.h.{i}.attn.c_attn.bias")
            q, k, v = (w[: Hq * D], w[Hq * D: (Hq + Hkv) * D],
                       w[(Hq + Hkv) * D:])
            qs.append(q.T); ks.append(k.T); vs.append(v.T)
            qb.append(b[: Hq * D]); kb.append(b[Hq * D: (Hq + Hkv) * D])
            vb.append(b[(Hq + Hkv) * D:])

        def lin(ws, bs):
            return {
                "kernel": jnp.asarray(np.stack(ws), self.dtype),
                "bias": jnp.asarray(np.stack(bs), self.dtype),
            }

        layers = {
            "input_layernorm": self._stack_ln(weights, "transformer.h.{}.ln_1", L),
            "post_attention_layernorm": self._stack_ln(
                weights, "transformer.h.{}.ln_2", L),
            "q_proj": lin(qs, qb),
            "k_proj": lin(ks, kb),
            "v_proj": lin(vs, vb),
            "o_proj": self._stack_lin(weights, "transformer.h.{}.attn.c_proj", L),
            "c_fc": self._stack_lin(weights, "transformer.h.{}.mlp.c_fc", L),
            "c_proj": self._stack_lin(weights, "transformer.h.{}.mlp.c_proj", L),
        }
        return {
            "embed": {"weight": jnp.asarray(
                self._get(weights, "transformer.wte.weight"), self.dtype)},
            "pos_embed": {"weight": jnp.asarray(
                self._get(weights, "transformer.wpe.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "transformer.ln_f"),
        }


class MptForCausalLM(ClassicBase):
    """MPT: ALiBi (mpt slope formula), LayerNorm without bias, whole-block
    fused Wqkv, exact-gelu up/down MLP, tied head. XLA attention only."""

    forward_window_token = None
    forward_window_token_paged = None
    norm_has_bias = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = 1e-5
        self.tie_word_embeddings = True
        self.rope_layer_on = jnp.zeros((config.num_layers,), dtype=bool)
        attn_cfg = hf.get("attn_config") or {}
        if isinstance(attn_cfg, dict):
            if not attn_cfg.get("alibi", True):
                raise NotImplementedError("mpt without alibi")
            sm = attn_cfg.get("softmax_scale")
            bias_max = attn_cfg.get("alibi_bias_max", 8)
        else:
            sm, bias_max = None, 8
        if sm:
            self.sm_scale = sm
        self.alibi_slopes = jnp.asarray(
            mpt_alibi_slopes(config.num_attention_heads, bias_max)
        )

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["up_proj"], normed)
        return apply_linear(lp["down_proj"], jax.nn.gelu(h, approximate=False))

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "post_attention_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, False),
            "k_proj": ("lin", Dm, HqD, False),
            "v_proj": ("lin", Dm, HqD, False),
            "o_proj": ("lin", HqD, Dm, False),
            "up_proj": ("lin", Dm, I, False),
            "down_proj": ("lin", I, Dm, False),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        qs, ks, vs = [], [], []
        for i in range(L):
            w = self._get(weights, f"transformer.blocks.{i}.attn.Wqkv.weight")
            q, k, v = np.split(w, 3, axis=0)
            qs.append(q.T); ks.append(k.T); vs.append(v.T)
        layers = {
            "input_layernorm": self._stack_ln(
                weights, "transformer.blocks.{}.norm_1", L),
            "post_attention_layernorm": self._stack_ln(
                weights, "transformer.blocks.{}.norm_2", L),
            "q_proj": {"kernel": jnp.asarray(np.stack(qs), self.dtype)},
            "k_proj": {"kernel": jnp.asarray(np.stack(ks), self.dtype)},
            "v_proj": {"kernel": jnp.asarray(np.stack(vs), self.dtype)},
            "o_proj": self._stack_lin(
                weights, "transformer.blocks.{}.attn.out_proj", L, bias=False),
            "up_proj": self._stack_lin(
                weights, "transformer.blocks.{}.ffn.up_proj", L, bias=False),
            "down_proj": self._stack_lin(
                weights, "transformer.blocks.{}.ffn.down_proj", L, bias=False),
        }
        return {
            "embed": {"weight": jnp.asarray(
                self._get(weights, "transformer.wte.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "transformer.norm_f"),
        }


class PersimmonForCausalLM(ClassicBase):
    """Persimmon (Adept 8B lineage): per-head-packed fused query_key_value
    (all biased), per-head LayerNorm q/k norms applied BEFORE rope, partial
    neox rotary (partial_rotary_factor 0.5), relu^2 dense MLP, LN pre-norms
    with bias, untied head. Verified against HF modeling_persimmon.py."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_eps", 1e-5)
        self.rotary_dim = int(
            config.head_dim * hf.get("partial_rotary_factor", 0.5)
        )
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim, config.context_len, base=self.rope_theta,
            rotary_dim=self.rotary_dim, rope_scaling=self.rope_scaling,
        )
        if hf.get("qk_layernorm", True):
            def qk_ln(x, leaf):
                return _layer_norm(x, leaf["w"], leaf["b"], self.norm_eps)

            self.qk_norm_fn = qk_ln

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["dense_h_to_4h"], normed)
        h = jnp.square(jax.nn.relu(h.astype(jnp.float32))).astype(normed.dtype)
        return apply_linear(lp["dense_4h_to_h"], h)

    def layer_schema(self):
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        HqD = cfg.num_attention_heads * cfg.head_dim
        return {
            "input_layernorm": ("ln",),
            "post_attention_layernorm": ("ln",),
            "q_proj": ("lin", Dm, HqD, True),
            "k_proj": ("lin", Dm, HqD, True),
            "v_proj": ("lin", Dm, HqD, True),
            "o_proj": ("lin", HqD, Dm, True),
            "dense_h_to_4h": ("lin", Dm, I, True),
            "dense_4h_to_h": ("lin", I, Dm, True),
        }

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        if self.qk_norm_fn is not None:
            L, D = self.config.num_layers, self.config.head_dim
            for nm in ("q_norm", "k_norm"):
                params["layers"][nm] = {
                    "w": jnp.ones((L, D), self.dtype),
                    "b": jnp.zeros((L, D), self.dtype),
                }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        if self.qk_norm_fn is not None:
            for nm in ("q_norm", "k_norm"):
                specs["layers"][nm] = {"w": P(None, None), "b": P(None, None)}
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, H, D = cfg.num_layers, cfg.num_attention_heads, cfg.head_dim
        qkv = GPTNeoXForCausalLM._split_headpacked(
            self, weights, "model.layers.{}.self_attn.query_key_value", L, H, D
        )
        layers = {
            "input_layernorm": self._stack_ln(
                weights, "model.layers.{}.input_layernorm", L),
            "post_attention_layernorm": self._stack_ln(
                weights, "model.layers.{}.post_attention_layernorm", L),
            "q_proj": qkv["q"],
            "k_proj": qkv["k"],
            "v_proj": qkv["v"],
            "o_proj": self._stack_lin(
                weights, "model.layers.{}.self_attn.dense", L),
            "dense_h_to_4h": self._stack_lin(
                weights, "model.layers.{}.mlp.dense_h_to_4h", L),
            "dense_4h_to_h": self._stack_lin(
                weights, "model.layers.{}.mlp.dense_4h_to_h", L),
        }
        if self.qk_norm_fn is not None:
            for nm, src in (("q_norm", "q_layernorm"), ("k_norm", "k_layernorm")):
                layers[nm] = {
                    "w": jnp.asarray(np.stack([
                        self._get(weights, f"model.layers.{i}.self_attn.{src}.weight")
                        for i in range(L)
                    ]), self.dtype),
                    "b": jnp.asarray(np.stack([
                        self._get(weights, f"model.layers.{i}.self_attn.{src}.bias")
                        for i in range(L)
                    ]), self.dtype),
                }
        return {
            "embed": {"weight": jnp.asarray(self._get(
                weights, "model.embed_tokens.weight"), self.dtype)},
            "layers": layers,
            "norm": self._ln1(weights, "model.final_layernorm"),
            "lm_head": {"kernel": jnp.asarray(
                self._get(weights, "lm_head.weight").T, self.dtype)},
        }
