"""Qwen2-Audio (Qwen2AudioForConditionalGeneration) — the audio modality.

Reference: python/sglang/srt/models/qwen2_audio.py. Facts verified against
HF transformers modeling_qwen2_audio.py:
- audio_tower = Whisper-style encoder: conv1 (k3 s1 p1, gelu) -> conv2
  (k3 s2 p1, gelu) -> + learned positions -> pre-norm transformer layers
  (LayerNorm with bias; q/v/out biased, k unbiased; gelu fc1/fc2) ->
  AvgPool1d(2,2) -> final LayerNorm.
- multi_modal_projector: one biased linear d_model -> hidden_size.
- <|AUDIO|> placeholder tokens expand to max_source_positions // 2
  positions (fixed 30 s mel windows keep the tower compile-time static,
  like the fixed-resolution VLM towers here).

The serving side reuses the generic multimodal pipeline: the processor
(multimodal/processor.py) computes Whisper log-mel features, hashes them
into radix-distinguishing pad ids, and `encode_images` (the shared encode
hook; features are audio mels here) produces the projected embeddings the
scheduler splices at prefill.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.qwen2 import Qwen2ForCausalLM


def _layer_norm(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


class Qwen2AudioForConditionalGeneration(Qwen2ForCausalLM):
    supports_quant_fusion = False  # language_model-prefixed checkpoints
    audio_modality = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf_raw = config.hf_config
        ac = hf_raw.get("audio_config", {})
        self.audio_cfg = ac
        self.a_dim = ac.get("d_model", 1280)
        self.a_layers = ac.get("encoder_layers", 32)
        self.a_heads = ac.get("encoder_attention_heads", 20)
        self.a_ffn = ac.get("encoder_ffn_dim", 5120)
        self.n_mel = ac.get("num_mel_bins", 128)
        self.max_source_positions = ac.get("max_source_positions", 1500)
        self.image_token_index = hf_raw.get(
            "audio_token_id", hf_raw.get("audio_token_index", 151646)
        )

    @property
    def num_image_tokens(self) -> int:
        return self.max_source_positions // 2

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        key_box = [jax.random.PRNGKey(seed + 11)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (
                jax.random.normal(sub, shape, jnp.float32) * scale
            ).astype(self.dtype)

        Da, F, H = self.a_dim, self.a_ffn, self.a_layers
        zeros = lambda *s: jnp.zeros(s, self.dtype)
        ones = lambda *s: jnp.ones(s, self.dtype)
        params["audio"] = {
            "conv1": {"kernel": w(Da, self.n_mel, 3), "bias": zeros(Da)},
            "conv2": {"kernel": w(Da, Da, 3), "bias": zeros(Da)},
            "pos": w(self.max_source_positions, Da),
            "layers": {
                "q_proj": {"kernel": w(H, Da, Da), "bias": zeros(H, Da)},
                "k_proj": {"kernel": w(H, Da, Da)},
                "v_proj": {"kernel": w(H, Da, Da), "bias": zeros(H, Da)},
                "out_proj": {"kernel": w(H, Da, Da), "bias": zeros(H, Da)},
                "attn_ln_w": ones(H, Da), "attn_ln_b": zeros(H, Da),
                "fc1": {"kernel": w(H, Da, F), "bias": zeros(H, F)},
                "fc2": {"kernel": w(H, F, Da), "bias": zeros(H, Da)},
                "final_ln_w": ones(H, Da), "final_ln_b": zeros(H, Da),
            },
            "ln_w": ones(Da), "ln_b": zeros(Da),
        }
        Dm = self.config.hidden_size
        params["projector"] = {
            "kernel": w(Da, Dm), "bias": zeros(Dm),
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        dummy = None
        # Tower + projector replicate (encoded rarely relative to decode).
        import jax as _jax

        probe = self.init_params(0)
        specs["audio"] = _jax.tree.map(
            lambda a: P(*([None] * a.ndim)), probe["audio"]
        )
        specs["projector"] = {"kernel": P(None, None), "bias": P(None)}
        del dummy, probe
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        lm_weights = {}
        for name, wv in weights.items():
            if name.startswith("language_model."):
                lm_weights[name[len("language_model."):]] = wv
        params = super().convert_hf_weights(lm_weights)

        g = lambda n: np.asarray(weights[f"audio_tower.{n}"])
        H = self.a_layers

        def stack_lin(sub, bias=True):
            d = {
                "kernel": jnp.asarray(
                    np.stack([g(f"layers.{i}.{sub}.weight").T for i in range(H)]),
                    self.dtype,
                )
            }
            if bias:
                d["bias"] = jnp.asarray(
                    np.stack([g(f"layers.{i}.{sub}.bias") for i in range(H)]),
                    self.dtype,
                )
            return d

        def stack_vec(sub):
            return jnp.asarray(
                np.stack([g(f"layers.{i}.{sub}") for i in range(H)]), self.dtype
            )

        params["audio"] = {
            "conv1": {"kernel": jnp.asarray(g("conv1.weight"), self.dtype),
                      "bias": jnp.asarray(g("conv1.bias"), self.dtype)},
            "conv2": {"kernel": jnp.asarray(g("conv2.weight"), self.dtype),
                      "bias": jnp.asarray(g("conv2.bias"), self.dtype)},
            "pos": jnp.asarray(g("embed_positions.weight"), self.dtype),
            "layers": {
                "q_proj": stack_lin("self_attn.q_proj"),
                "k_proj": stack_lin("self_attn.k_proj", bias=False),
                "v_proj": stack_lin("self_attn.v_proj"),
                "out_proj": stack_lin("self_attn.out_proj"),
                "attn_ln_w": stack_vec("self_attn_layer_norm.weight"),
                "attn_ln_b": stack_vec("self_attn_layer_norm.bias"),
                "fc1": stack_lin("fc1"),
                "fc2": stack_lin("fc2"),
                "final_ln_w": stack_vec("final_layer_norm.weight"),
                "final_ln_b": stack_vec("final_layer_norm.bias"),
            },
            "ln_w": jnp.asarray(g("layer_norm.weight"), self.dtype),
            "ln_b": jnp.asarray(g("layer_norm.bias"), self.dtype),
        }
        params["projector"] = {
            "kernel": jnp.asarray(
                np.asarray(weights["multi_modal_projector.linear.weight"]).T,
                self.dtype,
            ),
            "bias": jnp.asarray(
                np.asarray(weights["multi_modal_projector.linear.bias"]),
                self.dtype,
            ),
        }
        return params

    # --------------------------------------------------------------- encode
    def encode_images(self, params, features):
        """Audio mels [N, n_mel, 3000] -> projected embeddings
        [N, max_source_positions // 2, Dm]."""
        ap = params["audio"]
        x = features.astype(jnp.float32)  # [N, mel, T0]
        # conv1: k3 s1 p1 over time.
        x = jax.lax.conv_general_dilated(
            x, ap["conv1"]["kernel"].astype(jnp.float32),
            window_strides=(1,), padding=((1, 1),),
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + ap["conv1"]["bias"].astype(jnp.float32)[None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, ap["conv2"]["kernel"].astype(jnp.float32),
            window_strides=(2,), padding=((1, 1),),
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + ap["conv2"]["bias"].astype(jnp.float32)[None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        h = x.transpose(0, 2, 1).astype(self.dtype)  # [N, T, Da]
        h = h + ap["pos"][None, : h.shape[1]]

        Da, nh = self.a_dim, self.a_heads
        hd = Da // nh
        scale = hd ** -0.5

        def layer(h, lp):
            res = h
            x = _layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"])
            q = (x @ lp["q_proj"]["kernel"] + lp["q_proj"]["bias"]) * scale
            k = x @ lp["k_proj"]["kernel"]
            v = x @ lp["v_proj"]["kernel"] + lp["v_proj"]["bias"]
            N, T, _ = x.shape
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            scores = jnp.einsum("nthd,nshd->nhts", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("nhts,nshd->nthd", p, v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(N, T, Da).astype(x.dtype)
            h = res + (o @ lp["out_proj"]["kernel"] + lp["out_proj"]["bias"])
            res = h
            x = _layer_norm(h, lp["final_ln_w"], lp["final_ln_b"])
            x = jax.nn.gelu(
                (x @ lp["fc1"]["kernel"] + lp["fc1"]["bias"]).astype(jnp.float32),
                approximate=False,
            ).astype(x.dtype)
            h = res + (x @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])
            return h, None

        h, _ = jax.lax.scan(layer, h, ap["layers"])
        # AvgPool1d(2, 2) over time, then the final LayerNorm.
        N, T, _ = h.shape
        h = h[:, : (T // 2) * 2].reshape(N, T // 2, 2, Da).mean(axis=2)
        h = _layer_norm(h, ap["ln_w"], ap["ln_b"])
        proj = params["projector"]
        out = (
            h.astype(jnp.float32) @ proj["kernel"].astype(jnp.float32)
            + proj["bias"].astype(jnp.float32)
        )
        return out.astype(self.dtype)
