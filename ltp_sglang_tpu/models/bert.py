"""BERT-family encoders (bert / xlm-roberta) for the embedding API.

Reference: python/sglang/srt/models/bert.py (BertModel served encode-only).
Encode-only: the whole input arrives as ONE extend chunk and attention is
BIDIRECTIONAL over the real tokens; nothing is written to or read from the
KV pools (the caches pass through untouched). Pooling happens in the
runner's embed step (hf_config.pooling_type: cls / mean / last —
reference pooler semantics; e5-style checkpoints use cls or mean).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class BertModel:
    """Embedding-only encoder; registered for BertModel / XLMRobertaModel."""

    is_encoder_only = True
    supports_quant_fusion = False
    supports_pp = False
    forward_window_token = None
    forward_window_token_paged = None

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        from ltp_sglang_tpu.models.llama import to_jnp_dtype

        self.config = config
        self.dtype = to_jnp_dtype(config.dtype)
        hf = config.hf_config
        self.eps = hf.get("layer_norm_eps", 1e-12)
        self.type_vocab = hf.get("type_vocab_size", 2)
        # xlm-roberta offsets positions by pad_token_id + 1.
        self.pos_offset = (
            hf.get("pad_token_id", 1) + 1
            if hf.get("model_type") in ("xlm-roberta", "roberta") else 0
        )
        self.tie_word_embeddings = False
        self.rms_eps = 1e-6  # unused; llama-contract compatibility

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        hf = cfg.hf_config
        L, Dm, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        V = hf["vocab_size"]
        Pmax = hf.get("max_position_embeddings", 512)
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (jax.random.normal(sub, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        def lin(K, N, lead=()):
            return {"kernel": w(*lead, K, N),
                    "bias": jnp.zeros(lead + (N,), self.dtype)}

        def ln(lead=()):
            return {"w": jnp.ones(lead + (Dm,), self.dtype),
                    "b": jnp.zeros(lead + (Dm,), self.dtype)}

        return {
            "embed": {"weight": w(V, Dm)},
            "pos_embed": {"weight": w(Pmax, Dm)},
            "type_embed": {"weight": w(self.type_vocab, Dm)},
            "embed_ln": ln(),
            "layers": {
                "q": lin(Dm, Dm, (L,)), "k": lin(Dm, Dm, (L,)),
                "v": lin(Dm, Dm, (L,)), "o": lin(Dm, Dm, (L,)),
                "attn_ln": ln((L,)),
                "fc1": lin(Dm, I, (L,)), "fc2": lin(I, Dm, (L,)),
                "out_ln": ln((L,)),
            },
        }

    def param_specs(self) -> Dict[str, Any]:
        dummy = self.init_params(0)
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), dummy)

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers

        def get(name):
            for cand in (name, f"bert.{name}", f"roberta.{name}"):
                if cand in weights:
                    return np.asarray(weights[cand])
            raise KeyError(name)

        def lin(sub):
            return {
                "kernel": jnp.asarray(np.stack(
                    [get(f"encoder.layer.{i}.{sub}.weight").T for i in range(L)]
                ), self.dtype),
                "bias": jnp.asarray(np.stack(
                    [get(f"encoder.layer.{i}.{sub}.bias") for i in range(L)]
                ), self.dtype),
            }

        def ln(sub):
            return {
                "w": jnp.asarray(np.stack(
                    [get(f"encoder.layer.{i}.{sub}.weight") for i in range(L)]
                ), self.dtype),
                "b": jnp.asarray(np.stack(
                    [get(f"encoder.layer.{i}.{sub}.bias") for i in range(L)]
                ), self.dtype),
            }

        return {
            "embed": {"weight": jnp.asarray(
                get("embeddings.word_embeddings.weight"), self.dtype)},
            "pos_embed": {"weight": jnp.asarray(
                get("embeddings.position_embeddings.weight"), self.dtype)},
            "type_embed": {"weight": jnp.asarray(
                get("embeddings.token_type_embeddings.weight"), self.dtype)},
            "embed_ln": {
                "w": jnp.asarray(get("embeddings.LayerNorm.weight"), self.dtype),
                "b": jnp.asarray(get("embeddings.LayerNorm.bias"), self.dtype),
            },
            "layers": {
                "q": lin("attention.self.query"),
                "k": lin("attention.self.key"),
                "v": lin("attention.self.value"),
                "o": lin("attention.output.dense"),
                "attn_ln": ln("attention.output.LayerNorm"),
                "fc1": lin("intermediate.dense"),
                "fc2": lin("output.dense"),
                "out_ln": ln("output.LayerNorm"),
            },
        }

    # ---------------------------------------------------------------- forward
    def forward(self, params, step, k_cache, v_cache, all_logits=False,
                lora=None, return_hidden=False, input_embeds=None):
        cfg = self.config
        B, E = step.input_ids.shape
        H = cfg.num_attention_heads
        Dm = cfg.hidden_size
        Dh = Dm // H

        ids = jnp.clip(step.input_ids, 0, params["embed"]["weight"].shape[0] - 1)
        h = (
            params["embed"]["weight"][ids]
            + params["pos_embed"]["weight"][step.positions + self.pos_offset]
            + params["type_embed"]["weight"][0][None, None, :]
        )
        h = _ln(h, params["embed_ln"]["w"], params["embed_ln"]["b"], self.eps)

        # Bidirectional over real tokens; padded positions masked out.
        valid = jnp.arange(E, dtype=jnp.int32)[None, :] < step.extend_lens[:, None]
        mask = valid[:, None, :]  # [B, 1(q), E(kv)]

        def layer(hh, lp):
            q = (jnp.einsum("bed,dk->bek", hh, lp["q"]["kernel"]) + lp["q"]["bias"])
            k = (jnp.einsum("bed,dk->bek", hh, lp["k"]["kernel"]) + lp["k"]["bias"])
            v = (jnp.einsum("bed,dk->bek", hh, lp["v"]["kernel"]) + lp["v"]["bias"])
            q = q.reshape(B, E, H, Dh)
            k = k.reshape(B, E, H, Dh)
            v = v.reshape(B, E, H, Dh)
            s = jnp.einsum("bthd,bshd->bhts", q, k,
                           preferred_element_type=jnp.float32) * (Dh ** -0.5)
            s = jnp.where(mask[:, None, :, :], s, -jnp.inf)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
            e = jnp.exp(s - m)
            p = (e / jnp.maximum(e.sum(-1, keepdims=True), 1e-30)).astype(v.dtype)
            o = jnp.einsum("bhts,bshd->bthd", p, v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(B, E, Dm).astype(hh.dtype)
            o = jnp.einsum("bed,dk->bek", o, lp["o"]["kernel"]) + lp["o"]["bias"]
            hh = _ln(hh + o.astype(hh.dtype), lp["attn_ln"]["w"],
                     lp["attn_ln"]["b"], self.eps)
            y = jnp.einsum("bed,di->bei", hh, lp["fc1"]["kernel"]) + lp["fc1"]["bias"]
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(hh.dtype)
            y = jnp.einsum("bei,id->bed", y, lp["fc2"]["kernel"]) + lp["fc2"]["bias"]
            hh = _ln(hh + y.astype(hh.dtype), lp["out_ln"]["w"],
                     lp["out_ln"]["b"], self.eps)
            return hh, None

        h, _ = jax.lax.scan(layer, h, params["layers"])
        if return_hidden:
            return h, k_cache, v_cache
        raise NotImplementedError(
            "BertModel is encoder-only: use the encode/embedding API "
            "(reference models/bert.py serves it the same way)"
        )


class XLMRobertaForSequenceClassification(BertModel):
    """Cross-encoder reranker head (reference models/roberta.py
    RobertaClassificationHead): CLS hidden -> dense -> tanh -> out_proj,
    served through the embed step's MLP score-head slot with tanh."""

    is_classification = True
    score_act = "tanh"

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.num_labels = config.hf_config.get("num_labels", 1)
        # The classifier reads the <s>/[CLS] position.
        config.hf_config.setdefault("classifier_pooling", "cls")

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        Dm = self.config.hidden_size
        params["score"] = {
            "w0": jnp.zeros((Dm, Dm), jnp.float32),
            "b0": jnp.zeros((Dm,), jnp.float32),
            "w2": jnp.zeros((Dm, self.num_labels), jnp.float32),
            "b2": jnp.zeros((self.num_labels,), jnp.float32),
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["score"] = {
            "w0": P(None, None), "b0": P(None),
            "w2": P(None, None), "b2": P(None),
        }
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        params["score"] = {
            "w0": jnp.asarray(
                np.asarray(weights["classifier.dense.weight"]).T, jnp.float32),
            "b0": jnp.asarray(
                np.asarray(weights["classifier.dense.bias"]), jnp.float32),
            "w2": jnp.asarray(
                np.asarray(weights["classifier.out_proj.weight"]).T, jnp.float32),
            "b2": jnp.asarray(
                np.asarray(weights["classifier.out_proj.bias"]), jnp.float32),
        }
        return params
