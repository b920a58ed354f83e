"""DeepSeek NEXTN (MTP) speculative draft head.

Reference: models/deepseek_nextn.py (DeepseekModelNextN) +
speculative/eagle_worker.py with algorithm NEXTN (spec_info.py:4). The MTP
head is one FULL DeepSeek decoder layer (MLA attention + MoE with shared
experts) fed by

    h = eh_proj(concat(enorm(embed(x_i)), hnorm(target_hidden_{i-1})))

with its own embed table, a shared_head final norm, and its own lm_head
over the FULL target vocabulary (deepseek_nextn.py:56-77,142-149) — unlike
EAGLE3 there is no reduced draft vocab / d2t map.

TPU design: the head WRAPS a single-layer DeepseekV2ForCausalLM body and
reuses its MLA latent-cache attention and MoE paths verbatim, so the draft
caches the same ~7x-compressed [latent | k_pe] rows as the target
(models/deepseek_v2.py kv_row_elems) and the whole spec round stays one
jitted device program. The worker rides the eagle3 chain-round driver
(pair-of-(embed, hidden) autoregression + exact/sampled verify) with the
pair consumed from the target's post-final-norm hidden (no aux capture).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.models.llama import StepArrays
from ltp_sglang_tpu.speculative.eagle3 import Eagle3Worker
from ltp_sglang_tpu.speculative.eagle_worker import EagleWorker


def _nextn_body_config(config: ModelConfig) -> ModelConfig:
    """The MTP layer of deepseek V2/V3 checkpoints is a MoE layer: a
    1-layer body config with first_k_dense_replace=0."""
    hf = dict(config.hf_config)
    hf["num_hidden_layers"] = 1
    hf["first_k_dense_replace"] = 0
    return ModelConfig.from_hf_config(
        hf, model_path=config.model_path, dtype=config.dtype,
        context_len=config.context_len, quantization=config.quantization,
        quant_config=config.quant_config,
        kv_cache_dtype=config.kv_cache_dtype,
    )


class NextNDraftHead:
    """enorm/hnorm + eh_proj into ONE deepseek decoder layer (MLA+MoE),
    shared_head norm, own full-vocab lm_head."""

    def __init__(self, config: ModelConfig, kv_write_impl=None):
        from ltp_sglang_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
        from ltp_sglang_tpu.models.llama import to_jnp_dtype

        self.config = config
        self.dtype = to_jnp_dtype(config.dtype)
        self.body = DeepseekV2ForCausalLM(
            _nextn_body_config(config), kv_write_impl=kv_write_impl
        )
        self.rms_eps = self.body.rms_eps
        self.target_vocab = config.hf_config["vocab_size"]

    # Latent MLA rows, same layout as the target (asymmetric K/V).
    def kv_row_elems(self):
        return self.body.kv_row_elems()

    # ------------------------------------------------------------- parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        Dm, V = cfg.hidden_size, self.target_vocab
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 4)

        def w(key, *shape):
            return (
                jax.random.normal(key, shape, dtype=jnp.float32) * 0.02
            ).astype(self.dtype)

        body_p = self.body.init_params(seed + 1)
        # The single MoE layer, stored WITHOUT the scan layer dim.
        layer = jax.tree.map(lambda x: x[0], body_p["layers_moe"])
        return {
            "embed": {"weight": w(ks[0], V, Dm)},
            "enorm": jnp.ones((Dm,), dtype=self.dtype),
            "hnorm": jnp.ones((Dm,), dtype=self.dtype),
            "eh_proj": {"kernel": w(ks[1], 2 * Dm, Dm)},
            "layer": layer,
            "norm": jnp.ones((Dm,), dtype=self.dtype),
            "lm_head": {"kernel": w(ks[2], Dm, V)},
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """NEXTN checkpoint names (deepseek_nextn.py load path): the MTP
        layer ships as model.layers.<N>.* (N = target num_hidden_layers) or
        model.decoder.*, plus model.{embed_tokens,enorm,hnorm,eh_proj} and
        model.shared_head.{norm,head}. bf16 only for now — quantized NEXTN
        drafts load their experts via the body's quant ingestion TODO."""

        def strip(name: str) -> str:
            return name[6:] if name.startswith("model.") else name

        w = {strip(k): v for k, v in weights.items()}
        # Normalize the decoder-layer prefix to "decoder."
        for k in list(w):
            if k.startswith("layers."):
                w["decoder." + k.split(".", 2)[2]] = w.pop(k)

        def get(name):
            if name in w:
                return np.asarray(w[name])
            raise KeyError(name)

        def lin(name):
            return {"kernel": jnp.asarray(get(name).T, dtype=self.dtype)}

        def vec(name):
            return jnp.asarray(get(name), dtype=self.dtype)

        b = self.body
        layer: Dict[str, Any] = {
            "input_layernorm": vec("decoder.input_layernorm.weight"),
            "post_attention_layernorm": vec(
                "decoder.post_attention_layernorm.weight"),
            "kv_a_proj": lin("decoder.self_attn.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": vec("decoder.self_attn.kv_a_layernorm.weight"),
            "kv_b_proj": lin("decoder.self_attn.kv_b_proj.weight"),
            "o_proj": lin("decoder.self_attn.o_proj.weight"),
        }
        if b.q_lora_rank:
            layer["q_a_proj"] = lin("decoder.self_attn.q_a_proj.weight")
            layer["q_a_norm"] = vec("decoder.self_attn.q_a_layernorm.weight")
            layer["q_b_proj"] = lin("decoder.self_attn.q_b_proj.weight")
        else:
            layer["q_proj"] = lin("decoder.self_attn.q_proj.weight")
        layer["router"] = lin("decoder.mlp.gate.weight")
        if "decoder.mlp.gate.e_score_correction_bias" in w:
            layer["e_score_bias"] = jnp.asarray(
                get("decoder.mlp.gate.e_score_correction_bias"), jnp.float32
            )
        E = b.n_routed_experts
        for sub, pkey in (("gate_proj", "experts_gate"),
                          ("up_proj", "experts_up"),
                          ("down_proj", "experts_down")):
            layer[pkey] = jnp.stack(
                [
                    jnp.asarray(
                        get(f"decoder.mlp.experts.{e}.{sub}.weight").T,
                        dtype=self.dtype,
                    )
                    for e in range(E)
                ]
            )
        if b.n_shared_experts:
            layer["shared_gate_proj"] = lin(
                "decoder.mlp.shared_experts.gate_proj.weight")
            layer["shared_up_proj"] = lin(
                "decoder.mlp.shared_experts.up_proj.weight")
            layer["shared_down_proj"] = lin(
                "decoder.mlp.shared_experts.down_proj.weight")
        return {
            "embed": {"weight": jnp.asarray(
                get("embed_tokens.weight"), self.dtype)},
            "enorm": vec("enorm.weight"),
            "hnorm": vec("hnorm.weight"),
            "eh_proj": lin("eh_proj.weight"),
            "layer": layer,
            "norm": vec("shared_head.norm.weight"),
            "lm_head": lin("shared_head.head.weight"),
        }

    # ---------------------------------------------------------------- forward
    def forward(self, params, embeds, hiddens, step: StepArrays,
                k_cache, v_cache):
        """(embeds [B, E, Dm], hiddens [B, E, Dm]) -> (residual hidden,
        k_cache, v_cache). Residual starts at eh_proj's output
        (deepseek_nextn.py:99-113: decoder called with residual=None)."""
        u = jnp.concatenate(
            [
                rms_norm(embeds, params["enorm"], self.rms_eps),
                rms_norm(hiddens, params["hnorm"], self.rms_eps),
            ],
            axis=-1,
        )
        h = apply_linear(params["eh_proj"], u)
        lp = params["layer"]
        h, k_cache, v_cache = self.body._attention(
            lp, h, step, k_cache, v_cache, jnp.int32(0)
        )
        normed = rms_norm(h, lp["post_attention_layernorm"], self.rms_eps)
        tok_valid = (
            jnp.arange(normed.shape[1], dtype=jnp.int32)[None, :]
            < step.extend_lens[:, None]
        )
        h = h + self.body._moe_mlp(lp, normed, tok_valid)
        return h, k_cache, v_cache

    def draft_logits(self, params, h):
        hn = rms_norm(h, params["norm"], self.rms_eps)
        return jnp.einsum(
            "...d,dv->...v", hn, params["lm_head"]["kernel"],
            preferred_element_type=jnp.float32,
        )

    def draft_argmax_target_ids(self, params, h):
        """Full-vocab head: the draft argmax IS the target token id."""
        return jnp.argmax(self.draft_logits(params, h), axis=-1).astype(
            jnp.int32
        )


class NextNWorker(Eagle3Worker):
    """NEXTN rides the eagle3 chain driver (own embed + own lm_head) but
    pairs with the target's POST-FINAL-NORM hidden — no aux capture."""

    kind = "nextn"
    head_cls = NextNDraftHead
    wants_aux = False

    def __init__(self, runner, server_args):
        # Skip Eagle3Worker.__init__: it turns on the target's aux-hidden
        # capture, which NEXTN does not use.
        EagleWorker.__init__(self, runner, server_args)

    def _head_kv_elems(self, head_cfg: ModelConfig):
        from ltp_sglang_tpu.utils import round_up

        if head_cfg.hf_config.get("kv_lora_rank"):
            k = round_up(
                head_cfg.hf_config["kv_lora_rank"]
                + head_cfg.hf_config.get("qk_rope_head_dim", 0),
                256,
            )
            return k, 128
        return super()._head_kv_elems(head_cfg)

    def _prep_hidden(self, dp, hid):
        return hid  # target post-norm hidden used directly

    def _pair_embed_table(self, tp, dp):
        return dp["embed"]["weight"]
