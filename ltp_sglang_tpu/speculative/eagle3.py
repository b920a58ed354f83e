"""EAGLE3 speculative decoding (chain mode).

Reference: models/llama_eagle3.py + speculative/eagle_worker.py (algorithm
enum EAGLE3, spec_info.py:4). Differences from the EAGLE-1/2 head
(eagle_head.py / eagle_worker.py):

- The target exposes CONCATENATED aux hidden states from three depths
  (residual stream after layers [1, L/2-1, L-4]; models/llama.py
  return_aux) instead of the post-final-norm hidden; the draft's
  fc [3D -> D] maps them into the pair space (worker._prep_hidden).
- The "midlayer" consumes the RAW 2D concat (norm(embed) || norm(hidden))
  directly — q/k/v projections have input width 2D; there is no pair fc.
- The draft has its OWN embed table, final norm, and lm_head over a REDUCED
  draft vocabulary, with d2t index offsets mapping draft argmaxes back to
  target token ids (t2d marks target ids the draft can propose).

Verification stays exact, so a randomly-initialized head reproduces the
target's greedy outputs bit-for-bit (the e2e test) — head quality only
moves the acceptance rate.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from ltp_sglang_tpu.models.llama import StepArrays
from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention
from ltp_sglang_tpu.speculative.eagle_worker import EagleRoundBatch, EagleWorker


class Eagle3DraftHead:
    """EAGLE3 midlayer: one decoder layer whose attention reads the 2D
    concat pair; plus fc (3D->D aux map), own embed/norm/lm_head/d2t."""

    def __init__(self, config: ModelConfig, kv_write_impl=None):
        from ltp_sglang_tpu.models.llama import to_jnp_dtype
        from ltp_sglang_tpu.ops.kv_cache_ops import kv_write_pallas, kv_write_xla

        self.config = config
        self.dtype = to_jnp_dtype(config.dtype)
        hf = config.hf_config
        self.rms_eps = hf.get("rms_norm_eps", 1e-6)
        self.rope_theta = hf.get("rope_theta", 10000.0)
        self.sm_scale = config.head_dim**-0.5
        self.draft_vocab = hf.get("draft_vocab_size", hf.get("vocab_size"))
        self.target_vocab = hf.get("vocab_size")
        self.kv_write = kv_write_impl or (
            kv_write_pallas if jax.default_backend() == "tpu" else kv_write_xla
        )
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim, config.context_len, self.rope_theta
        )

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        Vd, Vt = self.draft_vocab, self.target_vocab
        key = jax.random.PRNGKey(seed)

        def w(key, *shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02).astype(
                self.dtype
            )

        ks = jax.random.split(key, 12)
        return {
            "embed": {"weight": w(ks[0], Vt, Dm)},
            "fc": {"kernel": w(ks[1], 3 * Dm, Dm)},
            "input_layernorm": jnp.ones((Dm,), dtype=self.dtype),
            "hidden_norm": jnp.ones((Dm,), dtype=self.dtype),
            "q_proj": {"kernel": w(ks[2], 2 * Dm, Hq * D)},
            "k_proj": {"kernel": w(ks[3], 2 * Dm, Hkv * D)},
            "v_proj": {"kernel": w(ks[4], 2 * Dm, Hkv * D)},
            "o_proj": {"kernel": w(ks[5], Hq * D, Dm)},
            "post_attention_layernorm": jnp.ones((Dm,), dtype=self.dtype),
            "gate_proj": {"kernel": w(ks[6], Dm, I)},
            "up_proj": {"kernel": w(ks[7], Dm, I)},
            "down_proj": {"kernel": w(ks[8], I, Dm)},
            "norm": jnp.ones((Dm,), dtype=self.dtype),
            "lm_head": {"kernel": w(ks[9], Dm, Vd)},
            # Identity vocab map for dummy heads (draft id == target id).
            "d2t": jnp.zeros((Vd,), jnp.int32),
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """EAGLE3 HF checkpoints: fc.weight, midlayer.*, norm, lm_head,
        d2t/t2d buffers."""

        def get(name):
            for cand in (name, f"model.{name}"):
                if cand in weights:
                    return np.asarray(weights[cand])
            raise KeyError(name)

        def lin(name):
            return {"kernel": jnp.asarray(get(name).T, dtype=self.dtype)}

        def vec(name):
            return jnp.asarray(get(name), dtype=self.dtype)

        p = {
            "embed": {"weight": jnp.asarray(
                get("embed_tokens.weight"), self.dtype)},
            "fc": lin("fc.weight"),
            "input_layernorm": vec("midlayer.input_layernorm.weight"),
            "hidden_norm": vec("midlayer.hidden_norm.weight"),
            "q_proj": lin("midlayer.self_attn.q_proj.weight"),
            "k_proj": lin("midlayer.self_attn.k_proj.weight"),
            "v_proj": lin("midlayer.self_attn.v_proj.weight"),
            "o_proj": lin("midlayer.self_attn.o_proj.weight"),
            "post_attention_layernorm": vec(
                "midlayer.post_attention_layernorm.weight"),
            "gate_proj": lin("midlayer.mlp.gate_proj.weight"),
            "up_proj": lin("midlayer.mlp.up_proj.weight"),
            "down_proj": lin("midlayer.mlp.down_proj.weight"),
            "norm": vec("norm.weight"),
            "lm_head": lin("lm_head.weight"),
        }
        try:
            p["d2t"] = jnp.asarray(get("d2t"), jnp.int32)
        except KeyError:
            p["d2t"] = jnp.zeros((self.draft_vocab,), jnp.int32)
        return p

    # ---------------------------------------------------------------- forward
    def forward(self, params, embeds, hiddens, step: StepArrays,
                k_cache, v_cache):
        """(embeds [B, E, Dm], hiddens [B, E, Dm] pair) -> (residual-stream
        hidden [B, E, Dm], k_cache, v_cache). Residual starts from the
        HIDDEN half (llama_eagle3.LlamaDecoderLayer)."""
        cfg = self.config
        B, E, Dm = embeds.shape
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        residual = hiddens
        u = jnp.concatenate(
            [
                rms_norm(embeds, params["input_layernorm"], self.rms_eps),
                rms_norm(hiddens, params["hidden_norm"], self.rms_eps),
            ],
            axis=-1,
        )  # [B, E, 2*Dm]
        q = apply_linear(params["q_proj"], u).reshape(B, E, Hq, D)
        k = apply_linear(params["k_proj"], u).reshape(B, E, Hkv, D)
        v = apply_linear(params["v_proj"], u).reshape(B, E, Hkv, D)
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
        h = residual + apply_linear(
            params["o_proj"], attn.reshape(B, E, Hq * D)
        )
        normed = rms_norm(h, params["post_attention_layernorm"], self.rms_eps)
        gate = apply_linear(params["gate_proj"], normed)
        up = apply_linear(params["up_proj"], normed)
        h = h + apply_linear(params["down_proj"], jax.nn.silu(gate) * up)
        return h, k_cache, v_cache

    def draft_logits(self, params, h):
        """Residual stream -> draft-vocab logits (own norm + lm_head)."""
        hn = rms_norm(h, params["norm"], self.rms_eps)
        return jnp.einsum(
            "...d,dv->...v", hn, params["lm_head"]["kernel"],
            preferred_element_type=jnp.float32,
        )

    def draft_argmax_target_ids(self, params, h):
        """Greedy next-token proposal mapped to TARGET vocab via d2t
        (target_id = draft_idx + d2t[draft_idx])."""
        idx = jnp.argmax(self.draft_logits(params, h), axis=-1).astype(jnp.int32)
        return idx + params["d2t"][idx]


class Eagle3Worker(EagleWorker):
    kind = "eagle3"
    head_cls = Eagle3DraftHead
    # Verify captures the target's concat aux hiddens for the next pair;
    # NEXTN subclasses flip this off and pair with the post-norm hidden.
    wants_aux = True

    def __init__(self, runner, server_args):
        super().__init__(runner, server_args)
        # The runner's want_hidden step returns the concat aux hiddens for
        # prompt coverage (model_runner._build_step_fn).
        runner.spec_aux_hidden = True

    def _prep_hidden(self, dp, hid):
        if hid.shape[-1] == 3 * self.runner.model_config.hidden_size:
            return apply_linear(dp["fc"], hid.astype(dp["fc"]["kernel"].dtype))
        return hid

    def _pair_embed_table(self, tp, dp):
        return dp["embed"]["weight"]  # eagle3 ships its own embed table

    def _tree_topk(self, tp, dp, g, T):
        """Tree proposal via the head's OWN norm/lm_head over the reduced
        draft vocab; argtop indices map to target ids through d2t
        (target_id = idx + d2t[idx]). NEXTN inherits this with a full-vocab
        lm_head and no d2t leaf (identity map). The next pair hidden is the
        raw residual stream (llama_eagle3 semantics), not a normed copy."""
        lp = jax.nn.log_softmax(self.draft.model.draft_logits(dp, g), axis=-1)
        sc, idx = jax.lax.top_k(lp, T)
        idx = idx.astype(jnp.int32)
        if "d2t" in dp:
            idx = idx + dp["d2t"][idx]
        return sc, idx, g

    # ------------------------------------------------------------- spec round
    def _build_round_fn(self, B, K, C, sampled: bool = False):
        t_model = self.runner.model
        head = self.draft.model
        table_merge = self._table_merge

        def round_fn(tp, dp, t_kc, t_vc, t_tbl, d_kc, d_vc, d_tbl,
                     input_ids, h_prev, seq0, t_slots, d_slots, t_req, d_req,
                     temperatures, top_ps, top_ks, min_ps, step_idx):
            cols = jnp.arange(C, dtype=jnp.int32)[None, :]
            start = jnp.maximum(seq0 - 1, 0)[:, None]
            d_base = d_tbl[d_req, :C]
            off = jnp.clip(cols - start, 0, K)
            d_kv_idx = jnp.where(
                (cols >= start) & (cols < start + K + 1),
                jnp.take_along_axis(d_slots, off, axis=1),
                d_base,
            )
            emb_table = dp["embed"]["weight"]

            def draft_body(j, carry):
                tok, hid, kc, vc, drafts = carry
                pos = jnp.maximum(seq0 - 1 + j, 0)
                slot_j = jax.lax.dynamic_slice_in_dim(d_slots, j, 1, axis=1)
                step = StepArrays(
                    tok[:, None], pos[:, None], slot_j,
                    seq0 + j, jnp.maximum(seq0 + j - 1, 0),
                    jnp.ones((B,), jnp.int32), d_kv_idx,
                )
                emb = emb_table[tok][:, None, :]
                g, kc, vc = head.forward(
                    dp, emb, hid[:, None, :].astype(emb.dtype), step, kc, vc
                )
                g = g[:, 0]  # [B, Dm] residual stream
                nxt = head.draft_argmax_target_ids(dp, g)
                drafts = jax.lax.dynamic_update_slice(drafts, nxt[:, None], (0, j))
                return nxt, g.astype(h_prev.dtype), kc, vc, drafts

            drafts0 = jnp.zeros((B, K), jnp.int32)
            _, _, d_kc, d_vc, drafts = jax.lax.fori_loop(
                0, K, draft_body, (input_ids, h_prev, d_kc, d_vc, drafts0)
            )

            # ---- target verify (also returns the eagle3 aux hiddens).
            ver_ids = jnp.concatenate([input_ids[:, None], drafts], axis=1)
            pos = jnp.maximum(
                seq0[:, None] - 1 + jnp.arange(K + 1, dtype=jnp.int32)[None, :], 0
            )
            t_base = t_tbl[t_req, :C]
            t_kv_idx = jnp.where(
                (cols >= start) & (cols < start + K + 1),
                jnp.take_along_axis(t_slots, off, axis=1),
                t_base,
            )
            step = StepArrays(
                ver_ids, pos, t_slots,
                seq0 + K, jnp.maximum(seq0 - 1, 0),
                jnp.full((B,), K + 1, jnp.int32), t_kv_idx,
            )
            if self.wants_aux:
                hid_t, aux_t, t_kc, t_vc = t_model.forward(
                    tp, step, t_kc, t_vc, return_hidden=True, return_aux=True
                )  # [B, K+1, Dm], [B, K+1, 3*Dm]
            else:
                hid_t, t_kc, t_vc = t_model.forward(
                    tp, step, t_kc, t_vc, return_hidden=True
                )
                aux_t = hid_t  # NEXTN pairs with the post-norm hidden
            ver_logits = t_model._lm_head(tp, hid_t, step, True)
            t_tbl = table_merge(
                t_tbl, t_req, jnp.maximum(seq0 - 1, 0), t_slots, K + 1
            )

            if sampled:
                from ltp_sglang_tpu.speculative.spec_sampling import (
                    spec_accept_chain,
                    spec_accept_chain_free,
                )

                rkey = jax.random.fold_in(self.runner._rng_key, step_idx)
                if sampled == "free":
                    preds, accepted = spec_accept_chain_free(
                        ver_logits, drafts, temperatures, top_ks, rkey
                    )
                else:
                    preds, accepted = spec_accept_chain(
                        ver_logits, drafts, temperatures, top_ps, top_ks,
                        min_ps, rkey,
                    )
            else:
                preds = jnp.argmax(ver_logits, axis=-1).astype(jnp.int32)
                match = preds[:, :K] == drafts
                accepted = jnp.sum(
                    jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
                )

            # ---- draft KV refresh with fc(aux) pair hiddens.
            pair_hid = self._prep_hidden(dp, aux_t)  # [B, K+1, Dm]
            t_idx = jnp.arange(1, K + 1, dtype=jnp.int32)[None, :]
            valid = t_idx <= accepted[:, None]
            ref_slots = jnp.where(valid, d_slots[:, 1:], 0)
            ref_pos = jnp.maximum(seq0[:, None] - 1 + t_idx, 0)
            ref_emb = emb_table[ver_ids[:, 1:]]
            ref_hid = pair_hid[:, :K]
            step_r = StepArrays(
                ver_ids[:, 1:], ref_pos, ref_slots,
                seq0 + jnp.minimum(accepted, K), jnp.maximum(seq0 - 1, 0),
                jnp.maximum(accepted, 1), d_kv_idx,
            )
            _, d_kc, d_vc = head.forward(
                dp, ref_emb, ref_hid.astype(ref_emb.dtype), step_r, d_kc, d_vc
            )
            d_tbl = table_merge(
                d_tbl, d_req, jnp.maximum(seq0 - 1, 0), d_slots, K + 1
            )
            h_next = jnp.take_along_axis(
                pair_hid, accepted[:, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            return preds, accepted, h_next, t_kc, t_vc, t_tbl, d_kc, d_vc, d_tbl

        return jax.jit(round_fn, donate_argnums=(2, 3, 4, 5, 6, 7))
