"""XVERSE — XverseForCausalLM.

Reference: python/sglang/srt/models/xverse.py. Verified against it: the
architecture is the llama body exactly — separate q/k/v/o projections with
llama names, SwiGLU mlp with gate/up/down, RMSNorm pre-norms, full-width
neox rope (reference :84-160 mirrors its llama.py line for line, GQA via
num_key_value_heads). Checkpoints use llama leaf names, so the base
converter applies unchanged.
"""

from __future__ import annotations

from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class XverseForCausalLM(LlamaForCausalLM):
    pass


class XverseMoeForCausalLM(XverseForCausalLM):
    """XVERSE-MoE-A4.2B: every layer is MoE — softmax router (`mlp.router`)
    -> top `moe_top_k` (renormalize iff norm_topk_prob), experts are
    intermediate_size SwiGLU MLPs, plus an ungated always-on shared MLP of
    intermediate_size * num_shared_experts.

    Reference: python/sglang/srt/models/xverse_moe.py:100-185 (fused_moe
    call with renormalize=norm_topk_prob; shared_experts added without a
    gate)."""

    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.num_experts = hf.get("num_experts", 8)
        self.top_k = hf.get("moe_top_k", 2)
        self.norm_topk_prob = bool(hf.get("norm_topk_prob", False))
        self.n_shared = hf.get("num_shared_experts", 0) or 0

    def init_params(self, seed: int = 0):
        import jax
        import jax.numpy as jnp

        params = super().init_params(seed)
        cfg = self.config
        L, Dm, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        E = self.num_experts
        key = jax.random.PRNGKey(seed + 5)

        def w(key, *shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02
                    ).astype(self.dtype)

        ks = jax.random.split(key, 7)
        layers = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(name, None)
        layers["router"] = {"kernel": w(ks[0], L, Dm, E)}
        layers["experts_gate"] = w(ks[1], L, E, Dm, I)
        layers["experts_up"] = w(ks[2], L, E, Dm, I)
        layers["experts_down"] = w(ks[3], L, E, I, Dm)
        if self.n_shared:
            Is = I * self.n_shared
            layers["shared_gate_proj"] = {"kernel": w(ks[4], L, Dm, Is)}
            layers["shared_up_proj"] = {"kernel": w(ks[5], L, Dm, Is)}
            layers["shared_down_proj"] = {"kernel": w(ks[6], L, Is, Dm)}
        return params

    def param_specs(self):
        from jax.sharding import PartitionSpec as P

        specs = super().param_specs()
        ls = specs["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)
        ls["router"] = {"kernel": P(None, None, None)}
        ls["experts_gate"] = P(None, "tp", None, None)
        ls["experts_up"] = P(None, "tp", None, None)
        ls["experts_down"] = P(None, "tp", None, None)
        if self.n_shared:
            ls["shared_gate_proj"] = {"kernel": P(None, None, "tp")}
            ls["shared_up_proj"] = {"kernel": P(None, None, "tp")}
            ls["shared_down_proj"] = {"kernel": P(None, "tp", None)}
        return specs

    def convert_hf_weights(self, weights):
        import jax.numpy as jnp
        import numpy as np

        cfg = self.config
        L, E = cfg.num_layers, self.num_experts

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        for i in range(L):
            for tgt in ("gate_proj", "up_proj", "down_proj"):
                weights.setdefault(
                    f"model.layers.{i}.mlp.{tgt}.weight",
                    np.asarray(get(f"model.layers.{i}.mlp.experts.0.{tgt}.weight")),
                )
        params = super().convert_hf_weights(weights)
        layers = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(name, None)

        def lin(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight")).T

        def stack_experts(src):
            return jnp.asarray(
                np.stack([
                    np.stack([lin(i, f"mlp.experts.{e}.{src}") for e in range(E)])
                    for i in range(L)
                ]),
                dtype=self.dtype,
            )

        layers["router"] = {"kernel": jnp.asarray(
            np.stack([lin(i, "mlp.router") for i in range(L)]), dtype=self.dtype
        )}
        layers["experts_gate"] = stack_experts("gate_proj")
        layers["experts_up"] = stack_experts("up_proj")
        layers["experts_down"] = stack_experts("down_proj")
        if self.n_shared:
            for tgt, src in (
                ("shared_gate_proj", "mlp.shared_experts.gate_proj"),
                ("shared_up_proj", "mlp.shared_experts.up_proj"),
                ("shared_down_proj", "mlp.shared_experts.down_proj"),
            ):
                layers[tgt] = {"kernel": jnp.asarray(
                    np.stack([lin(i, src) for i in range(L)]), dtype=self.dtype
                )}
        return params

    def mlp(self, lp, normed, tok_valid=None):
        import jax
        import jax.numpy as jnp

        from ltp_sglang_tpu.layers.linear import apply_linear
        from ltp_sglang_tpu.layers.moe import moe_ffn_auto, moe_topk

        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"],
            preferred_element_type=jnp.float32,
        )
        w, idx = moe_topk(logits, self.top_k, self.norm_topk_prob,
                          valid=None if tok_valid is None else tok_valid.reshape(-1),
                          layer_tag=lp.get("moe_layer_idx"))
        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False),
            expert_perm=lp.get("expert_perm"),
        )
        if self.n_shared:
            g = apply_linear(lp["shared_gate_proj"], x)
            u = apply_linear(lp["shared_up_proj"], x)
            out = out + apply_linear(lp["shared_down_proj"], jax.nn.silu(g) * u)
        return out.reshape(*lead, Dm)
