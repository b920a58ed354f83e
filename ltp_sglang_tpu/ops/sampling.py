"""Batched top-k / top-p / min-p sampling on device.

Counterpart of the reference Sampler (layers/sampler.py:38-199) and the
flashinfer sampling kernels (`top_k_top_p_sampling_from_probs`,
`min_p_sampling_from_probs`). One fused jit-friendly function: a single
descending sort per step provides all three filters, then a Gumbel-max draw
picks the token (no host round-trip). Greedy requests are the top_k==1 special
case (SamplingParams sets temperature=1, top_k=1), so one code path serves
mixed greedy/sampling batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(
    logits: jnp.ndarray,  # [B, V] float
    temperatures: jnp.ndarray,  # [B] float32 (>0)
    top_ps: jnp.ndarray,  # [B] float32 in (0, 1]
    top_ks: jnp.ndarray,  # [B] int32 (>=1; V for "all")
    min_ps: jnp.ndarray,  # [B] float32 in [0, 1]
    key: jax.Array,
) -> jnp.ndarray:  # [B] int32
    B, V = logits.shape
    logits = logits.astype(jnp.float32) / temperatures[:, None]
    probs = jax.nn.softmax(logits, axis=-1)

    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]  # descending
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    rank = jnp.arange(V, dtype=jnp.int32)[None, :]

    # Keep while the exclusive cumulative mass is < top_p (always keeps rank 0),
    # rank < top_k, and prob >= min_p * max_prob.
    keep = (
        ((cumsum - sorted_probs) < top_ps[:, None])
        & (rank < top_ks[:, None])
        & (sorted_probs >= min_ps[:, None] * sorted_probs[:, :1])
    )
    # Smallest kept probability = inclusion threshold.
    threshold = jnp.min(jnp.where(keep, sorted_probs, jnp.inf), axis=-1, keepdims=True)
    masked = jnp.where(probs >= threshold, probs, 0.0)

    # Gumbel-max over log(masked) — avoids an explicit renormalize.
    log_p = jnp.log(jnp.maximum(masked, 1e-38))
    log_p = jnp.where(masked > 0, log_p, -jnp.inf)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (B, V), minval=1e-20, maxval=1.0)))
    # Greedy rows (top_k == 1) must be deterministic: skip the noise there.
    deterministic = (top_ks[:, None] == 1)
    scores = jnp.where(deterministic, log_p, log_p + gumbel)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def apply_logit_processing(
    logits: jnp.ndarray,  # [B, V]
    logit_bias: jnp.ndarray | None = None,  # [B, V] additive
    vocab_mask: jnp.ndarray | None = None,  # [B, V] bool, True = forbidden
) -> jnp.ndarray:
    if logit_bias is not None:
        logits = logits + logit_bias
    if vocab_mask is not None:
        logits = jnp.where(vocab_mask, -jnp.inf, logits)
    return logits


def compute_token_logprobs(
    logits: jnp.ndarray,  # [B, V]
    token_ids: jnp.ndarray,  # [B]
    top_k: int = 0,
):
    """Log-softmax probe for return_logprob requests. Returns
    (chosen_logprob [B], (topk_vals [B,k], topk_idx [B,k]) or None)."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logprobs, token_ids[:, None], axis=-1)[:, 0]
    if top_k > 0:
        vals, idx = jax.lax.top_k(logprobs, top_k)
        return chosen, (vals, idx)
    return chosen, None
