"""Batched top-k / top-p / min-p sampling on device.

Counterpart of the reference Sampler (layers/sampler.py:38-199) and the
flashinfer sampling kernels (`top_k_top_p_sampling_from_probs`,
`min_p_sampling_from_probs`). TPU design: avoid a full-vocab sort — a 128k
sort costs more than the whole decode forward. Instead:

- `lax.top_k(logits, 64)` narrows to candidates (requests with top_k > 64
  fall back to a full-sort variant, selected at trace time by the caller);
- true token probabilities come from a full-vocab logsumexp (one cheap
  reduction), so the top-p mass cutoff is exact whenever the top-p set fits
  in the candidate window (it always does for p <= 1 - p(rank 65+));
- Gumbel-max over the candidate set picks the token with no explicit
  renormalization. Greedy rows (top_k == 1) take candidate 0 deterministically,
  so one code path serves mixed greedy/sampling batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Candidate window for the fast path. Requests with top_k > this use the
# full-sort path (rare; the reference caps practical top_k similarly).
TOP_K_WINDOW = 64


def _finalize(cand_logprobs, cand_probs, cand_idx, keep, top_ks, key):
    """Shared tail: mask candidates, Gumbel-max, map back to vocab ids."""
    B, K = cand_probs.shape
    log_p = jnp.where(keep, cand_logprobs, -jnp.inf)
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, (B, K), minval=1e-20, maxval=1.0))
    )
    deterministic = top_ks[:, None] == 1
    scores = jnp.where(deterministic, log_p, log_p + gumbel)
    choice = jnp.argmax(scores, axis=-1)  # [B] position within candidates
    return jnp.take_along_axis(cand_idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32
    )


def sample_tokens(
    logits: jnp.ndarray,  # [B, V] float
    temperatures: jnp.ndarray,  # [B] float32 (>0)
    top_ps: jnp.ndarray,  # [B] float32 in (0, 1]
    top_ks: jnp.ndarray,  # [B] int32 (>=1)
    min_ps: jnp.ndarray,  # [B] float32 in [0, 1]
    key: jax.Array,
) -> jnp.ndarray:  # [B] int32
    B, V = logits.shape
    scaled = logits.astype(jnp.float32) / temperatures[:, None]
    logz = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)  # [B, 1]

    K = min(TOP_K_WINDOW, V)
    cand_logits, cand_idx = jax.lax.top_k(scaled, K)  # [B, K] descending
    cand_logprobs = cand_logits - logz
    cand_probs = jnp.exp(cand_logprobs)  # true probabilities

    rank = jnp.arange(K, dtype=jnp.int32)[None, :]
    cumsum = jnp.cumsum(cand_probs, axis=-1)
    keep = (
        ((cumsum - cand_probs) < top_ps[:, None])  # exclusive mass < top_p
        & (rank < top_ks[:, None])
        & (cand_probs >= min_ps[:, None] * cand_probs[:, :1])
    )
    return _finalize(cand_logprobs, cand_probs, cand_idx, keep, top_ks, key)


def sample_tokens_full_sort(
    logits: jnp.ndarray,
    temperatures: jnp.ndarray,
    top_ps: jnp.ndarray,
    top_ks: jnp.ndarray,
    min_ps: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """Exact variant for top_k > TOP_K_WINDOW: full descending sort."""
    B, V = logits.shape
    scaled = logits.astype(jnp.float32) / temperatures[:, None]
    order = jnp.argsort(-scaled, axis=-1)
    sorted_logits = jnp.take_along_axis(scaled, order, axis=-1)
    logz = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)
    sorted_logprobs = sorted_logits - logz
    sorted_probs = jnp.exp(sorted_logprobs)
    rank = jnp.arange(V, dtype=jnp.int32)[None, :]
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (
        ((cumsum - sorted_probs) < top_ps[:, None])
        & (rank < top_ks[:, None])
        & (sorted_probs >= min_ps[:, None] * sorted_probs[:, :1])
    )
    return _finalize(sorted_logprobs, sorted_probs, order, keep, top_ks, key)


def greedy_tokens(logits: jnp.ndarray) -> jnp.ndarray:
    """All-greedy fast path: plain argmax (no RNG, no top-k)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_tokens_free(
    logits: jnp.ndarray,  # [B, V]
    temperatures: jnp.ndarray,  # [B]
    top_ks: jnp.ndarray,  # [B] (1 = greedy row; else unrestricted)
    key: jax.Array,
) -> jnp.ndarray:
    """Exact unrestricted sampling (top_p=1, top_k=all, min_p=0) without a
    sort: Gumbel-max over the full vocabulary. Greedy rows stay argmax."""
    B, V = logits.shape
    scaled = logits.astype(jnp.float32) / temperatures[:, None]
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, (B, V), minval=1e-20, maxval=1.0))
    )
    scores = jnp.where(top_ks[:, None] == 1, scaled, scaled + gumbel)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def apply_penalties(
    logits: jnp.ndarray,  # [B, V]
    output_counts: jnp.ndarray,  # [B, V] float32: count of each token in output
    seen_mask: jnp.ndarray,  # [B, V] bool: token in prompt or output
    frequency_penalties: jnp.ndarray,  # [B]
    presence_penalties: jnp.ndarray,  # [B]
    repetition_penalties: jnp.ndarray,  # [B] (1.0 = off)
) -> jnp.ndarray:
    """OpenAI-style frequency/presence penalties over generated tokens plus
    HF-style repetition penalty over prompt+output (sampling/penaltylib
    semantics in the reference)."""
    logits = logits - frequency_penalties[:, None] * output_counts
    logits = logits - presence_penalties[:, None] * (output_counts > 0)
    rp = repetition_penalties[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    return jnp.where(seen_mask, penalized, logits)


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
