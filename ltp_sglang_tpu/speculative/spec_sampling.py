"""Sampled (temperature) speculative accept — target-only rejection sampling.

Counterpart of the reference's `tree_speculative_sampling_target_only`
(sgl-kernel/csrc/speculative/speculative_sampling.cu, wired at
speculative/eagle_worker.py:643). Both sides use the same scheme: the draft
proposes DETERMINISTICALLY (its argmax / top-k tree), i.e. the proposal
distribution q is a point mass, so the classic speculative-sampling accept
rule min(1, p/q) reduces to "accept draft token d with probability p(d)"
under the PROCESSED target distribution p (temperature / top-k / top-p /
min-p filtered + renormalized), and a rejection at step r replaces d_r with
a sample from p_r with d_r masked out and renormalized — exactly the
(p - q)+ residual for a point-mass q. The committed token stream is then
distributed identically to sampling from p one token at a time (the
rejection-sampling invariant; tests/test_speculative.py asserts it
statistically).

Greedy requests fall out as the special case temperature->0 => top_k == 1:
p is a point mass at the target argmax, so accept becomes the exact
`draft == argmax` match and the replacement is the argmax itself — the same
behavior the greedy-only r2 implementation had, in one code path.

Chain accept below serves the STANDALONE and EAGLE chain workers; the top-k
tree worker keeps per-path greedy verify (its sampled generalization —
ordered sibling-exclusion accept — is a follow-up).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ltp_sglang_tpu.ops.sampling import TOP_K_WINDOW


def processed_probs_window(logits, temperatures, top_ps, top_ks, min_ps):
    """Processed target distribution over a top-K candidate window.

    logits: [N, V]; params: [N]. Returns (p_cand [N, W], cand_idx [N, W])
    where p_cand is the filtered + renormalized probability of each candidate
    (rows sum to 1 over the kept set; non-kept candidates are 0). Exact
    whenever top_k <= W and the top-p mass cutoff falls inside the window —
    the same contract as ops/sampling.sample_tokens."""
    N, V = logits.shape
    scaled = logits.astype(jnp.float32) / temperatures[:, None]
    logz = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)
    W = min(TOP_K_WINDOW, V)
    cand_logits, cand_idx = jax.lax.top_k(scaled, W)
    cand_probs = jnp.exp(cand_logits - logz)
    rank = jnp.arange(W, dtype=jnp.int32)[None, :]
    cumsum = jnp.cumsum(cand_probs, axis=-1)
    keep = (
        ((cumsum - cand_probs) < top_ps[:, None])
        & (rank < top_ks[:, None])
        & (cand_probs >= min_ps[:, None] * cand_probs[:, :1])
    )
    kept = jnp.where(keep, cand_probs, 0.0)
    z = jnp.maximum(kept.sum(axis=-1, keepdims=True), 1e-30)
    return kept / z, cand_idx


def spec_accept_chain_free(
    logits,  # [B, K+1, V]
    drafts,  # [B, K]
    temperatures,  # [B]
    top_ks,  # [B] (1 = greedy row; else unrestricted)
    key,
):
    """Unrestricted-sampling variant (top_p=1, top_k=all, min_p=0 — the
    common plain-temperature case): exact accept probability from the full
    softmax and full-vocab Gumbel-max replacement, no candidate window.
    Greedy rows (top_k == 1) reduce to argmax matching."""
    B, K1, V = logits.shape
    K = K1 - 1
    scaled = logits.astype(jnp.float32) / temperatures[:, None, None]
    logz = jax.nn.logsumexp(scaled, axis=-1)  # [B, K+1]
    greedy = top_ks == 1
    argmaxes = jnp.argmax(scaled, axis=-1).astype(jnp.int32)  # [B, K+1]

    logp_draft = (
        jnp.take_along_axis(scaled[:, :K], drafts[:, :, None], axis=-1)[..., 0]
        - logz[:, :K]
    )
    k_acc, k_rep = jax.random.split(key)
    u = jax.random.uniform(k_acc, (B, K), minval=1e-9, maxval=1.0)
    accept = jnp.where(
        greedy[:, None], drafts == argmaxes[:, :K], u < jnp.exp(logp_draft)
    )
    accepted = jnp.sum(
        jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1
    ).astype(jnp.int32)

    r = accepted
    row = jnp.take_along_axis(scaled, r[:, None, None], axis=1)[:, 0]  # [B, V]
    draft_r = jnp.take_along_axis(
        jnp.concatenate([drafts, jnp.full((B, 1), -1, drafts.dtype)], axis=1),
        r[:, None], axis=1,
    )[:, 0]
    vocab = jnp.arange(V, dtype=jnp.int32)[None, :]
    masked = (vocab == draft_r[:, None]) & (r[:, None] < K)
    row = jnp.where(masked, -jnp.inf, row)
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(k_rep, (B, V), minval=1e-20, maxval=1.0))
    )
    scores = jnp.where(greedy[:, None], row, row + gumbel)
    fix = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    tpos = jnp.arange(K1, dtype=jnp.int32)[None, :]
    drafts_pad = jnp.concatenate(
        [drafts, jnp.zeros((B, 1), drafts.dtype)], axis=1
    )
    preds = jnp.where(
        tpos == accepted[:, None], fix[:, None], drafts_pad.astype(jnp.int32)
    )
    return preds, accepted


def spec_accept_chain(
    logits,  # [B, K+1, V] target logits at positions s-1 .. s+K-1
    drafts,  # [B, K] int32 deterministic draft proposals
    temperatures,  # [B] f32
    top_ps,  # [B] f32
    top_ks,  # [B] i32
    min_ps,  # [B] f32
    key,  # PRNG key
):
    """Chain accept under sampling. Returns (preds [B, K+1] i32,
    accepted [B] i32): preds[:, t] == drafts[:, t] for t < accepted and
    preds[:, accepted] is the replacement (on rejection) or bonus (all K
    accepted) sample; the caller commits preds[:, :accepted+1]."""
    B, K1, V = logits.shape
    K = K1 - 1
    rep = lambda a: jnp.repeat(a, K1, axis=0)  # noqa: E731 per-position params
    p_cand, cand_idx = processed_probs_window(
        logits.reshape(B * K1, V),
        rep(temperatures), rep(top_ps), rep(top_ks), rep(min_ps),
    )
    W = p_cand.shape[-1]
    p_cand = p_cand.reshape(B, K1, W)
    cand_idx = cand_idx.reshape(B, K1, W)

    # Accept probability of each draft under the processed distribution
    # (0 when the draft token fell outside the kept set).
    is_draft = cand_idx[:, :K] == drafts[:, :, None]  # [B, K, W]
    p_draft = jnp.sum(jnp.where(is_draft, p_cand[:, :K], 0.0), axis=-1)
    k_acc, k_rep = jax.random.split(key)
    u = jax.random.uniform(k_acc, (B, K), minval=1e-9, maxval=1.0)
    # Greedy rows (top_k == 1): p_draft is exactly 0 or 1 — deterministic.
    accept = u < p_draft
    accepted = jnp.sum(
        jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1
    ).astype(jnp.int32)  # [B] in [0, K]

    # Replacement / bonus from position r = accepted: mask the rejected
    # draft (only when r < K; the bonus position K has no draft), renormalize
    # implicitly via Gumbel-max over log-probs.
    r = accepted
    p_r = jnp.take_along_axis(
        p_cand, r[:, None, None], axis=1
    )[:, 0]  # [B, W]
    idx_r = jnp.take_along_axis(cand_idx, r[:, None, None], axis=1)[:, 0]
    draft_r = jnp.take_along_axis(
        jnp.concatenate([drafts, jnp.full((B, 1), -1, drafts.dtype)], axis=1),
        r[:, None], axis=1,
    )[:, 0]  # -1 (never matches) at the bonus position
    masked = (idx_r == draft_r[:, None]) & (r[:, None] < K)
    log_p = jnp.where(masked | (p_r <= 0.0), -jnp.inf, jnp.log(p_r))
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(k_rep, (B, W), minval=1e-20, maxval=1.0))
    )
    deterministic = top_ks[:, None] == 1
    scores = jnp.where(deterministic, log_p, log_p + gumbel)
    choice = jnp.argmax(scores, axis=-1)
    fix = jnp.take_along_axis(idx_r, choice[:, None], axis=1)[:, 0]

    # preds[:, t] = drafts[:, t] for t < accepted; the fix at t = accepted.
    tpos = jnp.arange(K1, dtype=jnp.int32)[None, :]
    drafts_pad = jnp.concatenate(
        [drafts, jnp.zeros((B, 1), drafts.dtype)], axis=1
    )
    preds = jnp.where(
        tpos == accepted[:, None], fix[:, None].astype(jnp.int32),
        drafts_pad.astype(jnp.int32),
    )
    return preds, accepted
