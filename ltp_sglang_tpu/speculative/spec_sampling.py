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

Chain accept serves the STANDALONE and EAGLE chain workers.
`spec_accept_tree` is the sampled generalization for the top-k TREE worker —
the ordered sibling-exclusion accept of the reference's
`tree_speculative_sampling_target_only` (speculative_sampling.cu): at each
tree node, the draft's children are examined in order; child token d is
accepted with probability p(d) / (1 - sum of previously-rejected siblings'
p), which telescopes so the probability SOME child is accepted equals the
total p-mass on the children and the walk remains distribution-exact; if
all children reject, the replacement is sampled from p with every child
token masked out and renormalized (the (p - q)+ residual for the multi-
point-mass q). Greedy rows (top_k == 1) reduce to the exact greedy
longest-path walk.
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


def spec_accept_tree(
    logits_v,  # [B, V, Vocab] target logits at each tree node
    token_v,  # [B, V] i32 node tokens (node 0 = root = committed token)
    parent_v,  # [B, V] i32 parent node index (root points at itself)
    ok_v,  # [B, V] bool node validity (orphans masked out)
    K,  # static max tree depth (accept walk length)
    temperatures,  # [B]
    top_ps,  # [B]
    top_ks,  # [B] (1 = greedy row)
    min_ps,  # [B]
    key,
):
    """Ordered sibling-exclusion accept over a token tree (sampled verify).

    Returns (committed [B, K+1] i32, acc [B] i32, path [B, K+1] i32):
    committed[:, t] for t < acc are the accepted child tokens along the
    path, committed[:, acc] is the replacement (on total sibling rejection)
    or bonus (full-depth acceptance) sample; path[:, t] is the verify-tree
    node index at depth t (0 beyond acc). The caller commits
    committed[:, :acc+1]."""
    B, V, Vocab = logits_v.shape
    rep = lambda a: jnp.repeat(a, V, axis=0)  # noqa: E731 per-node params
    p_cand, cand_idx = processed_probs_window(
        logits_v.reshape(B * V, Vocab),
        rep(temperatures), rep(top_ps), rep(top_ks), rep(min_ps),
    )
    W = p_cand.shape[-1]
    p_cand = p_cand.reshape(B, V, W)
    cand_idx = cand_idx.reshape(B, V, W)

    k_u, k_fix = jax.random.split(key)
    # One accept coin per (depth, candidate node); strictly inside (0, 1) so
    # greedy point masses (p_d exactly 1) always accept.
    u = jax.random.uniform(k_u, (B, K, V), minval=1e-9, maxval=1.0 - 1e-9)
    deterministic = top_ks[:, None] == 1  # [B, 1]
    vv = jnp.arange(V, dtype=jnp.int32)

    cur = jnp.zeros((B,), jnp.int32)
    alive = jnp.ones((B,), bool)
    acc = jnp.zeros((B,), jnp.int32)
    path = jnp.zeros((B, K + 1), jnp.int32)
    committed = jnp.zeros((B, K + 1), jnp.int32)

    for t in range(1, K + 1):
        p_cur = jnp.take_along_axis(p_cand, cur[:, None, None], axis=1)[:, 0]
        idx_cur = jnp.take_along_axis(cand_idx, cur[:, None, None], axis=1)[:, 0]
        is_child = (parent_v == cur[:, None]) & ok_v & (vv[None, :] > 0)
        # p(d) under the processed target distribution, for every node's
        # token at once (0 when the token fell outside the kept set).
        tok_match = idx_cur[:, None, :] == token_v[:, :, None]  # [B, V, W]
        p_tok = jnp.sum(jnp.where(tok_match, p_cur[:, None, :], 0.0), axis=-1)

        def sib_body(v, carry):
            residual, chosen = carry
            child_here = (
                jax.lax.dynamic_index_in_dim(is_child, v, 1, keepdims=False)
                & alive & (chosen < 0)
            )
            p_d = jax.lax.dynamic_index_in_dim(p_tok, v, 1, keepdims=False)
            u_v = jax.lax.dynamic_index_in_dim(
                u[:, t - 1], v, axis=1, keepdims=False
            )
            accept = u_v * residual < p_d
            chosen = jnp.where(child_here & accept, v, chosen)
            residual = jnp.where(
                child_here & ~accept,
                jnp.maximum(residual - p_d, 1e-30), residual,
            )
            return residual, chosen

        _, chosen = jax.lax.fori_loop(
            1, V, sib_body,
            (jnp.ones((B,), jnp.float32), jnp.full((B,), -1, jnp.int32)),
        )
        took = alive & (chosen >= 0)
        died = alive & (chosen < 0)

        # Replacement for rows whose every child rejected: p_cur with all
        # child tokens masked, renormalized implicitly via Gumbel-max.
        child_tok_mask = jnp.any(tok_match & is_child[:, :, None], axis=1)
        log_p = jnp.where(
            child_tok_mask | (p_cur <= 0.0), -jnp.inf, jnp.log(p_cur)
        )
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(
            jax.random.fold_in(k_fix, t), (B, W), minval=1e-20, maxval=1.0
        )))
        scores = jnp.where(deterministic, log_p, log_p + gumbel)
        fix = jnp.take_along_axis(
            idx_cur, jnp.argmax(scores, axis=-1)[:, None], axis=1
        )[:, 0]

        child_tok = jnp.take_along_axis(
            token_v, jnp.maximum(chosen, 0)[:, None], axis=1
        )[:, 0]
        committed = committed.at[:, t - 1].set(jnp.where(
            took, child_tok, jnp.where(died, fix, committed[:, t - 1])
        ))
        path = path.at[:, t].set(jnp.where(took, chosen, 0))
        cur = jnp.where(took, chosen, cur)
        acc = acc + took.astype(jnp.int32)
        alive = took

    # Bonus sample at the final node for rows that accepted all K steps
    # (no draft there, so no masking).
    p_cur = jnp.take_along_axis(p_cand, cur[:, None, None], axis=1)[:, 0]
    idx_cur = jnp.take_along_axis(cand_idx, cur[:, None, None], axis=1)[:, 0]
    log_p = jnp.where(p_cur <= 0.0, -jnp.inf, jnp.log(p_cur))
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(
        jax.random.fold_in(k_fix, 0), (B, W), minval=1e-20, maxval=1.0
    )))
    scores = jnp.where(deterministic, log_p, log_p + gumbel)
    bonus = jnp.take_along_axis(
        idx_cur, jnp.argmax(scores, axis=-1)[:, None], axis=1
    )[:, 0]
    committed = committed.at[:, K].set(
        jnp.where(alive, bonus, committed[:, K])
    )
    return committed, acc, path


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
