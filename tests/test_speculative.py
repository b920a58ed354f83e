"""Speculative decoding (STANDALONE draft): correctness = spec on/off greedy
equivalence; efficiency sanity = full acceptance when draft == target."""

import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir


@pytest.fixture(scope="module")
def model_dir():
    d = tempfile.mkdtemp(prefix="spec_llama_")
    write_tiny_model_dir(d)  # real random weights (HF-generated)
    return d


def make_engine(model_dir, spec: bool, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    args = dict(
        model_path=model_dir,
        dtype="float32",
        max_total_tokens=4096,
        max_running_requests=8,
    )
    if spec:
        args.update(
            speculative_algorithm="STANDALONE",
            speculative_draft_model_path=model_dir,  # draft == target
            speculative_num_steps=4,
        )
    args.update(kw)
    return Engine(ServerArgs(**args))


def test_spec_greedy_equivalence(model_dir):
    base = make_engine(model_dir, spec=False)
    spec = make_engine(model_dir, spec=True)
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    ref = base.generate(input_ids=prompts, sampling_params=sp)
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    # Draft == target => (nearly) every draft token accepted.
    sw = spec.scheduler.spec_worker
    assert sw.num_rounds > 0
    assert sw.avg_accept_length > 3.0, sw.avg_accept_length


def test_spec_with_eos_and_reuse(model_dir):
    spec = make_engine(model_dir, spec=True)
    prompt = [1, 9, 8, 7]
    sp = {"max_new_tokens": 16, "temperature": 0.0}
    a = spec.generate(input_ids=prompt, sampling_params=sp)
    b = spec.generate(input_ids=prompt, sampling_params=sp)  # radix prefix reuse
    assert a["output_ids"] == b["output_ids"]
    base = make_engine(model_dir, spec=False)
    r = base.generate(input_ids=prompt, sampling_params=sp)
    assert a["output_ids"] == r["output_ids"]


def test_spec_sampled_goes_through_spec_path(model_dir):
    # Non-greedy requests now use the sampled accept (target-only rejection
    # sampling) instead of disabling speculation.
    spec = make_engine(model_dir, spec=True)
    out = spec.generate(
        input_ids=[1, 2, 3],
        sampling_params={"max_new_tokens": 16, "temperature": 1.0, "top_k": 40},
    )
    assert len(out["output_ids"]) == 16
    sw = spec.scheduler.spec_worker
    assert sw.num_rounds > 0, "sampled request did not enter the spec path"
    # With a tiny random model p is near-flat, so accept prob = p(argmax) is
    # small — the round still always commits >= 1 token. With top_k=2 the
    # renormalized p(argmax) >= 0.5, so acceptances must show up.
    r0 = sw.num_rounds
    out_k2 = spec.generate(
        input_ids=[7, 8, 9],
        sampling_params={"max_new_tokens": 24, "temperature": 1.0, "top_k": 2},
    )
    assert len(out_k2["output_ids"]) == 24
    committed = 24
    rounds = sw.num_rounds - r0
    assert rounds < committed, (rounds, committed)  # some drafts accepted
    # Unrestricted sampling also eligible (free accept variant).
    out2 = spec.generate(
        input_ids=[4, 5, 6],
        sampling_params={"max_new_tokens": 8, "temperature": 0.8},
    )
    assert len(out2["output_ids"]) == 8


def _empirical(counts, V):
    h = np.bincount(counts, minlength=V).astype(np.float64)
    return h / h.sum()


def test_spec_accept_chain_rejection_sampling_invariant():
    """The committed-token distribution must equal ancestral sampling from
    the processed target distribution p — the rejection-sampling invariant
    (reference kernel: tree_speculative_sampling_target_only)."""
    import jax
    import jax.numpy as jnp

    from ltp_sglang_tpu.speculative.spec_sampling import (
        spec_accept_chain,
        spec_accept_chain_free,
    )

    rng = np.random.default_rng(0)
    V, K, N = 8, 2, 4000
    B = 8  # N * B total trials
    logits_row = rng.standard_normal((K + 1, V)).astype(np.float32) * 1.5
    logits = jnp.asarray(np.broadcast_to(logits_row, (B, K + 1, V)).copy())
    # Deterministic draft: pick a mid-probability token so both accept and
    # reject branches are exercised.
    p_full = np.exp(logits_row - logits_row.max(-1, keepdims=True))
    p_full /= p_full.sum(-1, keepdims=True)
    drafts_row = np.argsort(p_full[:K], axis=-1)[:, -2]  # 2nd most likely
    drafts = jnp.asarray(np.broadcast_to(drafts_row, (B, K)).copy(), jnp.int32)

    temps = jnp.ones((B,), jnp.float32)
    top_ps = jnp.ones((B,), jnp.float32)
    top_ks = jnp.full((B,), V, jnp.int32)
    min_ps = jnp.zeros((B,), jnp.float32)

    fn = jax.jit(spec_accept_chain)
    fn_free = jax.jit(spec_accept_chain_free)
    first, second_given_acc0 = [], []
    first_free = []
    for i in range(N):
        key = jax.random.PRNGKey(i)
        preds, acc = fn(logits, drafts, temps, top_ps, top_ks, min_ps, key)
        preds, acc = np.asarray(preds), np.asarray(acc)
        first.extend(preds[:, 0].tolist())
        for b in range(B):
            if acc[b] >= 1:  # position 0 accepted -> token 1 committed
                second_given_acc0.append(int(preds[b, 1]))
        pf, af = fn_free(logits, drafts, temps, top_ks, jax.random.PRNGKey(10_000 + i))
        first_free.extend(np.asarray(pf)[:, 0].tolist())

    # Committed token at position 0 ~ p_0 (both accept variants).
    emp = _empirical(np.asarray(first), V)
    np.testing.assert_allclose(emp, p_full[0], atol=0.012)
    emp_free = _empirical(np.asarray(first_free), V)
    np.testing.assert_allclose(emp_free, p_full[0], atol=0.012)
    # Conditioned on accepting d_0, position-1 commits ~ p_1.
    emp2 = _empirical(np.asarray(second_given_acc0), V)
    np.testing.assert_allclose(emp2, p_full[1], atol=0.02)


def test_spec_accept_chain_greedy_rows_exact():
    """top_k == 1 rows must reproduce the argmax-match accept exactly."""
    import jax
    import jax.numpy as jnp

    from ltp_sglang_tpu.speculative.spec_sampling import spec_accept_chain

    rng = np.random.default_rng(3)
    B, K, V = 4, 3, 16
    logits = jnp.asarray(rng.standard_normal((B, K + 1, V)), jnp.float32)
    am = np.argmax(np.asarray(logits), axis=-1)
    drafts = am[:, :K].copy()
    drafts[1, 1] = (drafts[1, 1] + 1) % V  # force a rejection in row 1
    preds, acc = jax.jit(spec_accept_chain)(
        logits, jnp.asarray(drafts, jnp.int32),
        jnp.ones((B,), jnp.float32), jnp.ones((B,), jnp.float32),
        jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.float32),
        jax.random.PRNGKey(0),
    )
    preds, acc = np.asarray(preds), np.asarray(acc)
    assert list(acc) == [K, 1, K, K], acc
    # Committed tokens equal the argmax chain everywhere.
    for b in range(B):
        for t in range(acc[b] + 1):
            assert preds[b, t] == am[b, t], (b, t, preds[b], am[b])


def test_spec_accept_tree_rejection_sampling_invariant():
    """Sampled TREE accept (ordered sibling-exclusion): the committed-token
    stream must equal ancestral sampling from the processed target
    distribution p at each node — regardless of which/ how many children the
    draft proposed (reference tree_speculative_sampling_target_only)."""
    import jax
    import jax.numpy as jnp

    from ltp_sglang_tpu.speculative.spec_sampling import spec_accept_tree

    rng = np.random.default_rng(7)
    Vocab, K, N, B = 8, 2, 3000, 8
    # Tree: root(0) -> {1, 2}; 1 -> {3, 4}; 2 -> {5}. Depth-2, V = 6 nodes.
    V = 6
    parent_row = np.array([0, 0, 0, 1, 1, 2], np.int32)
    # Logits per NODE (what the target predicts AT that node).
    logits_row = rng.standard_normal((V, Vocab)).astype(np.float32) * 1.2
    p = np.exp(logits_row - logits_row.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    # Draft tokens: children of the root propose the root-node's 2nd and 3rd
    # most likely tokens; node 1's children propose node-1's 2nd/3rd; node
    # 2's child proposes node-2's 2nd.
    o0 = np.argsort(p[0])[::-1]
    o1 = np.argsort(p[1])[::-1]
    o2 = np.argsort(p[2])[::-1]
    token_row = np.array([0, o0[1], o0[2], o1[1], o1[2], o2[1]], np.int32)

    logits = jnp.asarray(np.broadcast_to(logits_row, (B, V, Vocab)).copy())
    token_v = jnp.asarray(np.broadcast_to(token_row, (B, V)).copy())
    parent_v = jnp.asarray(np.broadcast_to(parent_row, (B, V)).copy())
    ok_v = jnp.ones((B, V), bool)
    temps = jnp.ones((B,), jnp.float32)
    top_ps = jnp.ones((B,), jnp.float32)
    top_ks = jnp.full((B,), Vocab, jnp.int32)
    min_ps = jnp.zeros((B,), jnp.float32)

    fn = jax.jit(lambda key: spec_accept_tree(
        logits, token_v, parent_v, ok_v, K, temps, top_ps, top_ks, min_ps, key
    ))
    first, second_at_1, second_at_2 = [], [], []
    for i in range(N):
        committed, acc, path = (np.asarray(x) for x in fn(jax.random.PRNGKey(i)))
        first.extend(committed[:, 0].tolist())
        for b in range(B):
            if acc[b] >= 1 and path[b, 1] == 1:
                second_at_1.append(int(committed[b, 1]))
            elif acc[b] >= 1 and path[b, 1] == 2:
                second_at_2.append(int(committed[b, 1]))
    # Marginal at the root ~ p_root: P(commit o0[1]) = p(o0[1]),
    # P(commit o0[2]) = p(o0[2]) (sibling exclusion telescopes), everything
    # else from the masked residual.
    emp = _empirical(np.asarray(first), Vocab)
    np.testing.assert_allclose(emp, p[0], atol=0.015)
    # Conditioned on walking to child c, the next commit ~ p_c.
    emp1 = _empirical(np.asarray(second_at_1), Vocab)
    np.testing.assert_allclose(emp1, p[1], atol=0.03)
    emp2 = _empirical(np.asarray(second_at_2), Vocab)
    np.testing.assert_allclose(emp2, p[2], atol=0.03)


def test_spec_accept_tree_greedy_rows_exact():
    """top_k == 1 rows must reproduce the greedy longest-path tree walk."""
    import jax
    import jax.numpy as jnp

    from ltp_sglang_tpu.speculative.spec_sampling import spec_accept_tree

    rng = np.random.default_rng(11)
    B, K, Vocab, V = 16, 2, 32, 6
    parent_row = np.array([0, 0, 0, 1, 1, 2], np.int32)
    parent_v = np.broadcast_to(parent_row, (B, V)).copy()
    logits = rng.standard_normal((B, V, Vocab)).astype(np.float32) * 2.0
    token_v = rng.integers(0, Vocab, size=(B, V)).astype(np.int32)
    # Make some rows' trees match the argmax chain so both outcomes occur.
    am = np.argmax(logits, axis=-1)
    for b in range(0, B, 2):
        token_v[b, 1] = am[b, 0]
        token_v[b, 3] = am[b, 1]
    ok_v = np.ones((B, V), bool)
    committed, acc, path = (np.asarray(x) for x in jax.jit(
        lambda: spec_accept_tree(
            jnp.asarray(logits), jnp.asarray(token_v), jnp.asarray(parent_v),
            jnp.asarray(ok_v), K,
            jnp.ones((B,), jnp.float32), jnp.ones((B,), jnp.float32),
            jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.float32),
            jax.random.PRNGKey(0),
        ))())
    # Python reference greedy walk.
    for b in range(B):
        cur, exp_acc, exp_committed = 0, 0, []
        for _ in range(K):
            want = am[b, cur]
            nxt = next((v for v in range(1, V)
                        if parent_row[v] == cur and token_v[b, v] == want), None)
            if nxt is None:
                break
            exp_committed.append(want)
            cur, exp_acc = nxt, exp_acc + 1
        exp_committed.append(am[b, cur])  # replacement/bonus = argmax
        assert acc[b] == exp_acc, (b, acc[b], exp_acc)
        assert committed[b, : exp_acc + 1].tolist() == exp_committed, (
            b, committed[b], exp_committed)
