"""Unit tests for the device sampler (ops/sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.ops.sampling import compute_token_logprobs, sample_tokens


def _sample(logits, temps, top_ps, top_ks, min_ps, seed=0):
    return np.asarray(
        sample_tokens(
            jnp.asarray(logits, dtype=jnp.float32),
            jnp.asarray(temps, dtype=jnp.float32),
            jnp.asarray(top_ps, dtype=jnp.float32),
            jnp.asarray(top_ks, dtype=jnp.int32),
            jnp.asarray(min_ps, dtype=jnp.float32),
            jax.random.PRNGKey(seed),
        )
    )


def test_greedy_is_argmax():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 100)).astype(np.float32)
    toks = _sample(logits, [1.0] * 4, [1.0] * 4, [1] * 4, [0.0] * 4)
    np.testing.assert_array_equal(toks, logits.argmax(-1))


def test_top_k_restricts_support():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 50)).astype(np.float32)
    k = 5
    top5 = np.argsort(logits, axis=-1)[:, -k:]
    for seed in range(20):
        toks = _sample(logits, [1.0] * 2, [1.0] * 2, [k] * 2, [0.0] * 2, seed=seed)
        for b in range(2):
            assert toks[b] in top5[b]


def test_top_p_restricts_support():
    # One dominant token (p>0.9) + tail; top_p=0.5 must always pick it.
    logits = np.full((1, 20), -10.0, dtype=np.float32)
    logits[0, 7] = 10.0
    for seed in range(10):
        toks = _sample(logits, [1.0], [0.5], [1 << 20], [0.0], seed=seed)
        assert toks[0] == 7


def test_min_p_filters_tail():
    logits = np.zeros((1, 4), dtype=np.float32)
    logits[0] = [10.0, 9.9, -5.0, -5.0]
    # min_p=0.5: only tokens with p >= 0.5*max_p survive => {0, 1}.
    for seed in range(20):
        toks = _sample(logits, [1.0], [1.0], [1 << 20], [0.5], seed=seed)
        assert toks[0] in (0, 1)


def test_mixed_greedy_and_sampled_rows():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((3, 64)).astype(np.float32)
    toks = _sample(logits, [1.0, 0.8, 1.0], [1.0, 0.9, 1.0], [1, 20, 1], [0.0] * 3)
    assert toks[0] == logits[0].argmax()
    assert toks[2] == logits[2].argmax()


def test_temperature_flattens():
    # Statistical: high temperature samples spread beyond argmax.
    logits = np.array([[2.0, 1.0, 0.0, -1.0]], dtype=np.float32)
    seen = set()
    for seed in range(50):
        toks = _sample(logits, [5.0], [1.0], [1 << 20], [0.0], seed=seed)
        seen.add(int(toks[0]))
    assert len(seen) >= 3


def test_token_logprobs():
    logits = np.log(np.array([[0.7, 0.2, 0.1]], dtype=np.float32))
    lp, topk = compute_token_logprobs(jnp.asarray(logits), jnp.asarray([0]), top_k=2)
    np.testing.assert_allclose(np.asarray(lp), np.log([0.7]), atol=1e-5)
    vals, idx = topk
    np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1])


def test_apply_penalties():
    from ltp_sglang_tpu.ops.sampling import apply_penalties

    logits = np.array([[1.0, 2.0, -1.0, 0.5]], dtype=np.float32)
    counts = np.array([[2.0, 0.0, 1.0, 0.0]], dtype=np.float32)
    seen = np.array([[True, False, True, False]])
    out = np.asarray(
        apply_penalties(
            jnp.asarray(logits), jnp.asarray(counts), jnp.asarray(seen),
            jnp.asarray([0.5]), jnp.asarray([0.1]), jnp.asarray([2.0]),
        )
    )
    # token 0: 1.0 - 0.5*2 - 0.1 = -0.1 -> seen & negative -> *2 = -0.2
    np.testing.assert_allclose(out[0, 0], -0.2, rtol=1e-5)
    # token 1: unseen, no counts -> unchanged
    np.testing.assert_allclose(out[0, 1], 2.0, rtol=1e-5)
    # token 2: -1.0 - 0.5*1 - 0.1 = -1.6 -> seen & negative -> *2 = -3.2
    np.testing.assert_allclose(out[0, 2], -3.2, rtol=1e-5)
    # token 3: unseen -> unchanged
    np.testing.assert_allclose(out[0, 3], 0.5, rtol=1e-5)
