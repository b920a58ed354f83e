"""Double sparsity (reference layers/attention/double_sparsity_backend.py):
label cache + top-k token selection + exact sparse attention."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir


# ------------------------------------------------------------------- op unit
def test_sparse_attention_exact_when_covering():
    """heavy_k >= seq_len selects every valid token -> bitwise-near dense."""
    from ltp_sglang_tpu.ops.attention.double_sparsity import (
        ds_sparse_attention, extract_labels,
    )
    from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention

    rng = np.random.default_rng(0)
    B, Hq, Hkv, D, C, L = 3, 8, 4, 32, 24, 2
    S = 128
    r = 8
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((L, S, Hkv, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, S, Hkv, D)), jnp.float32)
    kv_indices = jnp.asarray(
        rng.choice(S, size=(B, C), replace=False), jnp.int32
    )
    seq_lens = jnp.asarray([10, 24, 17], jnp.int32)
    channels = jnp.asarray(
        np.sort(rng.choice(D, size=(Hkv, r), replace=False)), jnp.int32
    )
    li = jnp.int32(1)
    labels = extract_labels(
        kc[1].reshape(S, Hkv, D), channels
    )[kv_indices]  # [B, C, Hkv, r]

    out = ds_sparse_attention(
        q, kc, vc, li, labels, kv_indices, seq_lens, channels,
        heavy_k=C, sm_scale=D ** -0.5,
    )
    k_pages = kc[1][kv_indices]
    v_pages = vc[1][kv_indices]
    ref = ref_paged_attention(
        q, k_pages, v_pages, kv_indices, seq_lens, seq_lens - 1, D ** -0.5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sparse_selection_picks_heavy_tokens():
    """With one dominant key, a tiny heavy_k still finds it."""
    from ltp_sglang_tpu.ops.attention.double_sparsity import (
        ds_sparse_attention, extract_labels,
    )

    B, Hq, Hkv, D, C = 1, 4, 2, 16, 12
    S, r = 64, 16  # r = D: labels are exact
    q = jnp.ones((B, 1, Hq, D), jnp.float32)
    kc = jnp.zeros((1, S, Hkv, D), jnp.float32)
    vc = jnp.zeros((1, S, Hkv, D), jnp.float32)
    # slot 7 = the needle: huge key, distinctive value
    kc = kc.at[0, 7].set(5.0)
    vc = vc.at[0, 7].set(3.0)
    kv_indices = jnp.arange(C, dtype=jnp.int32)[None, :] + 2  # slots 2..13
    kv_indices = kv_indices.at[0, 5].set(7)  # needle at column 5
    seq_lens = jnp.asarray([C], jnp.int32)
    channels = jnp.tile(jnp.arange(r, dtype=jnp.int32)[None], (Hkv, 1))
    labels = extract_labels(kc[0], channels)[kv_indices]
    out = ds_sparse_attention(
        q, kc, vc, jnp.int32(0), labels, kv_indices, seq_lens, channels,
        heavy_k=2, sm_scale=D ** -0.5,
    )
    # softmax over {needle(score 5*16*0.25=20), zeros} -> needle dominates
    assert float(np.asarray(out).mean()) > 2.5


def test_auto_channels():
    from ltp_sglang_tpu.ops.attention.double_sparsity import auto_channels

    L, Dm, Hkv, D, r = 3, 16, 2, 8, 4
    w = np.zeros((L, Dm, Hkv * D), np.float32)
    # layer 0 head 1: channels 1,3,5,7 heavy
    w[0, :, D + 1] = 9; w[0, :, D + 3] = 8; w[0, :, D + 5] = 7; w[0, :, D + 7] = 6
    ch = auto_channels(w, L, Hkv, D, r)
    assert ch.shape == (L, Hkv, r)
    assert set(ch[0, 1]) == {1, 3, 5, 7}
    # no weights -> evenly spaced fallback
    ch2 = auto_channels(None, L, Hkv, D, r)
    assert ch2.shape == (L, Hkv, r)


# --------------------------------------------------------------- engine e2e
@pytest.mark.parametrize("heavy_cover", [True])
def test_engine_ds_parity_when_covering(heavy_cover):
    """threshold=0 forces the sparse decode path; heavy_token_num >= context
    makes it exact -> greedy outputs match the dense engine token for token."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="ds_llama_")
    write_tiny_model_dir(d, with_weights=True)

    common = dict(
        model_path=d, dtype="float32",
        max_total_tokens=512, max_running_requests=4,
    )
    dense = Engine(ServerArgs(**common))
    rng = np.random.default_rng(3)
    prompts = [[int(x) for x in rng.integers(2, 200, size=n)] for n in (9, 14, 5)]
    sp = [{"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}] * 3
    ref = dense.generate(input_ids=prompts, sampling_params=sp)

    sparse = Engine(ServerArgs(
        **common, enable_double_sparsity=True,
        ds_heavy_token_num=512,  # covers every context -> exact
        ds_sparse_decode_threshold=0,
        ds_heavy_channel_num=8,
    ))
    assert sparse.model_runner.ds_enabled
    assert sparse.model_runner.label_cache is not None
    out = sparse.generate(input_ids=prompts, sampling_params=sp)
    for o, r_ in zip(out, ref):
        assert o["output_ids"] == r_["output_ids"]

    # a second pass reuses radix-cached prefixes + labels
    out2 = sparse.generate(input_ids=prompts, sampling_params=sp)
    for o, r_ in zip(out2, ref):
        assert o["output_ids"] == r_["output_ids"]


def test_engine_ds_small_k_still_generates():
    """heavy_token_num < context: sparse selection is approximate but must
    produce a well-formed generation (no NaNs, right length)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="ds_small_")
    write_tiny_model_dir(d, with_weights=True)
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=512, max_running_requests=4,
        enable_double_sparsity=True,
        ds_heavy_token_num=8, ds_sparse_decode_threshold=0,
        ds_heavy_channel_num=8,
    ))
    rng = np.random.default_rng(5)
    ids = [int(x) for x in rng.integers(2, 200, size=40)]
    out = eng.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 10, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 10


def test_ds_guards():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="ds_guard_")
    write_tiny_model_dir(d, with_weights=False)
    with pytest.raises(NotImplementedError):
        Engine(ServerArgs(
            model_path=d, load_format="dummy", dtype="float32",
            max_total_tokens=256, max_running_requests=2,
            enable_double_sparsity=True, speculative_algorithm="EAGLE",
            speculative_draft_model_path=d,
        ))
