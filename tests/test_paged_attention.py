"""Pallas paged decode attention: kernel parity + engine greedy parity with
page_size > 1 through the paged window path (interpret mode off-TPU)."""

import os
import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir


def test_kernel_matches_reference():
    import jax.numpy as jnp

    from ltp_sglang_tpu.ops.attention.pallas_decode import paged_decode_attention
    from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention

    L, S, Hkv, D, Hq, B, P = 2, 512, 4, 64, 16, 3, 16
    r, ln = (Hkv * D) // 128, 128
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.standard_normal((L, S, r, ln)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, S, r, ln)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    seq = np.array([37, 100, 64], np.int32)
    Cp = 8
    pages = (rng.permutation(S // P - 1)[: B * Cp].reshape(B, Cp) + 1).astype(np.int32)
    out = paged_decode_attention(
        q, kc, vc, 1, jnp.asarray(pages), jnp.asarray(seq),
        page_size=P, num_kv_heads=Hkv, sm_scale=0.125,
    )
    C = Cp * P
    kv_idx = (pages[:, :, None] * P + np.arange(P)[None, None, :]).reshape(B, C)
    kg = kc[1, kv_idx].reshape(B, C, Hkv, D)
    vg = vc[1, kv_idx].reshape(B, C, Hkv, D)
    ref = ref_paged_attention(
        q[:, None], kg, vg, jnp.asarray(kv_idx), jnp.asarray(seq),
        jnp.asarray(seq - 1), 0.125,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_engine_paged_window_parity(monkeypatch):
    """Greedy outputs through the paged window path must match the default
    engine exactly (128-lane KV rows required => 2 kv heads x 64)."""
    monkeypatch.setenv("LTP_FORCE_PAGED_ATTN", "1")
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": 128,
        "intermediate_size": 256,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 64,
        "vocab_size": 512,
        "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "eos_token_id": 2,
        "torch_dtype": "float32",
    }
    d = tempfile.mkdtemp(prefix="paged_llama_")
    write_tiny_model_dir(d, cfg=cfg)
    paged = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8, page_size=16,
    ))
    base = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8, 11, 13]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    out = paged.generate(input_ids=prompts, sampling_params=sp)
    ref = base.generate(input_ids=prompts, sampling_params=sp)
    for o, r in zip(out, ref):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])


def test_mla_kernel_matches_reference():
    """MLA latent decode kernel vs the XLA gather + ref attention path
    (models/deepseek_v2.py _attention_absorbed semantics): scores over the
    [kv_lora | k_pe] width, values = the kv_lora slice of the same rows."""
    import jax.numpy as jnp

    from ltp_sglang_tpu.ops.attention.pallas_mla_decode import (
        mla_paged_decode_attention,
    )
    from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention

    L, S, P = 2, 512, 16
    R, rope, H, B = 512, 64, 16, 3
    RL = 768  # round_up(R + rope, 256)
    r, ln = RL // 128, 128
    rng = np.random.default_rng(1)
    kc = jnp.asarray(rng.standard_normal((L, S, r, ln)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, R + rope)), jnp.float32)
    seq = np.array([37, 100, 64], np.int32)
    Cp = 8
    pages = (rng.permutation(S // P - 1)[: B * Cp].reshape(B, Cp) + 1).astype(
        np.int32
    )
    out = mla_paged_decode_attention(
        q, kc, 1, jnp.asarray(pages), jnp.asarray(seq),
        page_size=P, sm_scale=0.135,
    )[..., :R]
    C = Cp * P
    kv_idx = (pages[:, :, None] * P + np.arange(P)[None, None, :]).reshape(B, C)
    rows = kc[1, kv_idx].reshape(B, C, RL)
    k_cat = rows[..., : R + rope][:, :, None, :]
    v_lat = rows[..., :R][:, :, None, :]
    ref = ref_paged_attention(
        q[:, None], k_cat, v_lat, jnp.asarray(kv_idx), jnp.asarray(seq),
        jnp.asarray(seq - 1), 0.135,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_mla_kernel_bf16_and_short_seq():
    """bf16 rows + a sequence shorter than one chunk, plus seq==1."""
    import jax.numpy as jnp

    from ltp_sglang_tpu.ops.attention.pallas_mla_decode import (
        mla_paged_decode_attention,
    )
    from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention

    L, S, P = 1, 256, 8
    R, rope, H, B = 128, 64, 4, 2
    RL = 256
    r, ln = RL // 128, 128
    rng = np.random.default_rng(2)
    kc = jnp.asarray(rng.standard_normal((L, S, r, ln)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, R + rope)), jnp.bfloat16)
    seq = np.array([5, 1], np.int32)
    Cp = 4
    pages = np.arange(B * Cp).reshape(B, Cp).astype(np.int32)
    out = mla_paged_decode_attention(
        q, kc, 0, jnp.asarray(pages), jnp.asarray(seq),
        page_size=P, sm_scale=0.2,
    )[..., :R]
    C = Cp * P
    kv_idx = (pages[:, :, None] * P + np.arange(P)[None, None, :]).reshape(B, C)
    rows = kc[0, kv_idx].reshape(B, C, RL)
    ref = ref_paged_attention(
        q[:, None].astype(jnp.float32),
        rows[..., : R + rope][:, :, None, :].astype(jnp.float32),
        rows[..., :R][:, :, None, :].astype(jnp.float32),
        jnp.asarray(kv_idx), jnp.asarray(seq), jnp.asarray(seq - 1), 0.2,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)


def test_deepseek_mla_paged_window_parity(monkeypatch):
    """DeepSeek-V2 decode through the MLA paged window path (latent-MQA
    Pallas kernel, E==1 branch of _attention_absorbed + the paged window
    driver): greedy outputs must match the default XLA-gather engine."""
    monkeypatch.setenv("LTP_FORCE_PAGED_ATTN", "1")
    from test_models_parity import TINY_DEEPSEEK_V2_CFG

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="paged_dsv2_")
    write_tiny_model_dir(d, cfg=TINY_DEEPSEEK_V2_CFG)
    paged = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8, page_size=16,
    ))
    assert getattr(paged.model_runner.model, "mla_kernel_page_size", 0) == 16
    base = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8, 11, 13]]
    sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}
    out = paged.generate(input_ids=prompts, sampling_params=sp)
    ref = base.generate(input_ids=prompts, sampling_params=sp)
    assert [o["output_ids"] for o in out] == [o["output_ids"] for o in ref]


def test_ring_kernel_matches_reference():
    """SWA ring decode kernel (ops/attention/pallas_swa_decode.py) vs the
    reference masked path: wraparound (seq > ring), window < ring, and the
    gemma2 logit softcap in-kernel."""
    import jax.numpy as jnp

    from ltp_sglang_tpu.ops.attention.pallas_swa_decode import (
        ring_decode_attention,
    )
    from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention

    L, ring, window = 2, 64, 48
    Hkv, D, Hq, B = 4, 32, 8, 3
    r, ln = (Hkv * D) // 128, 128
    n_rings = 5
    rng = np.random.default_rng(4)
    ks = jnp.asarray(rng.standard_normal((L, n_rings * ring, r, ln)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, n_rings * ring, r, ln)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    req_rows = np.array([0, 2, 3], np.int32)
    seq = np.array([150, 40, 64], np.int32)  # wrapped, short, exactly ring
    cap = 30.0
    out = ring_decode_attention(
        q, ks, vs, 1, jnp.asarray(req_rows), jnp.asarray(seq),
        ring=ring, window=window, num_kv_heads=Hkv, sm_scale=0.2,
        logit_cap=cap,
    )
    # Reference: materialize each request's ring as position-ordered K/V of
    # the last min(seq, window) positions.
    for b in range(B):
        s = int(seq[b])
        lo = max(0, s - window)
        poss = np.arange(lo, s)
        slots = req_rows[b] * ring + (poss % ring)
        kg = np.asarray(ks[1, slots]).reshape(1, -1, Hkv, D)
        vg = np.asarray(vs[1, slots]).reshape(1, -1, Hkv, D)
        ref = ref_paged_attention(
            q[b : b + 1, None], jnp.asarray(kg), jnp.asarray(vg),
            jnp.zeros((1, len(poss)), jnp.int32),
            jnp.asarray([len(poss)], jnp.int32),
            jnp.asarray([len(poss) - 1], jnp.int32),
            0.2, logit_cap=cap,
        )[0, 0]
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), atol=2e-2,
        )


def test_gemma2_swa_ring_kernel_parity(monkeypatch):
    """Gemma2 hybrid pool decode through the ring kernel (E==1 branch in
    models/gemma2.py) vs the default gather engine — greedy parity across a
    ring wraparound with the logit softcap active."""
    monkeypatch.setenv("LTP_FORCE_PAGED_ATTN", "1")
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = {
        "architectures": ["Gemma2ForCausalLM"],
        "model_type": "gemma2",
        "hidden_size": 128,
        "intermediate_size": 256,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 4,   # Hkv*D = 128: kernel row alignment
        "head_dim": 32,
        "vocab_size": 512,
        "max_position_embeddings": 512,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,
        "eos_token_id": 2,
        "attn_logit_softcapping": 50.0,
        "final_logit_softcapping": 30.0,
        "query_pre_attn_scalar": 32,
        "sliding_window": 16,
        "hidden_activation": "gelu_pytorch_tanh",
        "torch_dtype": "float32",
    }
    d = tempfile.mkdtemp(prefix="ring_gemma2_")
    write_tiny_model_dir(d, cfg=cfg)
    common = dict(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=4,
    )
    kern = Engine(ServerArgs(**common))
    assert getattr(kern.model_runner.model, "swa_ring_kernel", False)
    base_args = ServerArgs(**common)
    import os as _os

    _os.environ.pop("LTP_FORCE_PAGED_ATTN")
    base = Engine(base_args)
    assert not getattr(base.model_runner.model, "swa_ring_kernel", False)
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8, 11, 13]]
    sp = {"max_new_tokens": 40, "temperature": 0.0, "ignore_eos": True}
    out = kern.generate(input_ids=prompts, sampling_params=sp)
    ref = base.generate(input_ids=prompts, sampling_params=sp)
    assert [o["output_ids"] for o in out] == [o["output_ids"] for o in ref]
