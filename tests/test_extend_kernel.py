"""Parity tests for the Pallas ragged extend-attention kernel (interpret mode
on CPU) against the XLA reference (ops/attention/reference.py), the same
ground truth the decode kernel is tested against.

Covers: GQA at D=64 (paired kv heads per storage sub-row) and D=128 (one kv
head per sub-row), ragged extend lens, non-page-aligned prefixes, multiple
query blocks, layer indexing, and bf16 caches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ltp_sglang_tpu.ops.attention.pallas_extend import (
    extend_kernel_ok,
    paged_extend_attention,
)
from ltp_sglang_tpu.ops.attention.reference import ref_paged_attention


def _build_case(B, E, Hq, Hkv, D, P, L=3, li=1, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    RL = Hkv * D
    ln = 128 if RL % 128 == 0 else RL
    r = RL // ln
    assert extend_kernel_ok(Hkv, D, ln)

    prefix = rng.integers(0, 3 * P, size=B).astype(np.int32)
    new = rng.integers(1, E + 1, size=B).astype(np.int32)
    seq = (prefix + new).astype(np.int32)
    Cp = int(-(-int(seq.max()) // P)) + 1
    C = Cp * P

    # Request b owns pages [b*Cp, (b+1)*Cp): position t -> slot
    # pages[t//P]*P + t%P (the allocator's position->in-page-offset contract).
    S = B * Cp * P + P  # + garbage page 0 margin
    pages = np.zeros((B, Cp), np.int32)
    for b in range(B):
        pages[b] = np.arange(b * Cp, (b + 1) * Cp, dtype=np.int32) + 1
    kc = rng.standard_normal((L, S, r, ln)).astype(np.float32)
    vc = rng.standard_normal((L, S, r, ln)).astype(np.float32)
    kc = jnp.asarray(kc, dtype)
    vc = jnp.asarray(vc, dtype)

    q = rng.standard_normal((B, E, Hq, D)).astype(np.float32)
    for b in range(B):
        q[b, new[b]:] = 0.0  # padded query rows
    q = jnp.asarray(q, dtype)

    kv_indices = np.zeros((B, C), np.int32)
    for b in range(B):
        t = np.arange(C)
        kv_indices[b] = pages[b, t // P] * P + t % P
    return dict(
        q=q, kc=kc, vc=vc, li=li, pages=jnp.asarray(pages),
        seq=jnp.asarray(seq), prefix=jnp.asarray(prefix), new=new,
        kv_indices=jnp.asarray(kv_indices), P=P, Hkv=Hkv,
    )


def _run_both(case, sm_scale=0.25, q_block=64, pages_per_chunk=2):
    q, kc, vc = case["q"], case["kc"], case["vc"]
    B, E, Hq, D = q.shape
    out_k = paged_extend_attention(
        q, kc, vc, case["li"], case["pages"], case["seq"], case["prefix"],
        page_size=case["P"], num_kv_heads=case["Hkv"], sm_scale=sm_scale,
        pages_per_chunk=pages_per_chunk, q_block=q_block,
    )
    k_pages = kc[case["li"]][case["kv_indices"]].reshape(
        B, -1, case["Hkv"], D
    )
    v_pages = vc[case["li"]][case["kv_indices"]].reshape(
        B, -1, case["Hkv"], D
    )
    out_r = ref_paged_attention(
        q.astype(jnp.float32), k_pages.astype(jnp.float32),
        v_pages.astype(jnp.float32), case["kv_indices"], case["seq"],
        case["prefix"], sm_scale,
    )
    return np.asarray(out_k, np.float32), np.asarray(out_r, np.float32)


def _assert_close(case, out_k, out_r, tol):
    for b, n in enumerate(case["new"]):
        np.testing.assert_allclose(
            out_k[b, :n], out_r[b, :n], atol=tol, rtol=tol,
            err_msg=f"req {b} (new={n})",
        )


def test_extend_parity_d64_pairs():
    # Hkv*D = 512 -> ln=128, r=4, two kv heads per sub-row.
    case = _build_case(B=3, E=32, Hq=8, Hkv=4, D=64, P=8, seed=0)
    out_k, out_r = _run_both(case, q_block=32)
    _assert_close(case, out_k, out_r, 2e-5)


def test_extend_parity_d128_single():
    # ln = 128 = D -> one kv head per sub-row (zero-waste path).
    case = _build_case(B=2, E=16, Hq=4, Hkv=2, D=128, P=4, seed=1)
    out_k, out_r = _run_both(case, q_block=16, pages_per_chunk=3)
    _assert_close(case, out_k, out_r, 2e-5)


def test_extend_multiple_q_blocks():
    case = _build_case(B=2, E=64, Hq=4, Hkv=4, D=64, P=8, seed=2)
    out_k, out_r = _run_both(case, q_block=16)
    _assert_close(case, out_k, out_r, 2e-5)


def test_extend_decode_shape():
    # E=1 degenerates to decode semantics.
    case = _build_case(B=4, E=1, Hq=8, Hkv=4, D=64, P=8, seed=3)
    case["new"][:] = 1
    out_k, out_r = _run_both(case, q_block=1)
    _assert_close(case, out_k, out_r, 2e-5)


def test_extend_bf16_cache():
    case = _build_case(B=2, E=16, Hq=8, Hkv=4, D=64, P=8, seed=4,
                       dtype=jnp.bfloat16)
    out_k, out_r = _run_both(case, q_block=16)
    _assert_close(case, out_k, out_r, 3e-2)


def test_extend_zero_prefix():
    # Pure prefill: prefix 0, causal within the new tokens only.
    case = _build_case(B=2, E=16, Hq=4, Hkv=2, D=64, P=8, seed=5)
    case["prefix"] = jnp.zeros_like(case["prefix"])
    case["seq"] = jnp.asarray(case["new"])
    out_k, out_r = _run_both(case, q_block=16)
    _assert_close(case, out_k, out_r, 2e-5)
