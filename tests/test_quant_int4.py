"""INT4 (AWQ/GPTQ) ingestion + dequantization correctness.

The packers fabricate HF-layout checkpoints (same bit layout as
awq_triton.py / gptq.py in the reference); the unpack+dequant chain must
reproduce the quantization reference exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ltp_sglang_tpu.layers.quantization.int4 import (
    dequantize_int4,
    quantize_to_awq,
    quantize_to_gptq,
    quantized_matmul_ref,
    unpack_awq_to_internal,
    unpack_gptq_to_internal,
    unpack_internal,
)

K, N, G = 256, 128, 64  # group_size 64


@pytest.fixture
def w():
    return np.random.default_rng(0).standard_normal((K, N)).astype(np.float32)


def test_awq_roundtrip(w):
    qweight, qzeros, scales, w_ref = quantize_to_awq(w, group_size=G)
    assert qweight.shape == (K, N // 8) and qweight.dtype == np.int32
    assert qzeros.shape == (K // G, N // 8)
    internal = unpack_awq_to_internal(qweight, qzeros, scales)
    assert internal["w4"].shape == (K // 2, N) and internal["w4"].dtype == np.int8
    deq = np.asarray(
        dequantize_int4(
            jnp.asarray(internal["w4"]),
            jnp.asarray(internal["scales"]),
            jnp.asarray(internal["zeros"]),
            G,
            jnp.float32,
        )
    )
    np.testing.assert_allclose(deq, w_ref, atol=1e-5)
    # and the quantization error itself is bounded by half a step
    step = (w.max() - w.min()) / 15
    assert np.abs(deq - w).max() < step


@pytest.mark.parametrize("v2", [False, True])
def test_gptq_roundtrip(w, v2):
    qweight, qzeros, scales, g_idx, w_ref = quantize_to_gptq(w, group_size=G, v2=v2)
    assert qweight.shape == (K // 8, N)
    internal = unpack_gptq_to_internal(
        qweight, qzeros, scales, g_idx,
        checkpoint_format="gptq_v2" if v2 else "gptq",
    )
    assert "perm" not in internal
    deq = np.asarray(
        dequantize_int4(
            jnp.asarray(internal["w4"]),
            jnp.asarray(internal["scales"]),
            jnp.asarray(internal["zeros"]),
            G,
            jnp.float32,
        )
    )
    np.testing.assert_allclose(deq, w_ref, atol=1e-5)


def test_gptq_act_order(w):
    qweight, qzeros, scales, g_idx, w_ref = quantize_to_gptq(
        w, group_size=G, act_order=True
    )
    internal = unpack_gptq_to_internal(qweight, qzeros, scales, g_idx)
    assert "perm" in internal
    x = np.random.default_rng(1).standard_normal((4, K)).astype(np.float32)
    out = np.asarray(
        quantized_matmul_ref(jnp.asarray(x), {k: jnp.asarray(v) for k, v in internal.items()}, G)
    )
    np.testing.assert_allclose(out, x @ w_ref, rtol=2e-2, atol=2e-2)


def test_internal_pack_unpack():
    rng = np.random.default_rng(2)
    q = rng.integers(0, 16, size=(8, 10)).astype(np.uint8)
    from ltp_sglang_tpu.layers.quantization.int4 import _pack_internal

    packed = _pack_internal(q)
    assert packed.shape == (4, 10)
    np.testing.assert_array_equal(unpack_internal(packed), q)


def test_matmul_ref_matches_dense(w):
    qweight, qzeros, scales, w_ref = quantize_to_awq(w, group_size=G)
    internal = unpack_awq_to_internal(qweight, qzeros, scales)
    x = np.random.default_rng(3).standard_normal((5, K)).astype(np.float32)
    out = np.asarray(
        quantized_matmul_ref(
            jnp.asarray(x), {k: jnp.asarray(v) for k, v in internal.items()}, G
        )
    )
    np.testing.assert_allclose(out, x @ w_ref, rtol=2e-2, atol=2e-2)
