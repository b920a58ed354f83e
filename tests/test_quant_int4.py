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


# ------------------------------------------------- fused-kernel block picker
# r03's bench crashed on the Llama-3.2-3B QKV geometry: _pick_blocks chose a
# scales block with gb=12 sublanes, violating Mosaic's divisible-by-8 rule
# (VERDICT r03 weak #1). The picker now jointly chooses (Kb, Nb, Geff); these
# sweeps assert every Mosaic block rule over the real model geometries.

REAL_GEOMETRIES = []  # (K, N) matmul shapes from the supported model zoo
for _hs, _im, _hq, _hkv, _vocab in [
    (2048, 8192, 2048, 512, 128256),   # llama-3.2-1B
    (3072, 8192, 3072, 1024, 128256),  # llama-3.2-3B (the r03 crash)
    (4096, 14336, 4096, 1024, 128256),  # llama-3-8B
    (5120, 27648, 5120, 1024, 152064),  # qwen2.5-32B
    (3584, 18944, 3584, 512, 152064),  # qwen2.5-7B
    (2560, 6912, 2560, 1024, 128000),  # phi-class odd intermediate
]:
    REAL_GEOMETRIES += [
        (_hs, _hq + 2 * _hkv),  # fused QKV
        (_hq, _hs),             # o_proj
        (_hs, 2 * _im),         # fused gate_up
        (_im, _hs),             # down_proj
        (_hs, _vocab),          # lm_head
    ]


@pytest.mark.parametrize("G", [32, 64, 128])
def test_pick_blocks_mosaic_rules_sweep(G):
    from ltp_sglang_tpu.ops.quant_matmul import _W4_BLOCK_BYTES, _pick_blocks

    for K, N in REAL_GEOMETRIES:
        if K % (2 * G):
            continue
        Kh = K // 2
        picked = _pick_blocks(Kh, N, G)
        assert picked is not None, (K, N, G)
        Kb, Nb, Geff = picked
        assert Kh % Kb == 0 and N % Nb == 0 and G % Geff == 0, (K, N, G, picked)
        assert Kb % 128 == 0, (K, N, G, picked)  # x-block lane rule
        gb = Kb // Geff
        assert Kb % Geff == 0 and gb % 8 == 0, (K, N, G, picked)  # sublane rule
        assert Nb % 128 == 0 or Nb == N, (K, N, G, picked)
        assert Kb * Nb <= max(_W4_BLOCK_BYTES, 128 * Kb), (K, N, G, picked)


def test_kernel_matches_ref_r03_crash_geometry():
    """The exact geometry that crashed BENCH_r03 (3B fused QKV, G=128),
    end-to-end through the kernel wrapper (interpret mode on CPU)."""
    from ltp_sglang_tpu.ops.quant_matmul import int4_matmul_pallas

    Kg, Ng, Gg = 3072, 5120, 128
    rng = np.random.default_rng(7)
    wmat = (rng.standard_normal((Kg, Ng)) * 0.02).astype(np.float32)
    qweight, qzeros, scales, w_ref = quantize_to_awq(wmat, group_size=Gg)
    internal = unpack_awq_to_internal(qweight, qzeros, scales)
    x = (rng.standard_normal((4, Kg)) * 0.5).astype(np.float32)
    out = np.asarray(
        int4_matmul_pallas(
            jnp.asarray(x, jnp.bfloat16),
            jnp.asarray(internal["w4"]),
            jnp.asarray(internal["scales"]),
            jnp.asarray(internal["zeros"]),
            Gg,
        ).astype(jnp.float32)
    )
    ref = x @ w_ref
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-1)


def test_jnp_fallback_on_unsupported_geometry():
    """A geometry with no legal block choice must warn once and produce
    correct output through the jnp dequant fallback, never crash."""
    from ltp_sglang_tpu.ops import quant_matmul as qm

    Kg, Ng, Gg = 96, 96, 48  # Kh=48: no divisor is a multiple of 128
    assert qm._pick_blocks(Kg // 2, Ng, Gg) is None
    rng = np.random.default_rng(9)
    wmat = (rng.standard_normal((Kg, Ng)) * 0.1).astype(np.float32)
    qweight, qzeros, scales, w_ref = quantize_to_awq(wmat, group_size=Gg)
    internal = unpack_awq_to_internal(qweight, qzeros, scales)
    x = rng.standard_normal((3, Kg)).astype(np.float32)
    qm._FALLBACK_WARNED.clear()
    with pytest.warns(UserWarning, match="jnp dequant fallback"):
        out = np.asarray(
            qm.int4_matmul_pallas(
                jnp.asarray(x),
                jnp.asarray(internal["w4"]),
                jnp.asarray(internal["scales"]),
                jnp.asarray(internal["zeros"]),
                Gg,
            )
        )
    np.testing.assert_allclose(out, x @ w_ref, rtol=2e-2, atol=2e-2)
    # warned exactly once; second call is silent
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        qm.int4_matmul_pallas(
            jnp.asarray(x),
            jnp.asarray(internal["w4"]),
            jnp.asarray(internal["scales"]),
            jnp.asarray(internal["zeros"]),
            Gg,
        )


def test_normalize_int4_scales_pre_repeats_and_stays_exact():
    """Load-time scale normalization (int4.normalize_int4_scales): leaves
    whose geometry forces Geff < G get their scales/zeros pre-repeated ONCE
    so the kernel wrapper's per-call repeat is a no-op (r04 profile: the
    in-scan repeat was 90% of int4 decode time on the 3B geometry), and the
    result stays bit-identical because every consumer infers the group size
    from the leaf shapes."""
    import jax.numpy as jnp

    from ltp_sglang_tpu.layers.quantization.int4 import (
        normalize_int4_scales,
        quantized_matmul_ref,
    )
    from ltp_sglang_tpu.ops.quant_matmul import _pick_blocks, int4_matmul_pallas

    rng = np.random.default_rng(0)
    # 3B down-proj-like geometry: K=8192 G=128 picks Geff=128 (no repeat);
    # K=3072 G=128 picks Geff=64 (repeat 2x). Scaled-down equivalents with
    # the same divisibility classes:
    for K, N, G in [(3072, 512, 128), (8192, 256, 128), (256, 128, 64)]:
        picked = _pick_blocks(K // 2, N, G)
        w4 = rng.integers(0, 256, size=(K // 2, N), dtype=np.uint8).view(np.int8)
        scales = (rng.random((K // G, N)).astype(np.float32) + 0.5) * 0.01
        zeros = rng.integers(0, 16, size=(K // G, N)).astype(np.float32)
        leaf = {"w4": jnp.asarray(w4), "scales": jnp.asarray(scales),
                "zeros": jnp.asarray(zeros)}
        x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
        ref = quantized_matmul_ref(x, dict(leaf), G)

        tree = {"layers": {"down_proj": leaf}}
        normalize_int4_scales(tree)
        leaf_n = tree["layers"]["down_proj"]
        if picked is not None and picked[2] != G:
            assert leaf_n["scales"].shape[0] == K // picked[2], (K, N, G)
        # Both consumers reproduce the same numbers from normalized leaves.
        out_ref = quantized_matmul_ref(x, leaf_n, G)
        np.testing.assert_allclose(np.asarray(out_ref), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        out_k = int4_matmul_pallas(
            x.astype(jnp.bfloat16), leaf_n["w4"], leaf_n["scales"],
            leaf_n["zeros"], G,
        )
        np.testing.assert_allclose(
            np.asarray(out_k, np.float32), np.asarray(ref), rtol=0.05, atol=0.3,
        )
