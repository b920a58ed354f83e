"""Microbenchmark: fused INT4 kernel vs bf16 matmul at decode shapes.

Run on the real TPU. Uses dependency chains so the tunnel runtime can't
dedupe repeated executions.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.ops.quant_matmul import int4_matmul_pallas

SHAPES = [
    (32, 2048, 2560),   # qkv
    (32, 2048, 2048),   # o
    (32, 2048, 16384),  # gate_up
    (32, 8192, 2048),   # down
]
G = 128


def timeit(fn, x, iters=50):
    x = fn(x)  # warm
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    for M, K, N in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (M, K), dtype=jnp.bfloat16)
        wb = jax.random.normal(key, (K, N), dtype=jnp.bfloat16)
        w4 = jax.device_put(
            np.random.randint(0, 256, size=(K // 2, N), dtype=np.uint8).view(np.int8)
        )
        scales = jax.device_put(np.random.rand(K // G, N).astype(np.float32) * 0.01)
        zeros = jax.device_put(np.full((K // G, N), 8.0, np.float32))

        R = 32  # repeats inside one program to amortize dispatch

        @jax.jit
        def bf(v):
            for _ in range(R):
                v = jnp.max(v @ wb, axis=1, keepdims=True) * 1e-6 + v
            return v

        t_bf = timeit(bf, x, iters=10) / R

        @jax.jit
        def qj(v):
            for _ in range(R):
                o = int4_matmul_pallas(v, w4, scales, zeros, G)
                v = jnp.max(o, axis=1, keepdims=True).astype(jnp.bfloat16) * 1e-6 + v
            return v

        t_q = timeit(qj, x, iters=10) / R
        wbytes_bf = K * N * 2
        wbytes_q = K * N // 2 + 2 * (K // G) * N * 4
        # v5e HBM ~819 GB/s
        floor_bf = wbytes_bf / 819e9 * 1e6
        floor_q = wbytes_q / 819e9 * 1e6
        print(
            f"M{M} K{K} N{N}: bf16 {t_bf:7.1f}us (floor {floor_bf:6.1f}) | "
            f"int4 {t_q:7.1f}us (floor {floor_q:6.1f}) | ratio {t_bf/t_q:.2f}x"
        )


if __name__ == "__main__":
    main()
