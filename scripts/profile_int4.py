"""Profile the int4 kernel vs bf16 matmul with device-time op stats."""

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.ops.quant_matmul import int4_matmul_pallas

G = 128
R = 64


def run_case(M, K, N, outdir):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), dtype=jnp.bfloat16)
    wb = jax.random.normal(key, (K, N), dtype=jnp.bfloat16)
    w4 = jax.device_put(
        np.random.randint(0, 256, size=(K // 2, N), dtype=np.uint8).view(np.int8)
    )
    scales = jax.device_put(np.random.rand(K // G, N).astype(np.float32) * 0.01)
    zeros = jax.device_put(np.full((K // G, N), 8.0, np.float32))

    @jax.jit
    def bf(v):
        for _ in range(R):
            v = jnp.max(v @ wb, axis=1, keepdims=True) * 1e-6 + v
        return v

    @jax.jit
    def qj(v):
        for _ in range(R):
            o = int4_matmul_pallas(v, w4, scales, zeros, G)
            v = jnp.max(o, axis=1, keepdims=True).astype(jnp.bfloat16) * 1e-6 + v
        return v

    jax.block_until_ready(bf(x))
    jax.block_until_ready(qj(x))
    with jax.profiler.trace(outdir):
        jax.block_until_ready(bf(x))
        jax.block_until_ready(qj(x))


def op_stats(outdir):
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(os.path.join(outdir, "**/*.xplane.pb"), recursive=True)
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    import gzip, json

    try:
        rows = json.loads(gzip.decompress(data).decode())
    except Exception:
        rows = json.loads(data.decode())
    table = rows[0]["rows"]
    cols = [c["id"] for c in rows[0]["cols"]]
    out = []
    for r in table:
        d = dict(zip(cols, [c.get("v") for c in r["c"]]))
        out.append(d)
    return out


def main():
    M, K, N = 32, 2048, 16384
    if len(sys.argv) > 3:
        M, K, N = map(int, sys.argv[1:4])
    outdir = f"/tmp/int4prof_{M}_{K}_{N}_{int(time.time())}"
    run_case(M, K, N, outdir)
    rows = op_stats(outdir)
    # rows: list of dicts with keys like 'Type','Operation','Avg. self-time (us)'...
    print("top device ops by total self time:")
    for d in rows:
        if d.get("host_or_device") != "Device":
            continue
        t = float(d.get("total_self_time") or 0)
        if t > 1:
            print(f"  {t:10.1f} us  bw={d.get('measured_memory_bw'):>8.1f} GB/s  {str(d.get('operation'))[:80]}")


if __name__ == "__main__":
    main()
