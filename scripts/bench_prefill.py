"""Prefill throughput + MFU on real TPU: XLA gather path vs the Pallas
ragged extend kernel, at 1k and 8k prompt lengths (the reference's prefill
MFU table, benchmark/sigma_v2/performance_singlenode.md:37-63, plateaus at
~17-19% MFU; this script reports ours).

Usage: python scripts/bench_prefill.py [--quant awq]
Env: PREFILL_LENS=1024,8192  PREFILL_BS=1
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import LLAMA_1B_CFG

# v5e (v5 lite): 197 TFLOP/s bf16.
PEAK_FLOPS = 197e12


def run(cfg, page_size, lens, bs, disable_kernel):
    d = tempfile.mkdtemp(prefix="prefill_model_")
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    max_len = max(lens)
    args = ServerArgs(
        model_path=d, load_format="dummy", dtype="bfloat16",
        page_size=page_size,
        max_total_tokens=bs * (max_len + 64) * 2,
        max_running_requests=max(bs, 8),
        chunked_prefill_size=1 << 30,  # whole-prompt prefill for clean timing
        max_prefill_tokens=1 << 30,
        context_buckets=[256, 1024, 2048, 4096, 8192, 16384],
        schedule_policy="fcfs",
    )
    eng = Engine(args)
    if disable_kernel:
        eng.model_runner.model.extend_attn = None

    # Model FLOPs per prompt token (matmuls only): qkvo + mlp + lm_head
    # (+ attention, counted quadratically per length below).
    hf = cfg
    Dm, I, L = hf["hidden_size"], hf["intermediate_size"], hf["num_hidden_layers"]
    Hq = hf["num_attention_heads"]
    Hkv = hf["num_key_value_heads"]
    Dh = hf.get("head_dim", Dm // Hq)
    V = hf["vocab_size"]
    lin_flops_per_tok = 2 * L * (
        Dm * (Hq * Dh) + 2 * Dm * (Hkv * Dh) + (Hq * Dh) * Dm + 3 * Dm * I
    ) + 2 * Dm * V

    rng = np.random.default_rng(0)
    results = {}
    for plen in lens:
        prompts = [
            [int(x) for x in rng.integers(5, V - 10, size=plen)]
            for _ in range(bs)
        ]
        sp = {"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True}
        eng.generate(input_ids=prompts, sampling_params=sp)  # warmup/compile
        eng.flush_cache()
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            eng.generate(input_ids=prompts, sampling_params=sp)
            eng.flush_cache()
        dt = (time.time() - t0) / reps
        toks = bs * plen
        # attention flops: 2 matmuls * (plen^2 / 2 causal) * Hq * Dh per layer
        attn_flops = 2 * 2 * L * Hq * Dh * (plen * plen / 2) * bs
        flops = lin_flops_per_tok * toks + attn_flops
        results[plen] = {
            "tok_per_s": round(toks / dt, 1),
            "mfu": round(flops / dt / PEAK_FLOPS, 4),
            "ms": round(dt * 1e3, 1),
        }
    del eng
    return results


def main():
    cfg = dict(LLAMA_1B_CFG)
    lens = [int(x) for x in os.environ.get("PREFILL_LENS", "1024,8192").split(",")]
    bs = int(os.environ.get("PREFILL_BS", "1"))
    cfg["max_position_embeddings"] = max(lens) + 128
    kernel = run(cfg, 16, lens, bs, disable_kernel=False)
    xla = run(cfg, 16, lens, bs, disable_kernel=True)
    print(json.dumps({"kernel": kernel, "xla_gather": xla}))


if __name__ == "__main__":
    main()
