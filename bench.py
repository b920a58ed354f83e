"""Benchmark harness: prints ONE JSON line with the headline metric.

Measures steady-state decode throughput (continuous batching, greedy) on a
Llama-3.2-1B-shaped model with dummy weights — the analog of the reference's
`bench_one_batch` decode tok/s (python/sglang/bench_one_batch.py). On TPU,
vs_baseline compares against the HBM-bandwidth roofline for bf16 decode
(params read once per step), so 1.0 == speed of light for this batch size.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

LLAMA_1B_CFG = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 2048,
    "intermediate_size": 8192,
    "num_hidden_layers": 16,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "head_dim": 64,
    "vocab_size": 128256,
    "max_position_embeddings": 4096,
    "rms_norm_eps": 1e-5,
    "rope_theta": 500000.0,
    "rope_scaling": {
        "rope_type": "llama3",
        "factor": 32.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
    },
    "tie_word_embeddings": True,
    "eos_token_id": 128001,
    "model_type": "llama",
}

# v5e (v5 lite) HBM bandwidth ~819 GB/s.
HBM_BW = {"tpu": 819e9, "cpu": 50e9}


def count_param_bytes(params):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def main():
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    # BENCH_QUANT=awq runs the same model with dummy INT4 weights through the
    # fused Pallas dequant+matmul path (north-star config).
    quant = os.environ.get("BENCH_QUANT")

    cfg = dict(LLAMA_1B_CFG)
    if quant:
        cfg["quantization_config"] = {
            "quant_method": quant, "bits": 4, "group_size": 128,
        }
    bs, prompt_len, gen_len = (32, 64, 96) if on_tpu else (8, 16, 24)
    if not on_tpu:
        cfg.update(
            hidden_size=256, intermediate_size=512, num_hidden_layers=4,
            num_attention_heads=8, num_key_value_heads=4, head_dim=32,
            vocab_size=2048,
        )

    d = tempfile.mkdtemp(prefix="bench_model_")
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    page_size = int(os.environ.get("BENCH_PAGE_SIZE", "1"))
    args = ServerArgs(
        model_path=d,
        load_format="dummy",
        dtype="bfloat16",
        page_size=page_size,
        max_total_tokens=max(bs * (prompt_len + gen_len) * 2, 8192),
        max_running_requests=max(bs, 8),
        schedule_policy="fcfs",
        decode_window_size=int(os.environ.get("BENCH_WINDOW", "8")),
    )
    eng = Engine(args)

    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(5, cfg["vocab_size"] - 10, size=prompt_len)]
        for _ in range(bs)
    ]
    sp = {"max_new_tokens": gen_len, "temperature": 0.0, "ignore_eos": True}

    # Warmup: compiles the exact extend + decode buckets the timed run uses
    # (full batch size, same context bucket). Persistent XLA cache makes
    # subsequent runs start fast.
    eng.generate(input_ids=prompts, sampling_params=dict(sp, max_new_tokens=8))
    eng.flush_cache()

    t0 = time.time()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    elapsed = time.time() - t0
    total_tokens = sum(len(o["output_ids"]) for o in outs)
    tok_per_s = total_tokens / elapsed

    param_bytes = count_param_bytes(eng.model_runner.params)
    ideal_step = param_bytes / HBM_BW.get(backend, 100e9)
    ideal_tok_per_s = bs / ideal_step
    wtag = f"{quant}4" if quant else "bf16"
    result = {
        "metric": f"decode_tok_per_s_llama1b_{wtag}_bs{bs}_{backend}",
        "value": round(tok_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_per_s / ideal_tok_per_s, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
