"""Benchmark harness: prints ONE JSON line with the headline metric.

Measures steady-state decode throughput (continuous batching, greedy) on a
Llama-3.2-1B-shaped model with dummy weights — the analog of the reference's
`bench_one_batch` decode tok/s (python/sglang/bench_one_batch.py). On TPU,
vs_baseline compares against the HBM-bandwidth roofline for bf16 decode
(params read once per step), so 1.0 == speed of light for this batch size.

The same run also measures the AWQ-INT4 fused-kernel path (north-star:
INT4 >= 1.5x BF16) and reports int4_tok_per_s / int4_vs_bf16 as extra keys
on the same JSON line. Set BENCH_QUANT=awq to make INT4 the headline metric
instead; BENCH_SKIP_INT4=1 skips the INT4 pass.
"""

import gc
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


def run_one(cfg, quant, bs, prompt_len, gen_len, page_size, window,
            kv_dtype=None):
    """Build an Engine for `cfg` (optionally quantized) and measure
    steady-state decode tok/s; returns (tok_per_s, param_bytes)."""
    cfg = dict(cfg)
    if quant == "fp8":
        cfg["quantization_config"] = {"quant_method": "fp8", "fmt": "e4m3"}
    elif quant:
        cfg["quantization_config"] = {
            "quant_method": quant, "bits": 4, "group_size": 128,
        }
    d = tempfile.mkdtemp(prefix="bench_model_")
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    args = ServerArgs(
        model_path=d,
        load_format="dummy",
        dtype="bfloat16",
        kv_cache_dtype=kv_dtype or os.environ.get("BENCH_KV", "auto"),
        page_size=page_size,
        max_total_tokens=max(bs * (prompt_len + gen_len) * 2, 8192),
        max_running_requests=max(bs, 8),
        schedule_policy="fcfs",
        decode_window_size=window,
    )
    eng = Engine(args)

    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(5, cfg["vocab_size"] - 10, size=prompt_len)]
        for _ in range(bs)
    ]
    sp = {"max_new_tokens": gen_len, "temperature": 0.0, "ignore_eos": True}

    # Warmup: a full-length run, so every bucket the timed run touches —
    # extend, each window/continuation (B, K, C) variant, and the final
    # unpipelined windows — is compiled before timing. Persistent XLA cache
    # makes subsequent runs start fast.
    eng.generate(input_ids=prompts, sampling_params=sp)
    eng.flush_cache()
    sp1 = dict(sp, max_new_tokens=1)
    eng.generate(input_ids=prompts, sampling_params=sp1)
    eng.flush_cache()

    # Two-point measurement (the reference's bench_one_batch separates
    # prefill latency from decode tok/s): t1 = prefill + 1 token,
    # t_full = prefill + gen_len tokens; decode rate excludes prefill.
    # Best-of-3: the network-attached chip shows +-10% run-to-run noise.
    t1 = float("inf")
    t_full = float("inf")
    for _ in range(3):
        t0 = time.time()
        eng.generate(input_ids=prompts, sampling_params=sp1)
        t1 = min(t1, time.time() - t0)
        eng.flush_cache()
        t0 = time.time()
        outs = eng.generate(input_ids=prompts, sampling_params=sp)
        t_full = min(t_full, time.time() - t0)
        eng.flush_cache()
    decode_tokens = sum(len(o["output_ids"]) - 1 for o in outs)
    tok_per_s = decode_tokens / max(t_full - t1, 1e-9)
    param_bytes = count_param_bytes(eng.model_runner.params)
    eng.shutdown() if hasattr(eng, "shutdown") else None
    del eng
    gc.collect()
    return tok_per_s, param_bytes


def main():
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    quant_headline = os.environ.get("BENCH_QUANT")

    cfg = dict(LLAMA_1B_CFG)
    bs, prompt_len, gen_len = (32, 64, 96) if on_tpu else (8, 16, 24)
    if not on_tpu:
        cfg.update(
            hidden_size=256, intermediate_size=512, num_hidden_layers=4,
            num_attention_heads=8, num_key_value_heads=4, head_dim=32,
            vocab_size=2048,
        )

    page_size = int(os.environ.get("BENCH_PAGE_SIZE", "16" if on_tpu else "1"))
    window = int(os.environ.get("BENCH_WINDOW", "32" if on_tpu else "8"))

    bf16_tok_s, param_bytes = run_one(
        cfg, None, bs, prompt_len, gen_len, page_size, window
    )
    int4_tok_s = None
    # The INT4 serving config pairs weight-only INT4 with the SCALED fp8 KV
    # cache (standard W4A16+FP8KV deployment; the reference nightly-tests
    # this pairing) — reported as int4_kv for transparency.
    int4_kv = os.environ.get("BENCH_KV_INT4", "fp8_e4m3")
    if on_tpu and os.environ.get("BENCH_SKIP_INT4") != "1":
        try:
            int4_tok_s, _ = run_one(
                cfg, quant_headline or "awq", bs, prompt_len, gen_len,
                page_size, window, kv_dtype=int4_kv,
            )
        except Exception as e:  # keep the headline line intact
            print(f"int4 bench failed: {e}", file=sys.stderr)

    ideal_step = param_bytes / HBM_BW.get(backend, 100e9)
    ideal_tok_per_s = bs / ideal_step
    if quant_headline and int4_tok_s is not None:
        headline, wtag = int4_tok_s, (
            quant_headline if quant_headline == "fp8" else f"{quant_headline}4"
        )
    else:
        headline, wtag = bf16_tok_s, "bf16"
    result = {
        "metric": f"decode_tok_per_s_llama1b_{wtag}_bs{bs}_{backend}",
        "value": round(headline, 2),
        "unit": "tok/s",
        "vs_baseline": round(headline / ideal_tok_per_s, 4),
    }
    if int4_tok_s is not None:
        result["bf16_tok_per_s"] = round(bf16_tok_s, 2)
        result["int4_tok_per_s"] = round(int4_tok_s, 2)
        result["int4_kv"] = int4_kv
        result["int4_vs_bf16"] = round(int4_tok_s / bf16_tok_s, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
