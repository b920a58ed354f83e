"""A/B the MLA latent decode paths on real TPU: Pallas kernel vs XLA gather.

DeepSeek-V2-Lite ATTENTION geometry (kv_lora 512 / rope 64 / 16 heads /
latent rows padded to 768) over a reduced layer/expert count so the dummy
engine fits one 16 GB chip. Prints decode tok/s for both paths (same
engine args; the kernel path is page_size>1 + the runner's MLA gate, the
gather path disables it).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DSV2_GEOM = {
    "architectures": ["DeepseekV2ForCausalLM"],
    "model_type": "deepseek_v2",
    "hidden_size": 2048,
    "intermediate_size": 8192,
    "moe_intermediate_size": 1408,
    "num_hidden_layers": 12,
    "num_attention_heads": 16,
    "num_key_value_heads": 16,
    "vocab_size": 32064,
    "max_position_embeddings": 4096,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 2,
    "q_lora_rank": None,
    "kv_lora_rank": 512,
    "qk_nope_head_dim": 128,
    "qk_rope_head_dim": 64,
    "v_head_dim": 128,
    "first_k_dense_replace": 1,
    "n_routed_experts": 16,
    "n_shared_experts": 2,
    "num_experts_per_tok": 6,
    "n_group": 1,
    "topk_group": 1,
    "topk_method": "greedy",
    "norm_topk_prob": False,
    "scoring_func": "softmax",
    "routed_scaling_factor": 1.0,
    "torch_dtype": "bfloat16",
}


def run(use_kernel: bool, bs=32, prompt_len=512, gen_len=64, reps=3):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="mla_bench_")
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(DSV2_GEOM, f)
    eng = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="bfloat16",
        page_size=16, decode_window_size=32,
        max_total_tokens=max(bs * (prompt_len + gen_len) * 2, 8192),
        max_running_requests=max(bs, 8), schedule_policy="fcfs",
    ))
    if not use_kernel:
        eng.model_runner.model.mla_kernel_page_size = 0
        eng.model_runner._step_cache.clear()
    got = getattr(eng.model_runner.model, "mla_kernel_page_size", 0)
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(5, 32000, size=prompt_len)]
        for _ in range(bs)
    ]
    sp = {"max_new_tokens": gen_len, "temperature": 0.0, "ignore_eos": True}
    sp1 = dict(sp, max_new_tokens=1)
    eng.generate(input_ids=prompts, sampling_params=sp)
    eng.flush_cache()
    eng.generate(input_ids=prompts, sampling_params=sp1)
    eng.flush_cache()
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        eng.generate(input_ids=prompts, sampling_params=sp1)
        t1 = time.time() - t0
        eng.flush_cache()
        t0 = time.time()
        outs = eng.generate(input_ids=prompts, sampling_params=sp)
        t_full = time.time() - t0
        eng.flush_cache()
        dec = sum(len(o["output_ids"]) - 1 for o in outs)
        best = max(best, dec / max(t_full - t1, 1e-9))
    eng.close()
    return best, got


def main():
    gather, g0 = run(False)
    print(f"mla_gather_decode_tok_per_s: {gather:.1f} (kernel gate={g0} off)")
    kern, g1 = run(True)
    print(f"mla_kernel_decode_tok_per_s: {kern:.1f} (kernel gate={g1})")
    print(json.dumps({
        "metric": "mla_decode_kernel_vs_gather",
        "kernel_tok_per_s": round(kern, 1),
        "gather_tok_per_s": round(gather, 1),
        "speedup": round(kern / max(gather, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
