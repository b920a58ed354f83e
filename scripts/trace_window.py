"""Capture a jax.profiler device trace of the steady-state decode window and
dump the raw xplane path for op-level analysis."""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import LLAMA_1B_CFG


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/win_trace"
    quant = os.environ.get("PROF_QUANT")
    cfg = dict(LLAMA_1B_CFG)
    if quant:
        cfg["quantization_config"] = {
            "quant_method": quant, "bits": 4, "group_size": 128,
        }
    d = tempfile.mkdtemp(prefix="prof_model_")
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    bs, prompt_len, gen_len = 32, 64, 96
    args = ServerArgs(
        model_path=d, load_format="dummy", dtype="bfloat16",
        page_size=int(os.environ.get("BENCH_PAGE_SIZE", "16")),
        max_total_tokens=max(bs * (prompt_len + gen_len) * 2, 8192),
        max_running_requests=max(bs, 8),
        schedule_policy="fcfs",
        decode_window_size=int(os.environ.get("BENCH_WINDOW", "16")),
    )
    eng = Engine(args)
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(5, cfg["vocab_size"] - 10, size=prompt_len)]
        for _ in range(bs)
    ]
    sp = {"max_new_tokens": gen_len, "temperature": 0.0, "ignore_eos": True}
    eng.generate(input_ids=prompts, sampling_params=sp)  # warm
    eng.flush_cache()

    jax.profiler.start_trace(out_dir)
    t0 = time.time()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    el = time.time() - t0
    jax.profiler.stop_trace()
    toks = sum(len(o["output_ids"]) for o in outs)
    print(f"{toks} toks in {el*1e3:.1f} ms -> {toks/el:.0f} tok/s")
    print("trace dir:", out_dir)


if __name__ == "__main__":
    main()
