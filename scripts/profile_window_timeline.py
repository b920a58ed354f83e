"""Timeline breakdown of the decode-window serving loop on real TPU.

Monkeypatches the scheduler/runner hot methods with wall-clock probes and
runs the bench workload, then prints where the non-device time goes:
  dispatch   = host time inside runner.forward_window (prep + jit call)
  contin     = host time inside _dispatch_window_continuation minus dispatch
  sync+proc  = _process_window_result (device sync on tokens + bookkeeping)
  other      = everything else (scheduler loop, extend path, detok, ...)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import LLAMA_1B_CFG, LLAMA_3B_CFG


def main():
    quant = os.environ.get("PROF_QUANT")
    cfg = dict(
        LLAMA_3B_CFG
        if os.environ.get("BENCH_MODEL", "llama3b") == "llama3b"
        else LLAMA_1B_CFG
    )
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
    page_size = int(os.environ.get("BENCH_PAGE_SIZE", "16"))
    window = int(os.environ.get("BENCH_WINDOW", "16"))
    args = ServerArgs(
        model_path=d, load_format="dummy", dtype="bfloat16",
        page_size=page_size,
        max_total_tokens=max(bs * (prompt_len + gen_len) * 2, 8192),
        max_running_requests=max(bs, 8),
        schedule_policy="fcfs", decode_window_size=window,
        kv_cache_dtype=os.environ.get("BENCH_KV", "fp8_e4m3"),
    )
    eng = Engine(args)
    sched = eng.scheduler
    runner = eng.model_runner

    stats = {"dispatch": 0.0, "contin": 0.0, "sync_proc": 0.0,
             "run_batch": 0.0, "n_windows": 0, "n_batches": 0}

    orig_fw = runner.forward_window
    def fw(wb):
        t0 = time.perf_counter()
        out = orig_fw(wb)
        stats["dispatch"] += time.perf_counter() - t0
        stats["n_windows"] += 1
        return out
    runner.forward_window = fw

    orig_cont = sched._dispatch_window_continuation
    def cont(prev):
        t0 = time.perf_counter()
        out = orig_cont(prev)
        stats["contin"] += time.perf_counter() - t0
        return out
    sched._dispatch_window_continuation = cont

    orig_proc = sched._process_window_result
    def proc(result):
        t0 = time.perf_counter()
        out = orig_proc(result)
        stats["sync_proc"] += time.perf_counter() - t0
        return out
    sched._process_window_result = proc

    orig_rb = sched.run_batch
    def rb(batch):
        t0 = time.perf_counter()
        out = orig_rb(batch)
        stats["run_batch"] += time.perf_counter() - t0
        stats["n_batches"] += 1
        return out
    sched.run_batch = rb

    stats["els"] = 0.0
    stats["n_els"] = 0
    orig_els = sched.event_loop_step
    def els():
        t0 = time.perf_counter()
        out = orig_els()
        stats["els"] += time.perf_counter() - t0
        stats["n_els"] += 1
        return out
    sched.event_loop_step = els

    stats["gnb"] = 0.0
    orig_gnb = sched.get_next_batch_to_run
    def gnb():
        t0 = time.perf_counter()
        out = orig_gnb()
        stats["gnb"] += time.perf_counter() - t0
        return out
    sched.get_next_batch_to_run = gnb

    stats["pbr"] = 0.0
    orig_pbr = sched.process_batch_result
    def pbr(result):
        t0 = time.perf_counter()
        out = orig_pbr(result)
        stats["pbr"] += time.perf_counter() - t0
        return out
    sched.process_batch_result = pbr

    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(5, cfg["vocab_size"] - 10, size=prompt_len)]
        for _ in range(bs)
    ]
    sp = {"max_new_tokens": gen_len, "temperature": 0.0, "ignore_eos": True}
    eng.generate(input_ids=prompts, sampling_params=sp)  # warm all buckets
    eng.flush_cache()
    for k in stats:
        stats[k] = 0 if isinstance(stats[k], int) else 0.0

    t0 = time.perf_counter()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    total = time.perf_counter() - t0
    toks = sum(len(o["output_ids"]) for o in outs)

    in_loop_other = stats["els"] - stats["run_batch"] - stats["contin"] - \
        stats["sync_proc"] - stats["gnb"] - stats["pbr"]
    outside_loop = total - stats["els"]
    print(f"total {total*1e3:8.1f} ms   {toks} toks  {toks/total:8.0f} tok/s")
    print(f"event_loop_step total            {stats['els']*1e3:8.1f} ms  n={stats['n_els']}")
    print(f"  run_batch                      {stats['run_batch']*1e3:8.1f} ms  n={stats['n_batches']}")
    print(f"  get_next_batch_to_run          {stats['gnb']*1e3:8.1f} ms")
    print(f"  process_batch_result           {stats['pbr']*1e3:8.1f} ms")
    print(f"  continuation total             {stats['contin']*1e3:8.1f} ms  (incl dispatch)")
    print(f"    forward_window dispatch      {stats['dispatch']*1e3:8.1f} ms  n={stats['n_windows']}")
    print(f"  sync+process result            {stats['sync_proc']*1e3:8.1f} ms")
    print(f"  in-loop other                  {in_loop_other*1e3:8.1f} ms")
    print(f"outside loop (generate)          {outside_loop*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
