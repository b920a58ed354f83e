"""Profile the engine decode loop (bf16 or BENCH_QUANT=awq) with op stats."""

import faulthandler
import glob
import json
import os
import signal
import sys
import tempfile
import time

faulthandler.register(signal.SIGUSR1)

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from bench import LLAMA_1B_CFG, LLAMA_3B_CFG


def main():
    quant = os.environ.get("BENCH_QUANT")
    cfg = dict(
        LLAMA_3B_CFG
        if os.environ.get("BENCH_MODEL", "llama3b") == "llama3b"
        else LLAMA_1B_CFG
    )
    if quant:
        cfg["quantization_config"] = {
            "quant_method": quant, "bits": 4, "group_size": 128,
        }
    bs, prompt_len, gen_len = 32, 64, 96
    d = tempfile.mkdtemp(prefix="prof_model_")
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="bfloat16",
        kv_cache_dtype=os.environ.get("BENCH_KV", "fp8_e4m3"),
        page_size=int(os.environ.get("BENCH_PAGE_SIZE", "16")),
        decode_window_size=int(os.environ.get("BENCH_WINDOW", "32")),
        max_total_tokens=max(bs * (prompt_len + gen_len) * 2, 8192),
        max_running_requests=max(bs, 8), schedule_policy="fcfs",
    ))
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(5, cfg["vocab_size"] - 10, size=prompt_len)]
        for _ in range(bs)
    ]
    sp = {"max_new_tokens": gen_len, "temperature": 0.0, "ignore_eos": True}
    eng.generate(input_ids=prompts, sampling_params=dict(sp, max_new_tokens=8))
    eng.flush_cache()

    outdir = f"/tmp/engprof_{quant or 'bf16'}_{int(time.time())}"
    t0 = time.time()
    with jax.profiler.trace(outdir):
        outs = eng.generate(input_ids=prompts, sampling_params=sp)
    dt = time.time() - t0
    total = sum(len(o["output_ids"]) for o in outs)
    print(f"tok/s: {total/dt:.1f}", flush=True)

    from xprof.convert import raw_to_tool_data as rtd
    import gzip

    files = glob.glob(os.path.join(outdir, "**/*.xplane.pb"), recursive=True)
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    try:
        rows = json.loads(gzip.decompress(data).decode())
    except Exception:
        rows = json.loads(data.decode())
    cols = [c["id"] for c in rows[0]["cols"]]
    print("top device ops (total self us):")
    out = []
    for r in rows[0]["rows"]:
        dd = dict(zip(cols, [c.get("v") for c in r["c"]]))
        if dd.get("host_or_device") != "Device":
            continue
        t = float(dd.get("total_self_time") or 0)
        if t > 100:
            out.append((t, dd))
    for t, dd in sorted(out, key=lambda x: -x[0])[:20]:
        print(f"  {t:10.1f} us x{float(dd.get('occurrences') or 0):.0f} "
              f"bw={float(dd.get('measured_memory_bw') or 0):8.1f} "
              f"{str(dd.get('operation'))[:75]}")


if __name__ == "__main__":
    main()
