"""`python -m ltp_sglang_tpu.bench_one_batch` — single static batch latency.

Counterpart of python/sglang/bench_one_batch.py: measures prefill latency,
decode latency, and tok/s for given (batch, input-len, output-len) without a
server.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--load-format", default="auto")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch-size", type=int, nargs="*", default=[1])
    p.add_argument("--input-len", type=int, nargs="*", default=[128])
    p.add_argument("--output-len", type=int, nargs="*", default=[32])
    p.add_argument("--max-total-tokens", type=int, default=None)
    p.add_argument("--decode-window-size", type=int, default=8)
    p.add_argument("--json", action="store_true", help="print JSON lines")
    args = p.parse_args()

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    engine = Engine(
        ServerArgs(
            model_path=args.model_path,
            load_format=args.load_format,
            dtype=args.dtype,
            max_total_tokens=args.max_total_tokens,
            decode_window_size=args.decode_window_size,
        )
    )
    vocab = engine.model_config.vocab_size
    rng = np.random.default_rng(0)

    for bs in args.batch_size:
        for il in args.input_len:
            for ol in args.output_len:
                prompts = [
                    [int(x) for x in rng.integers(5, vocab - 10, size=il)]
                    for _ in range(bs)
                ]
                sp = {"max_new_tokens": ol, "temperature": 0.0, "ignore_eos": True}
                # Warmup (compile)
                engine.generate(
                    input_ids=prompts, sampling_params=dict(sp, max_new_tokens=min(8, ol))
                )
                engine.flush_cache()

                # Prefill latency: 1 output token.
                t0 = time.time()
                engine.generate(
                    input_ids=prompts, sampling_params=dict(sp, max_new_tokens=1)
                )
                prefill_latency = time.time() - t0
                engine.flush_cache()

                # Full run for decode throughput.
                t0 = time.time()
                engine.generate(input_ids=prompts, sampling_params=sp)
                total = time.time() - t0
                engine.flush_cache()

                decode_latency = total - prefill_latency
                decode_tokens = bs * (ol - 1)
                rec = {
                    "batch_size": bs,
                    "input_len": il,
                    "output_len": ol,
                    "prefill_latency_s": round(prefill_latency, 4),
                    "prefill_tok_per_s": round(bs * il / max(prefill_latency, 1e-9), 1),
                    "decode_median_latency_s": round(
                        decode_latency / max(ol - 1, 1), 5
                    ),
                    "decode_tok_per_s": round(
                        decode_tokens / max(decode_latency, 1e-9), 1
                    ),
                    "total_s": round(total, 3),
                }
                if args.json:
                    print(json.dumps(rec))
                else:
                    print(
                        f"bs={bs} in={il} out={ol}: prefill {rec['prefill_latency_s']}s "
                        f"({rec['prefill_tok_per_s']} tok/s), decode "
                        f"{rec['decode_tok_per_s']} tok/s"
                    )


if __name__ == "__main__":
    main()
