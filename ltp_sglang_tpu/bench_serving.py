"""`python -m ltp_sglang_tpu.bench_serving` — online serving load generator.

Counterpart of python/sglang/bench_serving.py: sends concurrent /generate
requests at a target request rate and reports TTFT, ITL/TPOT, e2e latency,
and token throughput percentiles (metric definitions per the reference,
bench_serving.py:703-737).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp
import numpy as np


async def one_request(session, url, prompt_ids, output_len):
    t0 = time.perf_counter()
    ttft = None
    itls = []
    last = t0
    ntok = 0
    payload = {
        "input_ids": prompt_ids,
        "sampling_params": {
            "max_new_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        },
        "stream": True,
    }
    async with session.post(url + "/generate", json=payload) as resp:
        async for line in resp.content:
            line = line.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            now = time.perf_counter()
            body = json.loads(line[6:])
            n = len(body["output_ids"])
            if ttft is None:
                ttft = now - t0
            else:
                # One chunk may carry several tokens (decode windows).
                step = (now - last) / max(n - ntok, 1)
                itls.extend([step] * (n - ntok))
            ntok = n
            last = now
    return {"ttft": ttft, "itls": itls, "e2e": last - t0, "tokens": ntok}


async def run(args):
    rng = np.random.default_rng(0)
    url = f"http://{args.host}:{args.port}"
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=None)
    ) as session:
        # Discover vocab bound.
        async with session.get(url + "/get_server_info") as r:
            assert r.status == 200

        if args.warmup:
            # Run the SAME shape profile once unmeasured so every jit bucket
            # (extend B/E/C, decode windows per B) compiles before timing.
            wtasks = [
                asyncio.create_task(one_request(
                    session, url,
                    [int(x) for x in rng.integers(5, 1000, size=args.input_len)],
                    args.output_len,
                ))
                for _ in range(args.num_prompts)
            ]
            await asyncio.gather(*wtasks)
            async with session.post(url + "/flush_cache") as r:
                pass

        tasks = []
        t_start = time.perf_counter()
        for i in range(args.num_prompts):
            prompt = [int(x) for x in rng.integers(5, 1000, size=args.input_len)]
            tasks.append(
                asyncio.create_task(one_request(session, url, prompt, args.output_len))
            )
            if args.request_rate != float("inf"):
                await asyncio.sleep(rng.exponential(1.0 / args.request_rate))
        results = await asyncio.gather(*tasks)
        wall = time.perf_counter() - t_start

    ttfts = [r["ttft"] for r in results if r["ttft"] is not None]
    itls = [x for r in results for x in r["itls"]]
    e2es = [r["e2e"] for r in results]
    total_out = sum(r["tokens"] for r in results)
    total_in = args.num_prompts * args.input_len

    def pct(a, p):
        return float(np.percentile(a, p)) if a else float("nan")

    report = {
        "num_prompts": args.num_prompts,
        "request_rate": args.request_rate,
        "duration_s": round(wall, 2),
        "input_throughput_tok_s": round(total_in / wall, 1),
        "output_throughput_tok_s": round(total_out / wall, 1),
        "mean_ttft_s": round(float(np.mean(ttfts)), 4) if ttfts else None,
        "p50_ttft_s": round(pct(ttfts, 50), 4),
        "p99_ttft_s": round(pct(ttfts, 99), 4),
        "mean_itl_s": round(float(np.mean(itls)), 5) if itls else None,
        "p50_itl_s": round(pct(itls, 50), 5),
        "p99_itl_s": round(pct(itls, 99), 5),
        "mean_e2e_s": round(float(np.mean(e2es)), 3),
    }
    print(json.dumps(report, indent=2))


def run_bench_against_engine(model_path, prompts, gen_len, page_size, window,
                             reps=2, max_total_tokens=8192,
                             max_running_requests=64, port=0):
    """Launch the aiohttp server in-process over a dummy-weights engine and
    drive all `prompts` concurrently with streaming on; returns the best-rep
    OUTPUT tok/s over the whole load (incl. prefill time — the serving-path
    number, reference bench_serving output_throughput). Used by bench.py for
    the http_tok_per_s field."""
    import threading

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer
    from aiohttp import web

    eng = Engine(ServerArgs(
        model_path=model_path, load_format="dummy", dtype="bfloat16",
        page_size=page_size, decode_window_size=window,
        max_total_tokens=max_total_tokens,
        max_running_requests=max_running_requests,
        schedule_policy="fcfs",
    ))
    server = HttpServer(eng)
    server.loop_thread.start()

    async def drive():
        runner = web.AppRunner(server.app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", port)
        await site.start()
        real_port = runner.addresses[0][1]
        url = f"http://127.0.0.1:{real_port}"
        best = 0.0
        async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None)
        ) as session:
            for rep in range(reps + 1):  # rep 0 = unmeasured warmup
                t0 = time.perf_counter()
                tasks = [
                    asyncio.create_task(one_request(session, url, p, gen_len))
                    for p in prompts
                ]
                results = await asyncio.gather(*tasks)
                wall = time.perf_counter() - t0
                async with session.post(url + "/flush_cache"):
                    pass
                if rep == 0:
                    continue
                total_out = sum(r["tokens"] for r in results)
                best = max(best, total_out / wall)
        await runner.cleanup()
        return best

    try:
        return asyncio.run(drive())
    finally:
        server.loop_thread.stop()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=30000)
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--request-rate", type=float, default=float("inf"))
    p.add_argument("--warmup", action="store_true",
                   help="run the same load once unmeasured (compile buckets)")
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
