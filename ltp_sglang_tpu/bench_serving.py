"""`python -m ltp_sglang_tpu.bench_serving` — online serving load generator.

Counterpart of python/sglang/bench_serving.py: sends concurrent /generate
requests at a target request rate (Poisson arrivals) and reports the
reference metric set (bench_serving.py:703-737): request/input/output
throughput, mean/median/std/p90/p99 TTFT, TPOT, ITL, e2e latency, measured
concurrency, and GOODPUT against --goodput SLOs. Supports request-rate
sweeps (--request-rate-sweep) and dataset sampling: fixed lengths,
`random` (uniform in [ratio*len, len], reference --random-range-ratio) or
`synthetic-sharegpt` (lognormal lengths shaped like the ShareGPT corpus —
the dataset file itself is not redistributable and this image has no
egress, so the distribution is matched instead: median ~220 input /
~180 output tokens with a long tail).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp
import numpy as np


def sample_requests(args, rng):
    """[(input_len, output_len)] per request, per --dataset."""
    n = args.num_prompts
    if args.dataset == "random":
        r = args.random_range_ratio
        ins = rng.integers(
            max(int(args.input_len * r), 1), args.input_len + 1, size=n
        )
        outs = rng.integers(
            max(int(args.output_len * r), 1), args.output_len + 1, size=n
        )
    elif args.dataset == "synthetic-sharegpt":
        # Lognormal fit to the ShareGPT length histogram used by the
        # reference sampler (bench_serving sample_sharegpt_requests):
        # median ~220 in, ~180 out, p99 ~2k, clipped to [4, 4096].
        ins = np.clip(rng.lognormal(5.4, 0.9, size=n), 4, 4096).astype(int)
        outs = np.clip(rng.lognormal(5.2, 0.9, size=n), 4, 2048).astype(int)
    else:  # fixed
        ins = np.full((n,), args.input_len, dtype=int)
        outs = np.full((n,), args.output_len, dtype=int)
    return [(int(i), int(o)) for i, o in zip(ins, outs)]


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


def _parse_goodput(spec):
    """'ttft:200,tpot:50' (milliseconds) -> {'ttft': 0.2, 'tpot': 0.05}."""
    if not spec:
        return None
    out = {}
    for part in spec.split(","):
        k, v = part.split(":")
        if k not in ("ttft", "tpot", "e2e"):
            raise ValueError(f"unknown goodput SLO {k!r}")
        out[k] = float(v) / 1000.0
    return out


def summarize(results, wall, total_in, slos=None):
    ttfts = [r["ttft"] for r in results if r["ttft"] is not None]
    itls = [x for r in results for x in r["itls"]]
    e2es = [r["e2e"] for r in results]
    tpots = [
        (r["e2e"] - r["ttft"]) / (r["tokens"] - 1)
        for r in results
        if r["ttft"] is not None and r["tokens"] > 1
    ]
    total_out = sum(r["tokens"] for r in results)

    def stats(a, nd):
        if not a:
            return {}
        a = np.asarray(a, dtype=np.float64)
        return {
            "mean": round(float(a.mean()), nd),
            "median": round(float(np.percentile(a, 50)), nd),
            "std": round(float(a.std()), nd),
            "p90": round(float(np.percentile(a, 90)), nd),
            "p99": round(float(np.percentile(a, 99)), nd),
        }

    report = {
        "completed": len(results),
        "duration_s": round(wall, 2),
        "total_input_tokens": total_in,
        "total_output_tokens": total_out,
        "request_throughput_req_s": round(len(results) / wall, 3),
        "input_throughput_tok_s": round(total_in / wall, 1),
        "output_throughput_tok_s": round(total_out / wall, 1),
        "total_throughput_tok_s": round((total_in + total_out) / wall, 1),
        # Mean number of requests in flight (Little's law numerator).
        "measured_concurrency": round(sum(e2es) / wall, 2),
        "ttft_s": stats(ttfts, 4),
        "tpot_s": stats(tpots, 5),
        "itl_s": stats(itls, 5),
        "e2e_s": stats(e2es, 3),
    }
    if slos:
        good = 0
        for r in results:
            if r["ttft"] is None:
                continue
            tpot = (
                (r["e2e"] - r["ttft"]) / (r["tokens"] - 1)
                if r["tokens"] > 1
                else 0.0
            )
            ok = (
                ("ttft" not in slos or r["ttft"] <= slos["ttft"])
                and ("tpot" not in slos or tpot <= slos["tpot"])
                and ("e2e" not in slos or r["e2e"] <= slos["e2e"])
            )
            good += ok
        report["good_completed"] = good
        report["goodput_req_s"] = round(good / wall, 3)
        report["goodput_slo"] = {k: round(v * 1000, 1) for k, v in slos.items()}
    return report


async def run_one_rate(session, url, args, rate, rng, reqs):
    tasks = []
    t_start = time.perf_counter()
    for in_len, out_len in reqs:
        prompt = [int(x) for x in rng.integers(5, 1000, size=in_len)]
        tasks.append(
            asyncio.create_task(one_request(session, url, prompt, out_len))
        )
        if rate != float("inf"):
            await asyncio.sleep(rng.exponential(1.0 / rate))
    results = await asyncio.gather(*tasks)
    wall = time.perf_counter() - t_start
    total_in = sum(i for i, _ in reqs)
    report = summarize(
        results, wall, total_in, _parse_goodput(args.goodput)
    )
    report["request_rate"] = rate
    report["dataset"] = args.dataset
    return report


async def run(args):
    rng = np.random.default_rng(0)
    url = f"http://{args.host}:{args.port}"
    rates = (
        [
            float("inf") if r.strip() in ("inf", "") else float(r)
            for r in args.request_rate_sweep.split(",")
        ]
        if args.request_rate_sweep
        else [args.request_rate]
    )
    reqs = sample_requests(args, rng)
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=None)
    ) as session:
        async with session.get(url + "/get_server_info") as r:
            assert r.status == 200

        if args.warmup:
            # Run the SAME shape profile once unmeasured so every jit bucket
            # (extend B/E/C, decode windows per B) compiles before timing.
            wtasks = [
                asyncio.create_task(one_request(
                    session, url,
                    [int(x) for x in rng.integers(5, 1000, size=i)], o,
                ))
                for i, o in reqs
            ]
            await asyncio.gather(*wtasks)
            async with session.post(url + "/flush_cache"):
                pass

        reports = []
        for rate in rates:
            rep = await run_one_rate(session, url, args, rate, rng, reqs)
            reports.append(rep)
            print(json.dumps(rep, indent=None if len(rates) > 1 else 2))
            async with session.post(url + "/flush_cache"):
                pass
    if len(rates) > 1:
        print(json.dumps({
            "sweep": [
                {
                    "request_rate": r["request_rate"],
                    "output_tok_s": r["output_throughput_tok_s"],
                    "p99_ttft_s": r["ttft_s"].get("p99"),
                    "p99_itl_s": r["itl_s"].get("p99"),
                    **(
                        {"goodput_req_s": r["goodput_req_s"]}
                        if "goodput_req_s" in r
                        else {}
                    ),
                }
                for r in reports
            ]
        }, indent=2))


def run_bench_against_engine(model_path, prompts, gen_len, page_size, window,
                             reps=2, max_total_tokens=8192,
                             max_running_requests=64, port=0):
    """Launch the aiohttp server in-process over a dummy-weights engine and
    drive all `prompts` concurrently with streaming on. Returns a dict:
    `total` = best-rep output tok/s over the whole load (incl. prefill —
    the serving-path number, reference bench_serving output_throughput) and
    `decode` = best-rep DECODE-ONLY tok/s via the same two-point prefill
    subtraction the engine bench uses (a max_new_tokens=1 pass measures
    prefill+overhead wall; the surplus tokens over the surplus wall is the
    decode rate), making engine-vs-http directly comparable (VERDICT r4
    serving-tax decomposition). Used by bench.py."""
    from aiohttp import web

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer

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
        best_total = 0.0
        best_decode = 0.0
        async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None)
        ) as session:

            async def one_pass(out_len):
                t0 = time.perf_counter()
                tasks = [
                    asyncio.create_task(one_request(session, url, p, out_len))
                    for p in prompts
                ]
                results = await asyncio.gather(*tasks)
                wall = time.perf_counter() - t0
                async with session.post(url + "/flush_cache"):
                    pass
                return sum(r["tokens"] for r in results), wall

            for rep in range(reps + 1):  # rep 0 = unmeasured warmup
                n1, t1 = await one_pass(1)
                total_out, wall = await one_pass(gen_len)
                if rep == 0:
                    continue
                best_total = max(best_total, total_out / wall)
                best_decode = max(
                    best_decode, (total_out - n1) / max(wall - t1, 1e-9)
                )
        await runner.cleanup()
        return {"total": best_total, "decode": best_decode}

    try:
        return asyncio.run(drive())
    finally:
        server.loop_thread.stop()
        # Free the engine's device memory (params + KV + compiled steps):
        # later bench sections build their own engines on the same chip.
        eng.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=30000)
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--request-rate", type=float, default=float("inf"))
    p.add_argument("--request-rate-sweep", default=None,
                   help="comma list, e.g. '1,2,4,inf' — one report per rate")
    p.add_argument("--dataset", default="fixed",
                   choices=["fixed", "random", "synthetic-sharegpt"])
    p.add_argument("--random-range-ratio", type=float, default=0.5,
                   help="random dataset: lengths uniform in [r*len, len]")
    p.add_argument("--goodput", default=None,
                   help="SLOs in ms, e.g. 'ttft:200,tpot:50' (also e2e:)")
    p.add_argument("--warmup", action="store_true",
                   help="run the same load once unmeasured (compile buckets)")
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
