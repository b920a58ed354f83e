"""Tiered test-suite runner (reference test/srt/run_suite.py:14-120).

Each suite lists (file, budget_seconds) measured on the dev box; the runner
executes files one pytest process at a time (isolated engines / jit caches),
enforces per-file timeouts, and prints a summary. CI intent:

    python tests/run_suite.py --suite fast        # < 1 min, host logic only
    python tests/run_suite.py --suite per-commit  # fast + engine core, ~3 min
    python tests/run_suite.py --suite nightly     # everything

Exit code is non-zero if any file fails or times out.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# (file, measured_seconds) — budgets ~4x the measured wall time.
FAST = [
    ("test_aux_utils.py", 1),
    ("test_parsers.py", 1),
    ("test_radix_cache.py", 1),
    ("test_router_core.py", 1),
    ("test_quant_int4.py", 2),
    ("test_sampling.py", 9),
    ("test_radix_cpp.py", 12),
]
ENGINE = [
    ("test_engine_e2e.py", 19),
    ("test_hf_parity.py", 17),
    ("test_structured_output.py", 18),
    ("test_http_server.py", 11),
    ("test_window_features.py", 19),
    ("test_watchdog_and_chat.py", 14),
]
MODELS = [
    ("test_models_parity.py", 58),
    ("test_quant_fp8.py", 25),
    ("test_quant_int8.py", 20),
    ("test_quant_e2e.py", 21),
    ("test_gguf.py", 16),
    ("test_multimodal.py", 20),
    ("test_embedding.py", 18),
    ("test_swa_ring.py", 20),
    ("test_swa_radix.py", 27),
]
PARALLEL = [
    ("test_multichip.py", 67),
    ("test_dp_attention.py", 18),
    ("test_pipeline_parallel.py", 20),
    ("test_eplb.py", 55),
]
AUX = [
    ("test_paged_attention.py", 18),
    ("test_extend_kernel.py", 17),
    ("test_speculative.py", 28),
    ("test_eagle.py", 28),
    ("test_lora.py", 23),
    ("test_hicache.py", 20),
    ("test_checkpoint.py", 17),
    ("test_determinism.py", 19),
    ("test_disaggregation.py", 17),
    ("test_pd_socket.py", 25),
    ("test_pd_http.py", 17),
    ("test_eval.py", 15),
    ("test_router_and_lang.py", 16),
    ("test_weight_sync.py", 42),
    ("test_double_sparsity.py", 25),
    ("test_compressed_tensors.py", 20),
    ("test_lang_compiler.py", 15),
    ("test_quant_moe.py", 30),
    ("test_qwen_vl.py", 30),
    ("test_gemma3_vlm.py", 30),
    ("test_service_discovery.py", 10),
    ("test_qwen2_audio.py", 20),
    ("test_internvl.py", 15),
    ("test_zoo_tail.py", 40),
    ("test_llama4_vlm.py", 20),
    ("test_llavavid.py", 20),
    ("test_pixtral.py", 15),
    ("test_reward_heads.py", 15),
    ("test_idefics2.py", 15),
]

SUITES = {
    "fast": FAST,
    "engine": ENGINE,
    "models": MODELS,
    "parallel": PARALLEL,
    "aux": AUX,
    "per-commit": FAST + ENGINE,
    "nightly": FAST + ENGINE + MODELS + PARALLEL + AUX,
}


def check_complete():
    """Every tests/test_*.py file must be assigned to a tier — a new test
    file that falls outside CI is exactly how red tests ship (reference
    discipline: test/srt/run_suite.py enumerates every file)."""
    import glob

    listed = {f for f, _ in SUITES["nightly"]}
    on_disk = {os.path.basename(p)
               for p in glob.glob(os.path.join(HERE, "test_*.py"))}
    missing = sorted(on_disk - listed)
    stale = sorted(listed - on_disk)
    if missing or stale:
        raise SystemExit(
            f"run_suite.py tier assignment out of sync: "
            f"unassigned={missing} stale={stale}"
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="per-commit", choices=sorted(SUITES))
    p.add_argument("--timeout-scale", type=float, default=4.0,
                   help="per-file timeout = scale x measured seconds (+30s)")
    p.add_argument("--continue-on-failure", action="store_true")
    args = p.parse_args()

    check_complete()
    entries = SUITES[args.suite]
    print(f"suite {args.suite}: {len(entries)} files, "
          f"~{sum(s for _, s in entries)}s measured")
    failed = []
    t_suite = time.time()
    for f, est in entries:
        budget = int(est * args.timeout_scale) + 30
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", os.path.join(HERE, f),
                 "-q", "-x", "--no-header", "-p", "no:cacheprovider"],
                timeout=budget, capture_output=True, text=True,
            )
            ok = r.returncode == 0
            tail = (r.stdout or r.stderr).strip().splitlines()
            tail = tail[-1] if tail else ""
        except subprocess.TimeoutExpired:
            ok, tail = False, f"TIMEOUT after {budget}s"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {f:32s} {dt:6.1f}s  {tail}")
        if not ok:
            failed.append(f)
            if not args.continue_on_failure:
                break
    print(f"suite {args.suite}: {len(entries) - len(failed)}/{len(entries)} "
          f"passed in {time.time() - t_suite:.0f}s")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
