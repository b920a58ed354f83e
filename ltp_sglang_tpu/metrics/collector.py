"""Prometheus metrics.

Counterpart of metrics/collector.py in the reference (SchedulerMetricsCollector
gauges :151-308 and TokenizerMetricsCollector counters/histograms :309-552),
collapsed into one collector since tokenizer+scheduler live in one process.
Exposed at /metrics by the HTTP server.
"""

from __future__ import annotations

import time
from typing import Optional

try:
    from prometheus_client import (
        CollectorRegistry,
        Counter,
        Gauge,
        Histogram,
        generate_latest,
    )

    HAS_PROMETHEUS = True
except Exception:  # pragma: no cover
    HAS_PROMETHEUS = False


class SchedulerMetricsCollector:
    def __init__(self, model_name: str = "model"):
        if not HAS_PROMETHEUS:
            self.registry = None
            return
        self.registry = CollectorRegistry()
        labels = {"model_name": model_name}
        self.labels = labels

        self.num_running_reqs = Gauge(
            "ltp_sglang_tpu_num_running_reqs", "Running requests",
            ["model_name"], registry=self.registry,
        )
        self.num_waiting_reqs = Gauge(
            "ltp_sglang_tpu_num_waiting_reqs", "Queued requests",
            ["model_name"], registry=self.registry,
        )
        self.token_usage = Gauge(
            "ltp_sglang_tpu_token_usage", "KV pool token usage fraction",
            ["model_name"], registry=self.registry,
        )
        self.cache_hit_rate = Gauge(
            "ltp_sglang_tpu_cache_hit_rate", "Prefix cache hit rate",
            ["model_name"], registry=self.registry,
        )
        self.gen_throughput = Gauge(
            "ltp_sglang_tpu_gen_throughput", "Decode tokens/s (rolling)",
            ["model_name"], registry=self.registry,
        )
        self.num_retracted = Counter(
            "ltp_sglang_tpu_num_retracted_reqs", "Retracted requests",
            ["model_name"], registry=self.registry,
        )
        self.prompt_tokens_total = Counter(
            "ltp_sglang_tpu_prompt_tokens_total", "Prefill tokens",
            ["model_name"], registry=self.registry,
        )
        self.generation_tokens_total = Counter(
            "ltp_sglang_tpu_generation_tokens_total", "Generated tokens",
            ["model_name"], registry=self.registry,
        )
        self.ttft = Histogram(
            "ltp_sglang_tpu_time_to_first_token_seconds", "TTFT",
            ["model_name"], registry=self.registry,
            buckets=[0.1, 0.25, 0.5, 0.75, 1, 2, 5, 10, 30, 60],
        )
        self.e2e_latency = Histogram(
            "ltp_sglang_tpu_e2e_request_latency_seconds", "E2E latency",
            ["model_name"], registry=self.registry,
            buckets=[0.3, 0.5, 1, 2, 5, 10, 30, 60, 120, 300],
        )
        self.itl = Histogram(
            "ltp_sglang_tpu_inter_token_latency_seconds", "ITL",
            ["model_name"], registry=self.registry,
            buckets=[0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.5, 1],
        )

        self._last_gen_count = 0
        self._last_gen_time = time.time()

    def observe_request(self, req):
        if self.registry is None:
            return
        m = self.labels
        self.prompt_tokens_total.labels(**m).inc(len(req.origin_input_ids))
        self.generation_tokens_total.labels(**m).inc(len(req.output_ids))
        if req.first_token_time and req.queued_time:
            self.ttft.labels(**m).observe(req.first_token_time - req.queued_time)
        if req.finish_time and req.queued_time:
            self.e2e_latency.labels(**m).observe(req.finish_time - req.queued_time)
            n = len(req.output_ids)
            if n > 1 and req.first_token_time:
                self.itl.labels(**m).observe(
                    (req.finish_time - req.first_token_time) / (n - 1)
                )

    def update_state(self, scheduler):
        if self.registry is None:
            return
        m = self.labels
        running = (
            scheduler.running_batch.batch_size() if scheduler.running_batch else 0
        )
        self.num_running_reqs.labels(**m).set(running)
        self.num_waiting_reqs.labels(**m).set(len(scheduler.waiting_queue))
        total = scheduler.runner.max_total_num_tokens
        used = total - scheduler.token_to_kv_pool_allocator.available_size()
        self.token_usage.labels(**m).set(used / max(total, 1))
        now = time.time()
        dt = now - self._last_gen_time
        if dt >= 1.0:
            dn = scheduler.num_generated_tokens - self._last_gen_count
            self.gen_throughput.labels(**m).set(dn / dt)
            self._last_gen_count = scheduler.num_generated_tokens
            self._last_gen_time = now

    def render(self) -> bytes:
        if self.registry is None:
            return b"# prometheus_client unavailable\n"
        return generate_latest(self.registry)
