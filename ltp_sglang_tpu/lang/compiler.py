"""Compile traced programs for batch execution.

Counterpart of python/sglang/lang/compiler.py (compile_func / CompGraphNode):
builds a dependency graph over the IR — each gen/select depends on every
node that contributes to its prompt prefix, and on the variables it splices —
then executes batches with the one optimization that actually matters on a
radix-cached serving engine: the longest CONSTANT prefix (text before the
first argument splice or generation) is primed once, so the engine computes
its KV a single time and every program in the batch extends from the cached
span instead of re-prefilling it N times.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional

from ltp_sglang_tpu.lang.interpreter import run_program
from ltp_sglang_tpu.lang.ir import (
    ArgRef,
    ConstantText,
    GenOp,
    SelectOp,
    TracedProgram,
    VarRef,
)


class GraphNode:
    def __init__(self, idx: int, node: Any, deps: List[int]):
        self.idx = idx
        self.node = node
        self.deps = deps  # indices of graph nodes this one waits on

    def __repr__(self):
        kind = type(self.node).__name__
        return f"<{self.idx}:{kind} deps={self.deps}>"


class CompiledProgram:
    def __init__(self, traced: TracedProgram):
        self.traced = traced
        self.graph = self._build_graph(traced)
        self.shared_prefix = self._constant_prefix(traced)

    # ------------------------------------------------------------- analysis
    @staticmethod
    def _build_graph(traced: TracedProgram) -> List[GraphNode]:
        """Dependency graph: a generation depends on the previous generation
        in text order (its prompt contains that output) and on any variable
        it splices (compiler.py build_graph)."""
        nodes: List[GraphNode] = []
        last_op: Optional[int] = None
        producer: Dict[str, int] = {}
        for i, n in enumerate(traced.nodes):
            deps: List[int] = []
            if isinstance(n, (GenOp, SelectOp)):
                if last_op is not None:
                    deps.append(last_op)
                nodes.append(GraphNode(i, n, deps))
                last_op = i
                if n.spec.name:
                    producer[n.spec.name] = i
            elif isinstance(n, VarRef):
                # Textual splice of a produced variable: subsequent ops
                # already depend transitively via last_op; record for
                # print_graph fidelity.
                nodes.append(GraphNode(i, n, [producer.get(n.name, -1)]))
        return nodes

    @staticmethod
    def _constant_prefix(traced: TracedProgram) -> str:
        parts = []
        for n in traced.nodes:
            if isinstance(n, ConstantText):
                parts.append(n.text)
            else:
                break
        return "".join(parts)

    def topological_sort(self) -> List[GraphNode]:
        # The trace is linear, so text order IS a topological order.
        return list(self.graph)

    def print_graph(self) -> str:
        return "\n".join(
            [self.traced.pretty(), "graph:"] + [f"  {g}" for g in self.graph]
        )

    # ------------------------------------------------------------ execution
    def run(self, backend=None, **kwargs):
        return run_program(self.traced, backend, kwargs)

    def run_batch(
        self,
        args_list: List[Dict[str, Any]],
        backend=None,
        max_workers: int = 16,
    ):
        """Batch execution with shared-prefix priming: one cheap request pins
        the constant prefix in the radix cache, then all programs run
        concurrently and extend from it (compiler.py run_batch)."""
        if self.shared_prefix and len(args_list) > 1 and backend is not None:
            try:
                backend.generate(
                    prompt=self.shared_prefix,
                    sampling_params={"max_new_tokens": 1, "temperature": 0.0},
                )
            except Exception:
                pass  # priming is an optimization, never a requirement
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            return list(
                ex.map(lambda kw: run_program(self.traced, backend, kw), args_list)
            )


def compile_func(traced: TracedProgram) -> CompiledProgram:
    return CompiledProgram(traced)
