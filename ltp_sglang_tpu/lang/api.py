"""Frontend DSL: the "sglang" language surface.

Counterpart of python/sglang/api.py:23-283 + lang/ir.py + lang/interpreter.py,
reduced to the core primitives users actually compose: `@function`, `gen`,
`select`, and the chat-role wrappers. Programs run against a local Engine (the
RuntimeEndpoint analog is the HTTP client in lang/backend.py).

`select` is implemented with the native grammar engine: a regex alternation
over the choices constrains generation, so the model's own preference picks
the branch — no separate scoring pass needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Union


@dataclasses.dataclass
class Gen:
    name: Optional[str] = None
    max_tokens: int = 128
    stop: Optional[Union[str, List[str]]] = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    regex: Optional[str] = None
    json_schema: Optional[str] = None


@dataclasses.dataclass
class Select:
    name: Optional[str]
    choices: List[str]
    temperature: float = 0.0
    # "grammar" (TPU-native default: one constrained decode pass) or a
    # reference scoring method from lang/choices.py.
    choices_method: str = "grammar"


@dataclasses.dataclass
class Role:
    role: str
    parts: List[Any]


@dataclasses.dataclass
class Image:
    data: Any  # path / bytes / base64 / ndarray (multimodal/processor.py)


def gen(name: Optional[str] = None, max_tokens: int = 128, stop=None,
        temperature: float = 1.0, top_p: float = 1.0, top_k: int = -1,
        regex: Optional[str] = None, json_schema: Optional[str] = None) -> Gen:
    return Gen(name, max_tokens, stop, temperature, top_p, top_k, regex, json_schema)


def select(name: Optional[str] = None, choices: Optional[List[str]] = None,
           temperature: float = 0.0,
           choices_method: str = "grammar") -> Select:
    return Select(name, list(choices or []), temperature, choices_method)


def system(*parts) -> Role:
    return Role("system", list(parts))


def user(*parts) -> Role:
    return Role("user", list(parts))


def assistant(*parts) -> Role:
    return Role("assistant", list(parts))


def image(data) -> Image:
    """VLM image part: inserts the model's image placeholder and ships the
    pixels with the next gen() call (python/sglang/api.py sgl.image)."""
    return Image(data)


class ProgramState:
    """Accumulates text and captured variables while a program runs."""

    def __init__(self, backend):
        self.backend = backend
        self.text = ""
        self.vars: Dict[str, str] = {}
        self.messages: List[Dict[str, str]] = []
        self.images: List[Any] = []

    def __getitem__(self, name: str) -> str:
        return self.vars[name]

    def __iadd__(self, item):
        self.append(item)
        return self

    def append(self, item):
        if isinstance(item, str):
            self.text += item
        elif isinstance(item, Gen):
            self._run_gen(item)
        elif isinstance(item, Select):
            self._run_select(item)
        elif isinstance(item, Role):
            for part in item.parts:
                self.append(part)
        elif isinstance(item, Image):
            self.images.append(item.data)
            self.text += "<image>"
        else:
            raise TypeError(f"cannot append {type(item)} to program state")

    def _run_gen(self, g: Gen):
        sp = {
            "max_new_tokens": g.max_tokens,
            "temperature": g.temperature,
            "top_p": g.top_p,
            "top_k": g.top_k,
        }
        if g.stop:
            sp["stop"] = g.stop
        if g.regex:
            sp["regex"] = g.regex
        if g.json_schema:
            sp["json_schema"] = g.json_schema
        kwargs = {}
        if self.images:
            kwargs["image_data"] = list(self.images)
        out = self.backend.generate(prompt=self.text, sampling_params=sp,
                                    **kwargs)
        piece = out["text"]
        if g.name:
            self.vars[g.name] = piece
        self.text += piece

    def _run_select(self, s: Select):
        import re as _re

        if s.choices_method != "grammar":
            from ltp_sglang_tpu.lang.choices import select_by_logprobs

            res = select_by_logprobs(
                self.backend, self.text, s.choices, s.choices_method
            )
            if s.name:
                self.vars[s.name] = res["choice"]
            self.text += res["choice"]
            return
        if hasattr(self.backend, "select"):
            # Third-party backends (OpenAI/Anthropic) bring their own
            # selection — no grammar surface to constrain against.
            piece = self.backend.select(self.text, s.choices)
            if s.name:
                self.vars[s.name] = piece
            self.text += piece
            return

        pattern = "(?:" + "|".join(_re.escape(c) for c in s.choices) + ")"
        out = self.backend.generate(
            prompt=self.text,
            sampling_params={
                "max_new_tokens": 64,
                "temperature": s.temperature,
                "regex": pattern,
            },
        )
        piece = out["text"]
        if s.name:
            self.vars[s.name] = piece
        self.text += piece


    # ------------------------------------------------------------- fork/join
    def fork(self, n: int) -> List["ProgramState"]:
        """n child states sharing this prefix (interpreter.py fork): the
        engine's radix cache dedups the shared-prefix compute, so branches
        cost only their own continuations. Children run on the CALLER's
        schedule; run_forks() executes closures over them in parallel."""
        out = []
        for _ in range(n):
            child = ProgramState(self.backend)
            child.text = self.text
            child.vars = dict(self.vars)
            child.images = list(self.images)
            out.append(child)
        return out

    def run_forks(self, branches: List[Callable], max_workers: int = 8
                  ) -> List["ProgramState"]:
        """Fork once per branch closure and run them concurrently."""
        from concurrent.futures import ThreadPoolExecutor

        forks = self.fork(len(branches))
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(lambda bf: bf[1](bf[0]), zip(forks, branches)))
        return forks


class CompiledFunction:
    def __init__(self, fn: Callable):
        self.fn = fn

    def run(self, backend=None, **kwargs) -> ProgramState:
        state = ProgramState(backend)
        self.fn(state, **kwargs)
        return state

    # ----------------------------------------------------- trace / compile
    def trace(self, **kwargs):
        """Record the program's IR without touching the model (lang/tracer).
        kwargs name the program's arguments (values are ignored — they become
        placeholders). Raises ir.StopTracing for data-dependent programs."""
        from ltp_sglang_tpu.lang.tracer import trace as _trace

        return _trace(self.fn, list(kwargs.keys()))

    def compile(self, **kwargs):
        """Trace + compile (lang/compiler.CompiledProgram): dependency graph
        + shared-prefix extraction for radix-primed batch execution."""
        from ltp_sglang_tpu.lang.compiler import compile_func

        return compile_func(self.trace(**kwargs))

    def run_batch(self, args_list: List[Dict[str, Any]], backend=None,
                  max_workers: int = 16) -> List[ProgramState]:
        """Run the program over many argument dicts concurrently
        (python/sglang run_batch): threads overlap the per-program waits so
        the engine continuously batches across programs. Traceable programs
        go through the compiler (shared constant prefix primed once in the
        radix cache); data-dependent ones fall back to eager threads."""
        from concurrent.futures import ThreadPoolExecutor

        if args_list:
            from ltp_sglang_tpu.lang.ir import StopTracing

            try:
                prog = self.compile(**args_list[0])
            except (StopTracing, TypeError):
                prog = None
            if prog is not None:
                return prog.run_batch(
                    args_list, backend=backend, max_workers=max_workers
                )
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            return list(ex.map(
                lambda kw: self.run(backend=backend, **kw), args_list
            ))

    def __call__(self, state: ProgramState, **kwargs):
        return self.fn(state, **kwargs)


def function(fn: Callable) -> CompiledFunction:
    """`@function def prog(s, **args): s += ...` (python/sglang/api.py:23)."""
    return CompiledFunction(fn)
