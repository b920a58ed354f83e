"""Trace a @function into IR without running the model.

Counterpart of python/sglang/lang/tracer.py (TracerProgramState): the user's
Python function runs once against a TracerState whose `+=` RECORDS nodes
instead of calling the backend. Arguments and captured variables become lazy
string proxies; interpolating one into an f-string embeds a sentinel the IR
splitter lifts back into ArgRef/VarRef nodes, while any data-dependent use
(comparison, branching, len, iteration) raises StopTracing and the caller
falls back to eager interpretation.
"""

from __future__ import annotations

from typing import Dict, List

from ltp_sglang_tpu.lang import api
from ltp_sglang_tpu.lang.ir import (
    ArgRef,
    ConstantText,
    GenOp,
    ImageOp,
    Node,
    RoleBegin,
    RoleEnd,
    SelectOp,
    StopTracing,
    TracedProgram,
    VarRef,
    arg_token,
    split_text,
    var_token,
)


class LazyStr(str):
    """A string-valued placeholder: formatting embeds a sentinel; reading the
    value (comparisons, truthiness, length, iteration) stops tracing."""

    _token = ""

    def __new__(cls, token: str):
        obj = super().__new__(cls, token)
        obj._token = token
        return obj

    def _stop(self, *_a, **_k):
        raise StopTracing(
            "program control flow depends on a generated value; "
            "run it eagerly instead"
        )

    __eq__ = __ne__ = __lt__ = __le__ = __gt__ = __ge__ = _stop
    __bool__ = __len__ = __iter__ = __contains__ = _stop
    __hash__ = None  # type: ignore[assignment]

    def __add__(self, other):
        return str.__str__(self) + other

    def __radd__(self, other):
        return other + str.__str__(self)


class TracerState:
    """Drop-in for ProgramState during tracing: records IR nodes."""

    def __init__(self, arg_names: List[str]):
        self.nodes: List[Node] = []
        self.arg_names = list(arg_names)
        self._var_names: Dict[str, bool] = {}

    # -- the ProgramState surface the user's function touches -------------
    def __iadd__(self, item):
        self.append(item)
        return self

    def __getitem__(self, name: str) -> str:
        if name not in self._var_names:
            raise StopTracing(f"read of variable {name!r} before it is generated")
        return LazyStr(var_token(name))

    def append(self, item):
        if isinstance(item, LazyStr):
            self.nodes.extend(split_text(str.__str__(item)))
        elif isinstance(item, str):
            self.nodes.extend(split_text(item))
        elif isinstance(item, api.Gen):
            if item.name:
                self._var_names[item.name] = True
            self.nodes.append(GenOp(item))
        elif isinstance(item, api.Select):
            if item.name:
                self._var_names[item.name] = True
            self.nodes.append(SelectOp(item))
        elif isinstance(item, api.Role):
            self.nodes.append(RoleBegin(item.role))
            for part in item.parts:
                self.append(part)
            self.nodes.append(RoleEnd(item.role))
        elif isinstance(item, api.Image):
            data = item.data
            if isinstance(data, LazyStr):
                refs = split_text(str.__str__(data))
                if len(refs) == 1 and isinstance(refs[0], ArgRef):
                    data = refs[0]
                else:
                    raise StopTracing("image data derived from a generated value")
            self.nodes.append(ImageOp(data))
        else:
            raise TypeError(f"cannot append {type(item)} to program state")

    def fork(self, n: int):
        raise StopTracing("fork() is dynamic; run the program eagerly")

    def run_forks(self, branches, max_workers: int = 8):
        raise StopTracing("fork() is dynamic; run the program eagerly")


def trace(fn, arg_names: List[str]) -> TracedProgram:
    """Run `fn(state, **placeholder_args)` once, recording IR. Raises
    StopTracing when the program is data-dependent."""
    state = TracerState(arg_names)
    placeholders = {name: LazyStr(arg_token(name)) for name in arg_names}
    fn(state, **placeholders)
    # Merge adjacent constants (keeps the compiler's prefix analysis simple).
    merged: List[Node] = []
    for n in state.nodes:
        if (
            isinstance(n, ConstantText)
            and merged
            and isinstance(merged[-1], ConstantText)
        ):
            merged[-1] = ConstantText(merged[-1].text + n.text)
        else:
            merged.append(n)
    return TracedProgram(
        name=getattr(fn, "__name__", "program"),
        arg_names=list(arg_names),
        nodes=merged,
    )
