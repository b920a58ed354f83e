"""DSL intermediate representation.

Counterpart of python/sglang/lang/ir.py (SglExpr tree): a traced @function
becomes a flat list of IR nodes — constant text, argument/variable splices,
gen/select/image ops — that the interpreter executes against any backend and
the compiler analyzes (shared-prefix extraction, dependency graph).

The tracer (lang/tracer.py) produces these nodes by running the user's
Python function once with placeholder arguments; f-string interpolation of a
placeholder embeds a sentinel token that `split_text` lifts back into ArgRef
/ VarRef nodes, so ordinary `f"answer: {s['x']}"` style traces cleanly
instead of failing like the reference's SglVariable repr does.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, List, Optional

from ltp_sglang_tpu.lang.api import Gen, Select

_SENTINEL = re.compile(r"⟦(arg|var):([A-Za-z_][A-Za-z0-9_]*)⟧")


def arg_token(name: str) -> str:
    return f"⟦arg:{name}⟧"


def var_token(name: str) -> str:
    return f"⟦var:{name}⟧"


@dataclasses.dataclass
class ConstantText:
    text: str


@dataclasses.dataclass
class ArgRef:
    """Splice of a program argument (SglArgument, ir.py:400)."""

    name: str


@dataclasses.dataclass
class VarRef:
    """Splice of a previously captured gen/select output (SglVariable)."""

    name: str


@dataclasses.dataclass
class GenOp:
    spec: Gen


@dataclasses.dataclass
class SelectOp:
    spec: Select


@dataclasses.dataclass
class RoleBegin:
    role: str


@dataclasses.dataclass
class RoleEnd:
    role: str


@dataclasses.dataclass
class ImageOp:
    data: Any  # constant image, or ArgRef for argument-supplied images


Node = Any  # union of the above


def split_text(text: str) -> List[Node]:
    """Lift sentinel tokens embedded by f-string interpolation back into
    ArgRef / VarRef nodes."""
    out: List[Node] = []
    pos = 0
    for m in _SENTINEL.finditer(text):
        if m.start() > pos:
            out.append(ConstantText(text[pos : m.start()]))
        kind, name = m.group(1), m.group(2)
        out.append(ArgRef(name) if kind == "arg" else VarRef(name))
        pos = m.end()
    if pos < len(text):
        out.append(ConstantText(text[pos:]))
    return out


@dataclasses.dataclass
class TracedProgram:
    """A traced @function: IR nodes + the argument names it consumes."""

    name: str
    arg_names: List[str]
    nodes: List[Node]

    def pretty(self) -> str:
        lines = [f"program {self.name}({', '.join(self.arg_names)}):"]
        for n in self.nodes:
            if isinstance(n, ConstantText):
                lines.append(f"  text  {n.text!r}")
            elif isinstance(n, ArgRef):
                lines.append(f"  arg   {n.name}")
            elif isinstance(n, VarRef):
                lines.append(f"  var   {n.name}")
            elif isinstance(n, GenOp):
                lines.append(f"  gen   name={n.spec.name} max={n.spec.max_tokens}")
            elif isinstance(n, SelectOp):
                lines.append(f"  select name={n.spec.name} {n.spec.choices}")
            elif isinstance(n, RoleBegin):
                lines.append(f"  role+ {n.role}")
            elif isinstance(n, RoleEnd):
                lines.append(f"  role- {n.role}")
            elif isinstance(n, ImageOp):
                lines.append("  image")
        return "\n".join(lines)


class StopTracing(Exception):
    """Raised when the program's control flow depends on a generated value —
    tracing cannot proceed; callers fall back to eager interpretation
    (reference lang/tracer.py:25)."""
