"""Execute a TracedProgram against a backend.

Counterpart of python/sglang/lang/interpreter.py (StreamExecutor), reduced to
the synchronous core: walk the IR, splice arguments/variables into the
running text, and delegate gen/select to the same ProgramState machinery the
eager path uses — one execution engine, two front doors.
"""

from __future__ import annotations

from typing import Any, Dict

from ltp_sglang_tpu.lang.api import ProgramState
from ltp_sglang_tpu.lang.ir import (
    ArgRef,
    ConstantText,
    GenOp,
    ImageOp,
    RoleBegin,
    RoleEnd,
    SelectOp,
    TracedProgram,
    VarRef,
)


def run_program(
    prog: TracedProgram,
    backend,
    args: Dict[str, Any],
    state: ProgramState = None,
) -> ProgramState:
    missing = [a for a in prog.arg_names if a not in args]
    if missing:
        raise TypeError(f"program {prog.name} missing arguments: {missing}")
    s = state if state is not None else ProgramState(backend)
    for node in prog.nodes:
        if isinstance(node, ConstantText):
            s.text += node.text
        elif isinstance(node, ArgRef):
            s.text += str(args[node.name])
        elif isinstance(node, VarRef):
            s.text += s.vars[node.name]
        elif isinstance(node, GenOp):
            s._run_gen(node.spec)
        elif isinstance(node, SelectOp):
            s._run_select(node.spec)
        elif isinstance(node, (RoleBegin, RoleEnd)):
            pass  # roles flatten to text in this backend (chat_template)
        elif isinstance(node, ImageOp):
            data = args[node.data.name] if isinstance(node.data, ArgRef) else node.data
            s.images.append(data)
            s.text += "<image>"
        else:
            raise TypeError(f"unknown IR node {type(node)}")
    return s
