"""Structured outputs: regex/JSON-schema constrained generation
(the analog of test_regex_constrained.py / test_json_constrained.py)."""

import json
import re
import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir, write_tiny_tokenizer


# ------------------------- unit: regex engine -------------------------
def test_regex_dfa_basics():
    from ltp_sglang_tpu.constrained.regex_engine import compile_regex

    dfa = compile_regex(r"[0-9]{2}-[a-z]+")
    assert dfa.walk(0, "12-abc") in dfa.accepting
    assert dfa.walk(0, "1-abc") == -1 or dfa.walk(0, "1-abc") not in dfa.accepting
    assert dfa.walk(0, "12-") not in dfa.accepting
    assert dfa.walk(0, "12-a") in dfa.accepting

    dfa = compile_regex(r"(?:foo|bar)+")
    assert dfa.walk(0, "foobarfoo") in dfa.accepting
    assert dfa.walk(0, "fooba") not in dfa.accepting
    assert dfa.walk(0, "baz") == -1

    dfa = compile_regex(r"-?\d+(?:\.\d+)?")
    for ok in ("0", "-17", "3.14"):
        assert dfa.walk(0, ok) in dfa.accepting, ok
    for bad in ("-", "3.", "a"):
        s = dfa.walk(0, bad)
        assert s == -1 or s not in dfa.accepting, bad


def test_json_schema_regex():
    from ltp_sglang_tpu.constrained.json_schema import schema_to_regex
    from ltp_sglang_tpu.constrained.regex_engine import compile_regex

    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    dfa = compile_regex(schema_to_regex(schema))
    good = '{"name":"alice","age":30}'
    assert dfa.walk(0, good) in dfa.accepting
    bad = '{"age":30,"name":"alice"}'  # canonical order enforced
    s = dfa.walk(0, bad)
    assert s == -1 or s not in dfa.accepting
    # enum
    dfa2 = compile_regex(schema_to_regex({"enum": ["red", "green"]}))
    assert dfa2.walk(0, '"red"') in dfa2.accepting
    assert dfa2.walk(0, '"blue"') == -1


# ------------------------- e2e: engine ---------------------------------
@pytest.fixture(scope="module")
def engine():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="grammar_llama_")
    write_tiny_model_dir(d, with_weights=False)
    write_tiny_tokenizer(d)
    return Engine(
        ServerArgs(
            model_path=d,
            load_format="dummy",
            dtype="float32",
            max_total_tokens=2048,
            max_running_requests=8,
        )
    )


def test_regex_constrained_generation(engine):
    pattern = r"[0-9]{3}-[0-9]{2}"
    out = engine.generate(
        prompt="the code is ",
        sampling_params={
            "max_new_tokens": 24,
            "temperature": 0.0,
            "regex": pattern,
        },
    )
    assert re.fullmatch(pattern, out["text"]), out["text"]


def test_json_schema_constrained_generation(engine):
    # A random-weight model won't voluntarily terminate an unbounded integer,
    # so keep value spaces finite (enum/boolean) — the constraint machinery is
    # what's under test.
    schema = {
        "type": "object",
        "properties": {
            "age": {"enum": [1, 22, 333]},
            "ok": {"type": "boolean"},
            "color": {"enum": ["red", "green"]},
        },
        "required": ["age", "ok", "color"],
    }
    out = engine.generate(
        prompt="profile: ",
        sampling_params={
            "max_new_tokens": 48,
            "temperature": 0.0,
            "json_schema": json.dumps(schema),
        },
    )
    data = json.loads(out["text"])
    assert data["age"] in (1, 22, 333)
    assert isinstance(data["ok"], bool)
    assert data["color"] in ("red", "green")
    assert out["meta_info"]["finish_reason"]["type"] == "stop"


def test_regex_constrained_sampled(engine):
    pattern = r"(?:foo|bar){2}"
    out = engine.generate(
        prompt="x",
        sampling_params={
            "max_new_tokens": 16,
            "temperature": 1.0,
            "top_k": 50,
            "regex": pattern,
        },
    )
    assert re.fullmatch(pattern, out["text"]), out["text"]


# ------------------------- unit: EBNF -------------------------
def test_ebnf_to_regex_basics():
    from ltp_sglang_tpu.constrained.ebnf import ebnf_to_regex
    from ltp_sglang_tpu.constrained.regex_engine import compile_regex

    g = r'''
root ::= greeting " " name "!"
greeting ::= "hello" | "hi"
name ::= [A-Z][a-z]+
'''
    rx = ebnf_to_regex(g)
    dfa = compile_regex(rx)

    def matches(s):
        st = dfa.walk(0, s)
        return st >= 0 and st in dfa.accepting

    assert matches("hello Bob!")
    assert matches("hi Alice!")
    assert not matches("hey Bob!")
    assert not matches("hello bob!")


def test_ebnf_recursion_bounded():
    from ltp_sglang_tpu.constrained.ebnf import ebnf_to_regex
    from ltp_sglang_tpu.constrained.regex_engine import compile_regex

    # Balanced parens around a digit, recursive with a base case.
    g = r'''
root ::= expr
expr ::= "(" expr ")" | [0-9]
'''
    rx = ebnf_to_regex(g, max_depth=4)
    dfa = compile_regex(rx)

    def matches(s):
        st = dfa.walk(0, s)
        return st >= 0 and st in dfa.accepting

    assert matches("5")
    assert matches("((7))")
    assert not matches("((")
    assert not matches("(5")

    # No base case -> must raise.
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ebnf_to_regex("root ::= root\n")


def test_ebnf_constrained_generation(engine):
    g = r'''
root ::= "yes" | "no" | "maybe " [0-9]+
'''
    out = engine.generate(
        prompt="answer: ",
        sampling_params={"max_new_tokens": 16, "temperature": 0.0, "ebnf": g},
    )
    assert re.fullmatch(r"yes|no|maybe [0-9]+", out["text"]), out["text"]
