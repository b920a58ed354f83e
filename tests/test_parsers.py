"""Function-call detectors and the reasoning parser."""

import json

from ltp_sglang_tpu.function_call.parser import FunctionCallParser
from ltp_sglang_tpu.reasoning_parser import ReasoningParser


def test_qwen25_detector():
    p = FunctionCallParser("qwen25")
    text = 'sure!\n<tool_call>\n{"name": "get_weather", "arguments": {"city": "SF"}}\n</tool_call>'
    normal, calls = p.parse_non_stream(text)
    assert normal == "sure!"
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "SF"}


def test_llama3_detector():
    p = FunctionCallParser("llama3")
    text = '<|python_tag|>{"name": "search", "parameters": {"q": "tpu"}}'
    normal, calls = p.parse_non_stream(text)
    assert calls[0].name == "search"
    assert json.loads(calls[0].parameters)["q"] == "tpu"


def test_mistral_detector():
    p = FunctionCallParser("mistral")
    text = 'ok [TOOL_CALLS] [{"name": "add", "arguments": {"a": 1, "b": 2}}]'
    normal, calls = p.parse_non_stream(text)
    assert normal == "ok"
    assert calls[0].name == "add"


def test_pythonic_detector():
    p = FunctionCallParser("pythonic")
    normal, calls = p.parse_non_stream('[get_weather(city="Paris"), ping()]')
    assert [c.name for c in calls] == ["get_weather", "ping"]
    assert json.loads(calls[0].parameters) == {"city": "Paris"}
    # Non-tool text passes through untouched.
    normal, calls = p.parse_non_stream("just words [not a call]")
    assert calls == [] and "just words" in normal


def test_streaming_tool_parse():
    p = FunctionCallParser("qwen25")
    chunks = ['hello ', 'there <tool', '_call>{"name": "f", "argu',
              'ments": {"x": 1}}</tool_call>']
    normal_total, all_calls = "", []
    for ch in chunks:
        n, calls = p.parse_stream_chunk(ch)
        normal_total += n
        all_calls += calls
    normal_total += p.flush()
    assert all_calls and all_calls[0].name == "f"
    assert "<tool_call>" not in normal_total


def test_reasoning_parser():
    r = ReasoningParser()
    reasoning, content = r.parse_non_stream("<think>step 1... step 2</think>The answer is 4.")
    assert reasoning == "step 1... step 2"
    assert content == "The answer is 4."

    # Implicit open block (R1 style).
    r2 = ReasoningParser(force_reasoning=True)
    reasoning, content = r2.parse_non_stream("thinking hard</think>42")
    assert reasoning == "thinking hard"
    assert content == "42"


def test_reasoning_streaming():
    r = ReasoningParser()
    chunks = ["<thi", "nk>abc", "def</th", "ink>answer"]
    reasoning, content = "", ""
    for ch in chunks:
        dr, dc = r.parse_stream_chunk(ch)
        reasoning += dr
        content += dc
    dr, dc = r.flush()
    reasoning += dr
    content += dc
    assert reasoning == "abcdef"
    assert content == "answer"


def test_tool_call_regex_composer():
    """tool_choice="required"/named-function constrained composition
    (reference ebnf_composer.py): the composed regex accepts exactly valid
    calls with schema-conforming arguments and rejects everything else."""
    from ltp_sglang_tpu.constrained.regex_engine import compile_regex
    from ltp_sglang_tpu.function_call.regex_composer import (
        compose_tool_call_regex,
    )

    tools = [
        {"type": "function", "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        }},
        {"type": "function", "function": {
            "name": "add",
            "parameters": {
                "type": "object",
                "properties": {"a": {"type": "integer"},
                               "b": {"type": "integer"}},
                "required": ["a", "b"],
            },
        }},
    ]
    rx = compose_tool_call_regex(tools, "required", "qwen25")
    dfa = compile_regex(rx)
    good = ('<tool_call>\n{"name": "get_weather", "arguments": '
            '{"city":"Paris"}}\n</tool_call>')
    assert dfa.walk(0, good) in dfa.accepting
    good2 = ('<tool_call>\n{"name": "add", "arguments": '
             '{"a":1,"b":22}}\n</tool_call>')
    assert dfa.walk(0, good2) in dfa.accepting
    # Unknown function / schema-violating args / free text: rejected.
    for bad in (
        '<tool_call>\n{"name": "rm_rf", "arguments": {}}\n</tool_call>',
        '<tool_call>\n{"name": "add", "arguments": '
        '{"a":"x","b":2}}\n</tool_call>',
        "sure! let me call a tool",
    ):
        s = dfa.walk(0, bad)
        assert s == -1 or s not in dfa.accepting, bad

    # Named tool_choice restricts to that one function.
    rx1 = compose_tool_call_regex(
        tools, {"type": "function", "function": {"name": "add"}}, "qwen25"
    )
    dfa1 = compile_regex(rx1)
    assert dfa1.walk(0, good2) in dfa1.accepting
    assert dfa1.walk(0, good) == -1 or dfa1.walk(0, good) not in dfa1.accepting
    # auto/none -> unconstrained.
    assert compose_tool_call_regex(tools, "auto", "qwen25") is None


def test_deepseekv3_detector():
    from ltp_sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser("deepseekv3")
    text = (
        "I'll check.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
        "<｜tool▁sep｜>get_weather\n```json\n{\"city\": \"Tokyo\"}\n```"
        "<｜tool▁call▁end｜>\n<｜tool▁call▁begin｜>function<｜tool▁sep｜>"
        "get_time\n```json\n{\"tz\": \"JST\"}\n```<｜tool▁call▁end｜>"
        "<｜tool▁calls▁end｜>"
    )
    normal, calls = p.parse_non_stream(text)
    assert normal == "I'll check."
    assert [(c.name, c.parameters) for c in calls] == [
        ("get_weather", '{"city": "Tokyo"}'),
        ("get_time", '{"tz": "JST"}'),
    ]
    assert p.parse_non_stream("no calls here") == ("no calls here", [])


def test_kimik2_detector():
    import json

    from ltp_sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser("kimi_k2")
    text = (
        "ok<|tool_calls_section_begin|><|tool_call_begin|>functions.search:0"
        " <|tool_call_argument_begin|>{\"q\": \"tpu\"}<|tool_call_end|>"
        "<|tool_calls_section_end|>"
    )
    normal, calls = p.parse_non_stream(text)
    assert normal == "ok"
    assert calls[0].name == "search"
    assert json.loads(calls[0].parameters) == {"q": "tpu"}


def test_glm4_moe_detector():
    import json

    from ltp_sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser("glm4_moe")
    text = (
        "sure\n<tool_call>get_weather\n"
        "<arg_key>city</arg_key><arg_value>Beijing</arg_value>"
        "<arg_key>days</arg_key><arg_value>3</arg_value></tool_call>"
    )
    normal, calls = p.parse_non_stream(text)
    assert normal == "sure"
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Beijing", "days": 3}


def test_qwen3_coder_detector():
    import json

    from ltp_sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser("qwen3_coder")
    text = (
        "<tool_call>\n<function=execute_bash>\n<parameter=command>\n"
        "pwd && ls\n</parameter>\n</function>\n</tool_call>"
    )
    normal, calls = p.parse_non_stream(text)
    assert normal == ""
    assert calls[0].name == "execute_bash"
    assert json.loads(calls[0].parameters) == {"command": "pwd && ls"}


def test_step3_detector():
    import json

    from ltp_sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser("step3")
    text = (
        "checking<｜tool_calls_begin｜><｜tool_call_begin｜>function"
        "<｜tool_sep｜><steptml:invoke name=\"get_weather\">\n"
        "<steptml:parameter name=\"city\">Paris</steptml:parameter>\n"
        "<steptml:parameter name=\"n\">2</steptml:parameter>\n"
        "</steptml:invoke><｜tool_call_end｜><｜tool_calls_end｜>"
    )
    normal, calls = p.parse_non_stream(text)
    assert normal == "checking"
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Paris", "n": 2}


def test_new_detectors_streaming():
    """Streaming chunks: text before the marker is released; the call is
    emitted once its end token arrives."""
    from ltp_sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser("glm4_moe")
    chunks = ["hello ", "world <tool_call>f\n<arg_key>a</arg_key>",
              "<arg_value>1</arg_value></tool_call>"]
    outs, calls = [], []
    for c in chunks:
        o, cs = p.parse_stream_chunk(c)
        outs.append(o)
        calls.extend(cs)
    assert calls and calls[0].name == "f"
