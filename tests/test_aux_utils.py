"""Aux subsystems: debug_utils (dumper + comparators), storage connectors,
and the named chat-template registry."""

import io
import json
import os
import tempfile

import numpy as np
import pytest


def test_dumper_and_comparator(tmp_path, monkeypatch):
    monkeypatch.setenv("LTP_DUMPER_DIR", str(tmp_path))
    from ltp_sglang_tpu.debug_utils.dumper import _Dumper
    from ltp_sglang_tpu.debug_utils.dump_comparator import compare

    a = _Dumper()
    a.on_forward_pass_start()
    a.dump("hidden", np.arange(12.0).reshape(3, 4), layer=0)
    a.dump("logits", np.ones((2, 5)), layer=0)
    b = _Dumper()
    b.on_forward_pass_start()
    b.dump("hidden", np.arange(12.0).reshape(3, 4), layer=0)
    b.dump("logits", np.ones((2, 5)) + 1e-2, layer=0)  # diverges

    out = io.StringIO()
    n_bad = compare(a.dir, b.dir, rel_tol=1e-3, out=out)
    report = out.getvalue()
    assert n_bad == 1
    assert "BAD" in report and "logits" in report
    assert "OK" in report and "hidden" in report


def test_dumper_in_jit(tmp_path, monkeypatch):
    monkeypatch.setenv("LTP_DUMPER_DIR", str(tmp_path))
    import jax
    import jax.numpy as jnp

    from ltp_sglang_tpu.debug_utils.dumper import _Dumper

    d = _Dumper()

    @jax.jit
    def f(x):
        y = x * 2
        d.dump_in_jit("y", y, layer=3)
        return y + 1

    f(jnp.arange(4.0)).block_until_ready()
    files = list(d.dir.glob("*.npy"))
    assert len(files) == 1
    assert np.array_equal(np.load(files[0]), np.arange(4.0) * 2)


def test_text_comparator(tmp_path):
    from ltp_sglang_tpu.debug_utils.text_comparator import compare

    rec1 = {"prompt": [1, 2], "text": "hello world", "output_ids": [5, 6, 7]}
    rec2 = {"prompt": [1, 2], "text": "hello mars", "output_ids": [5, 6, 9]}
    pa, pb = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    pa.write_text(json.dumps(rec1) + "\n")
    pb.write_text(json.dumps(rec2) + "\n")
    out = io.StringIO()
    assert compare(str(pa), str(pb), out=out) == 1
    assert "first_token_div=2" in out.getvalue()
    pb.write_text(json.dumps(rec1) + "\n")
    assert compare(str(pa), str(pb), out=io.StringIO()) == 0


def test_file_connector(tmp_path):
    from safetensors.numpy import save_file

    from ltp_sglang_tpu.connector import ConnectorType, create_remote_connector, get_connector_type

    save_file({"layer.w": np.ones((2, 3), np.float32)},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text("{}")
    with create_remote_connector(f"file://{tmp_path}") as c:
        assert get_connector_type(c) == ConnectorType.FS
        assert c.glob("*.json") == ["config.json"]
        ws = dict(c.weight_iterator())
        assert np.array_equal(ws["layer.w"], np.ones((2, 3)))
        c.pull_files(allow_pattern=["*.json"])
        assert os.path.exists(os.path.join(c.get_local_dir(), "config.json"))


def test_memory_connector():
    from ltp_sglang_tpu.connector import ConnectorType, create_remote_connector, get_connector_type

    c = create_remote_connector("memory://testns")
    assert get_connector_type(c) == ConnectorType.KV
    c.set("w/a", np.arange(4))
    c.setstr("meta", "v1")
    c2 = create_remote_connector("memory://testns")  # same namespace
    assert np.array_equal(c2.get("w/a"), np.arange(4))
    assert c2.getstr("meta") == "v1"
    assert c2.list("w/") == ["w/a"]


def test_chat_template_registry():
    from ltp_sglang_tpu.chat_template import get_chat_template, match_chat_template

    msgs = [
        {"role": "system", "content": "be terse"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": [{"type": "text", "text": "bye"}]},
    ]
    t = get_chat_template("llama-3")
    p = t.apply(msgs)
    assert p.count("<|eot_id|>") == 4
    assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert "bye" in p  # typed content parts flattened

    q = get_chat_template("chatml").apply([{"role": "user", "content": "x"}])
    assert q.startswith("<|im_start|>system")  # default system inserted
    assert q.endswith("<|im_start|>assistant\n")

    assert match_chat_template("/models/Qwen2.5-7B-Instruct").name == "chatml"
    assert match_chat_template("/models/Meta-Llama-3-8B").name == "llama-3"
    assert match_chat_template("/models/whatever").name == "plain"
    with pytest.raises(KeyError):
        get_chat_template("nope")
