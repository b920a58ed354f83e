"""GGUF loader: container round-trip, Q8_0 dequant, and end-to-end greedy
parity serving a GGUF-converted tiny llama."""

import os
import struct
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir


def test_gguf_roundtrip(tmp_path):
    from ltp_sglang_tpu.model_loader.gguf import read_gguf, write_gguf

    rng = np.random.default_rng(0)
    tensors = [
        ("a.weight", rng.standard_normal((4, 8)).astype(np.float32)),
        ("b.weight", rng.standard_normal((3, 16)).astype(np.float16)),
        ("c", rng.standard_normal((7,)).astype(np.float32)),
    ]
    path = str(tmp_path / "t.gguf")
    write_gguf(path, {"general.architecture": "llama", "x.count": 3}, tensors)
    meta, out = read_gguf(path)
    assert meta["general.architecture"] == "llama"
    assert meta["x.count"] == 3
    for name, arr in tensors:
        assert out[name].shape == arr.shape
        assert np.allclose(out[name].astype(np.float32),
                           arr.astype(np.float32))


def test_gguf_q8_0_dequant(tmp_path):
    """Hand-pack a Q8_0 tensor and verify the dequantization."""
    from ltp_sglang_tpu.model_loader.gguf import GGML_Q8_0, GGUF_MAGIC, read_gguf

    n = 64  # two blocks
    scales = [0.5, 0.25]
    qs = np.arange(-32, 32, dtype=np.int8)
    expected = np.concatenate([
        qs[:32].astype(np.float32) * scales[0],
        qs[32:].astype(np.float32) * scales[1],
    ])
    blob = b""
    for b in range(2):
        blob += np.float16(scales[b]).tobytes()
        blob += qs[b * 32 : (b + 1) * 32].tobytes()

    out = bytearray()
    out += GGUF_MAGIC + struct.pack("<I", 3) + struct.pack("<Q", 1)
    out += struct.pack("<Q", 0)  # no metadata
    name = b"q.weight"
    out += struct.pack("<Q", len(name)) + name
    out += struct.pack("<I", 1) + struct.pack("<Q", n)
    out += struct.pack("<I", GGML_Q8_0) + struct.pack("<Q", 0)
    out += b"\0" * ((-len(out)) % 32)
    out += blob
    path = str(tmp_path / "q.gguf")
    with open(path, "wb") as f:
        f.write(bytes(out))
    _, tensors = read_gguf(path)
    assert np.allclose(tensors["q.weight"], expected)


def test_gguf_end_to_end_parity():
    """Convert a tiny HF llama to GGUF (llama.cpp names, f32) and serve it;
    greedy outputs must match the safetensors engine exactly."""
    from safetensors import safe_open

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.model_loader.gguf import write_gguf

    d = tempfile.mkdtemp(prefix="gguf_src_")
    write_tiny_model_dir(d)

    hf_to_gguf = {
        "model.embed_tokens.weight": "token_embd.weight",
        "model.norm.weight": "output_norm.weight",
        "lm_head.weight": "output.weight",
    }
    per_layer = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    tensors = []
    import glob as _glob

    for f in _glob.glob(os.path.join(d, "*.safetensors")):
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                arr = sf.get_tensor(name).astype(np.float32)
                if name in hf_to_gguf:
                    tensors.append((hf_to_gguf[name], arr))
                    continue
                parts = name.split(".")
                rest = ".".join(parts[3:])
                if rest in per_layer:
                    tensors.append((f"blk.{parts[2]}.{per_layer[rest]}", arr))

    g = tempfile.mkdtemp(prefix="gguf_model_")
    write_gguf(os.path.join(g, "model.gguf"),
               {"general.architecture": "llama"}, tensors)
    import json
    import shutil

    shutil.copy(os.path.join(d, "config.json"), os.path.join(g, "config.json"))

    prompt = [1, 44, 55, 66, 77, 88]
    sp = {"max_new_tokens": 10, "temperature": 0.0}
    ref_eng = Engine(ServerArgs(model_path=d, dtype="float32",
                                max_total_tokens=1024, max_running_requests=4))
    ref = ref_eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
    eng = Engine(ServerArgs(model_path=g, dtype="float32",
                            max_total_tokens=1024, max_running_requests=4))
    out = eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
    assert out == ref, (out, ref)
