"""GGUF checkpoint reader (and a minimal writer for tests).

Counterpart of the reference's GGUF loader path (model_loader/loader.py
GGUFModelLoader + gguf-py): parses the GGUF v3 container directly with
numpy — no gguf package on this image — supports F32/F16/BF16 tensors plus
Q8_0 block dequantization, and maps llama.cpp tensor names (token_embd,
blk.N.attn_q, ...) back to HF names so the models' convert_hf_weights
ingests them unchanged.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Iterable, Tuple

import numpy as np

GGUF_MAGIC = b"GGUF"

# GGML tensor dtypes (ggml.h).
GGML_F32, GGML_F16, GGML_Q8_0, GGML_BF16 = 0, 1, 8, 30

_VAL_FMT = {
    0: ("<B", 1), 1: ("<b", 1), 2: ("<H", 2), 3: ("<h", 2),
    4: ("<I", 4), 5: ("<i", 4), 6: ("<f", 4), 7: ("<?", 1),
    10: ("<Q", 8), 11: ("<q", 8), 12: ("<d", 8),
}
_T_STRING, _T_ARRAY = 8, 9


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        out = struct.unpack_from(fmt, self.buf, self.off)
        self.off += size
        return out[0] if len(out) == 1 else out

    def read_string(self) -> str:
        n = self.read("<Q")
        s = self.buf[self.off : self.off + n].decode("utf-8", errors="replace")
        self.off += n
        return s

    def read_value(self, vtype: int):
        if vtype == _T_STRING:
            return self.read_string()
        if vtype == _T_ARRAY:
            at = self.read("<I")
            n = self.read("<Q")
            return [self.read_value(at) for _ in range(n)]
        fmt, _ = _VAL_FMT[vtype]
        return self.read(fmt)


def _dequant_q8_0(raw: np.ndarray, n_elems: int) -> np.ndarray:
    """Q8_0: blocks of 32 int8 values with one f16 scale (34 bytes)."""
    blocks = raw.reshape(-1, 34)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [nb, 1]
    qs = blocks[:, 2:].view(np.int8).astype(np.float32)  # [nb, 32]
    return (qs * scales).reshape(-1)[:n_elems]


def read_gguf(path: str) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """-> (metadata, tensors). Tensor values are float32/float16 numpy in
    ROW-MAJOR [out, in] orientation (gguf stores dims reversed)."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    assert buf[:4] == GGUF_MAGIC, "not a GGUF file"
    r.off = 4
    version = r.read("<I")
    assert version in (2, 3), f"unsupported GGUF version {version}"
    n_tensors = r.read("<Q")
    n_kv = r.read("<Q")
    meta: Dict[str, Any] = {}
    for _ in range(n_kv):
        key = r.read_string()
        vtype = r.read("<I")
        meta[key] = r.read_value(vtype)

    infos = []
    for _ in range(n_tensors):
        name = r.read_string()
        n_dims = r.read("<I")
        dims = [r.read("<Q") for _ in range(n_dims)]
        ggml_type = r.read("<I")
        offset = r.read("<Q")
        infos.append((name, dims, ggml_type, offset))

    align = meta.get("general.alignment", 32)
    data0 = (r.off + align - 1) // align * align

    tensors: Dict[str, np.ndarray] = {}
    for name, dims, gt, offset in infos:
        shape = tuple(reversed(dims))  # gguf dims are innermost-first
        n = int(np.prod(shape)) if shape else 1
        start = data0 + offset
        if gt == GGML_F32:
            arr = np.frombuffer(buf, np.float32, n, start).reshape(shape)
        elif gt == GGML_F16:
            arr = np.frombuffer(buf, np.float16, n, start).reshape(shape)
        elif gt == GGML_BF16:
            import ml_dtypes

            arr = np.frombuffer(buf, ml_dtypes.bfloat16, n, start).reshape(shape)
        elif gt == GGML_Q8_0:
            nb = (n + 31) // 32
            raw = np.frombuffer(buf, np.uint8, nb * 34, start)
            arr = _dequant_q8_0(raw, n).reshape(shape)
        else:
            raise NotImplementedError(f"GGML tensor type {gt} ({name})")
        tensors[name] = arr
    return meta, tensors


# --------------------------------------------------- llama.cpp -> HF naming
_DIRECT = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}
_BLK = {
    "attn_norm.weight": "input_layernorm.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
    "attn_q.weight": "self_attn.q_proj.weight",
    "attn_k.weight": "self_attn.k_proj.weight",
    "attn_v.weight": "self_attn.v_proj.weight",
    "attn_output.weight": "self_attn.o_proj.weight",
    "ffn_gate.weight": "mlp.gate_proj.weight",
    "ffn_up.weight": "mlp.up_proj.weight",
    "ffn_down.weight": "mlp.down_proj.weight",
    "attn_q.bias": "self_attn.q_proj.bias",
    "attn_k.bias": "self_attn.k_proj.bias",
    "attn_v.bias": "self_attn.v_proj.bias",
}


def gguf_to_hf_names(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for name, arr in tensors.items():
        if name in _DIRECT:
            out[_DIRECT[name]] = arr
            continue
        if name.startswith("blk."):
            _, idx, rest = name.split(".", 2)
            if rest in _BLK:
                out[f"model.layers.{idx}.{_BLK[rest]}"] = arr
                continue
        out[name] = arr  # unknown names pass through untouched
    return out


def load_gguf_weights(path: str) -> Dict[str, np.ndarray]:
    _, tensors = read_gguf(path)
    return gguf_to_hf_names(tensors)


# ------------------------------------------------------------ test writer
def write_gguf(path: str, metadata: Dict[str, Any],
               tensors: Iterable[Tuple[str, np.ndarray]]):
    """Minimal GGUF v3 writer (F32/F16 only) for round-trip tests."""
    tensors = list(tensors)
    align = 32
    out = bytearray()
    out += GGUF_MAGIC
    out += struct.pack("<I", 3)
    out += struct.pack("<Q", len(tensors))
    out += struct.pack("<Q", len(metadata))

    def put_string(s: str):
        b = s.encode()
        out.extend(struct.pack("<Q", len(b)))
        out.extend(b)

    for k, v in metadata.items():
        put_string(k)
        if isinstance(v, str):
            out.extend(struct.pack("<I", _T_STRING))
            put_string(v)
        elif isinstance(v, bool):
            out.extend(struct.pack("<I", 7))
            out.extend(struct.pack("<?", v))
        elif isinstance(v, int):
            out.extend(struct.pack("<I", 4))
            out.extend(struct.pack("<I", v))
        elif isinstance(v, float):
            out.extend(struct.pack("<I", 6))
            out.extend(struct.pack("<f", v))
        else:
            raise TypeError(type(v))

    offset = 0
    blobs = []
    for name, arr in tensors:
        arr = np.ascontiguousarray(arr)
        gt = GGML_F32 if arr.dtype == np.float32 else GGML_F16
        assert arr.dtype in (np.float32, np.float16), arr.dtype
        put_string(name)
        out.extend(struct.pack("<I", arr.ndim))
        for d in reversed(arr.shape):
            out.extend(struct.pack("<Q", d))
        out.extend(struct.pack("<I", gt))
        out.extend(struct.pack("<Q", offset))
        blob = arr.tobytes()
        pad = (-len(blob)) % align
        blobs.append(blob + b"\0" * pad)
        offset += len(blob) + pad

    pad0 = (-len(out)) % align
    out.extend(b"\0" * pad0)
    for b in blobs:
        out.extend(b)
    with open(path, "wb") as f:
        f.write(bytes(out))
