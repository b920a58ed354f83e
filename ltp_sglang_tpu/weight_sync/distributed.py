"""Trainer-group weight sync (`update_weights_from_distributed`).

Reference surface: model_executor/model_runner.py:776-867 — an RLHF trainer
process leads a weight-update group; serving engines join it
(`init_weights_update_group(master_address, master_port, rank_offset,
world_size, group_name)`), then each `update_weights_from_distributed(names,
dtypes, shapes)` call receives the broadcast tensors and commits them
atomically between scheduler steps.

TPU redesign: the reference's group is a torch.distributed NCCL/gloo world;
here the transport is the same framed-TCP protocol the PD data plane uses
(disaggregation/net.py) riding DCN — weight sync is trainer-host to
serving-host traffic, not an ICI collective, and TPU serving meshes keep
their collectives inside the jitted program. The trainer side is
`TrainerWeightServer` (what torch rank 0's broadcast loop would be);
multiple serving engines can join the same group and every broadcast is
acked by all members before returning, so the trainer knows the commit
barrier has been reached fleet-wide.

Name forms accepted by `apply_named_updates`:
  * native slash paths into the param pytree ("layers/q_proj/kernel");
  * HF checkpoint names ("model.layers.3.self_attn.q_proj.weight") — these
    are resolved against the stacked scan layout (models/llama.py
    convert_hf_weights) and grouped so each stacked leaf is scattered once.
"""

from __future__ import annotations

import logging
import socket
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ltp_sglang_tpu.disaggregation.net import connect, recv_frame, send_frame

logger = logging.getLogger(__name__)


def _np_dtype(name: str):
    if name in ("bfloat16", "jnp.bfloat16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


class TrainerWeightServer:
    """Trainer-side group master (the reference's torch rank 0).

    Usage (trainer process):
        srv = TrainerWeightServer(port=0)
        ... tell engines srv.port; they call init_weights_update_group ...
        srv.wait_for_members(1)
        srv.broadcast([("model.embed_tokens.weight", arr), ...])
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind((host, port))
        self._lsock.listen(16)
        self.host, self.port = self._lsock.getsockname()
        self._members: List[Tuple[socket.socket, Dict[str, Any]]] = []
        self._lock = threading.Lock()

    def wait_for_members(self, n: int, timeout: float = 30.0):
        self._lsock.settimeout(timeout)
        while len(self._members) < n:
            sock, _ = self._lsock.accept()
            sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            hdr, _ = recv_frame(sock)
            assert hdr.get("kind") == "join", hdr
            send_frame(sock, {"kind": "welcome", "rank": hdr.get("rank")})
            with self._lock:
                self._members.append((sock, hdr))
            logger.info("weight group: member rank=%s joined (%d total)",
                        hdr.get("rank"), len(self._members))

    def broadcast(self, named_tensors: Sequence[Tuple[str, np.ndarray]]):
        """Send every tensor to every member, then wait for all acks (the
        ack arrives after the member's engine committed the batch)."""
        with self._lock:
            members = list(self._members)
        for sock, _ in members:
            for name, arr in named_tensors:
                arr = np.ascontiguousarray(arr)
                send_frame(sock, {
                    "kind": "tensor", "name": name,
                    "dtype": str(arr.dtype), "shape": list(arr.shape),
                }, arr.tobytes())
        for sock, hdr in members:
            ack, _ = recv_frame(sock)
            if ack.get("kind") != "ack" or ack.get("ok") is not True:
                raise RuntimeError(
                    f"member rank={hdr.get('rank')} failed the update: {ack}"
                )

    def close(self):
        for sock, _ in self._members:
            try:
                sock.close()
            except OSError:
                pass
        self._lsock.close()


class WeightUpdateGroup:
    """Engine-side member of a trainer-led weight-update group."""

    def __init__(self, master_address: str, master_port: int, rank: int,
                 world_size: int, group_name: str,
                 timeout: float = 60.0):
        self.group_name = group_name
        self.rank = rank
        self.sock = connect(master_address, master_port, timeout=timeout)
        self.sock.settimeout(timeout)
        send_frame(self.sock, {
            "kind": "join", "group": group_name,
            "rank": rank, "world_size": world_size,
        })
        hdr, _ = recv_frame(self.sock)
        assert hdr.get("kind") == "welcome", hdr

    def recv_tensors(self, names: Sequence[str],
                     dtypes: Optional[Sequence[str]] = None,
                     shapes: Optional[Sequence[Sequence[int]]] = None):
        """Receive exactly len(names) broadcast tensors, validated against
        the caller's declared names/dtypes/shapes (the reference API passes
        all three so a desynced stream fails loudly, not silently)."""
        out = []
        for i, name in enumerate(names):
            hdr, payload = recv_frame(self.sock)
            if hdr.get("kind") != "tensor" or hdr.get("name") != name:
                raise RuntimeError(
                    f"weight stream desync: expected tensor {name!r}, "
                    f"got {hdr}"
                )
            dt = _np_dtype(hdr["dtype"])
            if dtypes is not None and _np_dtype(dtypes[i]) != dt:
                raise RuntimeError(
                    f"{name}: dtype mismatch {dtypes[i]} vs {hdr['dtype']}"
                )
            arr = np.frombuffer(payload, dtype=dt).reshape(hdr["shape"])
            if shapes is not None and list(shapes[i]) != list(hdr["shape"]):
                raise RuntimeError(
                    f"{name}: shape mismatch {shapes[i]} vs {hdr['shape']}"
                )
            out.append((name, arr))
        return out

    def ack(self, ok: bool, message: str = ""):
        try:
            send_frame(self.sock, {"kind": "ack", "ok": ok, "message": message})
        except OSError:
            pass

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


# --------------------------------------------------------------- application
def _resolve_native(params, path: str):
    """Native slash path -> (container, key, cols or None).

    On models whose dense projections were fused (layers/linear.py
    fuse_dense_projections), `layers/q_proj/kernel` no longer names a leaf;
    it resolves to the matching COLUMN SLICE of the fused `qkv_proj` /
    `gate_up_proj` kernel (same mapping `_fused_cols` provides for HF
    names), so a trainer using native paths keeps working after fusion."""
    parts = path.split("/")
    node = params
    for pi, part in enumerate(parts[:-1]):
        if part not in node:
            alias = _fused_cols(node, part) if isinstance(node, dict) else None
            if alias is not None and parts[pi + 1 :] == ["kernel"]:
                fused, cols = alias
                return node[fused], "kernel", cols
            raise KeyError(path)
        node = node[part]
    key = parts[-1]
    if key not in node:
        raise KeyError(path)
    return node, key, None


def _resolve_hf(params, name: str):
    """HF checkpoint name -> (container, key, layer_idx or None, transpose).

    Covers the llama-family stacked layout every dense model here shares
    (models/llama.py convert_hf_weights): separate q/k/v/o and
    gate/up/down projection leaves ("kernel" is HF weight transposed),
    stacked norm vectors, embed/norm/lm_head at the top level."""
    if name.startswith("model."):
        name = name[len("model."):]
    if name == "embed_tokens.weight":
        return params["embed"], "weight", None, False, None
    if name == "norm.weight":
        return params, "norm", None, False, None
    if name == "lm_head.weight":
        if "lm_head" not in params:
            raise KeyError(
                "lm_head.weight: model ties embeddings; update "
                "embed_tokens.weight instead"
            )
        return params["lm_head"], "kernel", None, True, None
    if not name.startswith("layers."):
        raise KeyError(name)
    _, idx, rest = name.split(".", 2)
    i = int(idx)
    layers = params["layers"]
    if rest in ("input_layernorm.weight", "post_attention_layernorm.weight"):
        return layers, rest.rsplit(".", 1)[0], i, False, None
    for prefix in ("self_attn.", "mlp."):
        if rest.startswith(prefix):
            sub, field = rest[len(prefix):].rsplit(".", 1)
            cols = None
            if sub not in layers:
                # Dense-fused projections (layers/linear.
                # fuse_dense_projections): map the checkpoint name onto a
                # column slice of the fused leaf.
                alias = _fused_cols(layers, sub)
                if alias is None:
                    raise KeyError(name)
                sub, cols = alias
            leaf = layers[sub]
            if field == "weight":
                if "kernel" not in leaf:
                    raise ValueError(
                        f"{name}: leaf is quantized ({sorted(leaf)}); "
                        "distributed sync updates dense kernels only — "
                        "requantize and reload via update_weights_from_disk"
                    )
                return leaf, "kernel", i, True, cols
            if field == "bias":
                return leaf, "bias", i, False, cols
    raise KeyError(name)


def _fused_cols(layers, sub: str):
    """(fused_name, (offset, width)) for an unfused projection name, sizing
    the slice from the sibling leaves' shapes."""
    if sub in ("q_proj", "k_proj", "v_proj") and "qkv_proj" in layers:
        kern = layers["qkv_proj"].get("kernel")
        if kern is None:
            return None
        # widths derive from o_proj (K = Hq*D) and the total
        n_total = kern.shape[-1]
        qn = layers["o_proj"]["kernel"].shape[-2]
        kn = (n_total - qn) // 2
        off = {"q_proj": 0, "k_proj": qn, "v_proj": qn + kn}[sub]
        width = qn if sub == "q_proj" else kn
        return "qkv_proj", (off, width)
    if sub in ("gate_proj", "up_proj") and "gate_up_proj" in layers:
        kern = layers["gate_up_proj"].get("kernel")
        if kern is None:
            return None
        im = kern.shape[-1] // 2
        return "gate_up_proj", (0 if sub == "gate_proj" else im, im)
    return None


def apply_named_updates(runner, named_tensors):
    """Apply [(name, np.ndarray), ...] to runner.params in place. Stacked
    per-layer updates are grouped so each [L, ...] leaf is scattered once;
    every update preserves the leaf's dtype and (mesh) sharding. Raises on
    any name/shape problem BEFORE mutating anything — the commit is
    all-or-nothing."""
    import jax
    import jax.numpy as jnp

    params = runner.params
    full: List[Tuple[Any, str, Any, np.ndarray]] = []
    grouped: Dict[int, Tuple[Any, str, List[int], List[np.ndarray]]] = {}
    for name, arr in named_tensors:
        arr = np.asarray(arr)
        if "/" in name or "." not in name:
            node, key, cols = _resolve_native(params, name)
            i, transpose = None, False
        else:
            node, key, i, transpose, cols = _resolve_hf(params, name)
        if transpose:
            arr = arr.T
        old = node[key]
        want = tuple(old.shape[1:]) if i is not None else tuple(old.shape)
        if cols is not None:
            want = want[:-1] + (cols[1],)
        if tuple(arr.shape) != want:
            raise ValueError(
                f"{name}: shape mismatch {arr.shape} vs expected {want}"
            )
        if i is not None:
            gkey = (id(old), cols)
            if gkey not in grouped:
                grouped[gkey] = (node, key, cols, [], [])
            grouped[gkey][3].append(i)
            grouped[gkey][4].append(arr)
        else:
            full.append((node, key, cols, arr))

    for node, key, cols, arr in full:
        old = node[key]
        new = jnp.asarray(arr, dtype=old.dtype)
        if cols is not None:
            new = old.at[..., cols[0] : cols[0] + cols[1]].set(new)
        node[key] = jax.device_put(new, old.sharding)
    for node, key, cols, idxs, arrs in grouped.values():
        old = node[key]
        stacked = jnp.asarray(np.stack(arrs), dtype=old.dtype)
        rows = np.asarray(idxs, np.int32)
        if cols is None:
            new = old.at[rows].set(stacked)
        else:
            new = old.at[rows, ..., cols[0] : cols[0] + cols[1]].set(stacked)
        node[key] = jax.device_put(new, old.sharding)
