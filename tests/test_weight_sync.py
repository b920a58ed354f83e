"""update_weights_from_distributed: a trainer-led weight-update group pushes
tensors into a live serving engine over the framed-TCP group transport and
the engine commits them atomically between scheduler steps (reference
model_executor/model_runner.py:776-867)."""

import os
import tempfile
import threading

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir


@pytest.fixture(scope="module")
def model_dirs():
    """(base_dir, updated_dir): same tiny llama, updated_dir has perturbed
    weights saved as a normal HF checkpoint — ground truth for what the
    engine must produce after the sync."""
    base = write_tiny_model_dir(tempfile.mkdtemp(prefix="wsync_base_"), seed=0)
    upd = write_tiny_model_dir(tempfile.mkdtemp(prefix="wsync_upd_"), seed=123)
    return base, upd


def _hf_tensors(model_dir):
    from safetensors import safe_open

    out = {}
    path = os.path.join(model_dir, "model.safetensors")
    with safe_open(path, framework="numpy") as f:
        for name in f.keys():
            out[name] = f.get_tensor(name)
    return out


def _mkengine(model_dir):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=model_dir, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))


SP = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
PROMPT = [1, 7, 19, 101, 3]


def test_distributed_weight_sync_switches_outputs(model_dirs):
    """Full-checkpoint sync: after the trainer broadcasts every tensor of
    the updated checkpoint, the engine's greedy outputs must equal a fresh
    engine loaded from that checkpoint."""
    from ltp_sglang_tpu.weight_sync.distributed import TrainerWeightServer

    base, upd = model_dirs
    ref = _mkengine(upd)
    want = ref.generate(input_ids=PROMPT, sampling_params=SP)["output_ids"]

    eng = _mkengine(base)
    before = eng.generate(input_ids=PROMPT, sampling_params=SP)["output_ids"]
    assert before != want, "perturbed checkpoint must change greedy outputs"

    srv = TrainerWeightServer()
    t = threading.Thread(target=srv.wait_for_members, args=(1,), daemon=True)
    t.start()
    assert eng.init_weights_update_group(
        "127.0.0.1", srv.port, rank_offset=1, world_size=2
    )
    t.join(timeout=10)

    tensors = sorted(_hf_tensors(upd).items())
    names = [n for n, _ in tensors]
    dtypes = [str(a.dtype) for _, a in tensors]
    shapes = [list(a.shape) for _, a in tensors]
    bt = threading.Thread(target=srv.broadcast, args=(tensors,), daemon=True)
    bt.start()
    ok, msg = eng.update_weights_from_distributed(names, dtypes, shapes)
    assert ok, msg
    bt.join(timeout=10)
    assert not bt.is_alive(), "trainer broadcast never acked"

    eng.flush_cache()
    after = eng.generate(input_ids=PROMPT, sampling_params=SP)["output_ids"]
    assert after == want, (after, want)
    srv.close()


def test_distributed_weight_sync_mid_decode(model_dirs):
    """The commit lands at a step boundary while a long generation is in
    flight: the in-flight request completes, and the engine serves the new
    weights afterwards."""
    from ltp_sglang_tpu.weight_sync.distributed import TrainerWeightServer

    base, upd = model_dirs
    eng = _mkengine(base)
    srv = TrainerWeightServer()
    wt = threading.Thread(target=srv.wait_for_members, args=(1,), daemon=True)
    wt.start()
    eng.init_weights_update_group("127.0.0.1", srv.port)
    wt.join(timeout=10)

    long_sp = {"max_new_tokens": 96, "temperature": 0.0, "ignore_eos": True}
    results = {}

    def run_long():
        results["long"] = eng.generate(
            input_ids=[2, 4, 6, 8], sampling_params=long_sp
        )

    gen_t = threading.Thread(target=run_long, daemon=True)
    gen_t.start()
    # Push one tensor mid-decode (the embed table from the updated ckpt).
    emb = _hf_tensors(upd)["model.embed_tokens.weight"]
    bt = threading.Thread(
        target=srv.broadcast,
        args=([("model.embed_tokens.weight", emb)],), daemon=True,
    )
    bt.start()
    ok, msg = eng.update_weights_from_distributed(
        ["model.embed_tokens.weight"], [str(emb.dtype)], [list(emb.shape)]
    )
    assert ok, msg
    gen_t.join(timeout=60)
    assert not gen_t.is_alive(), "in-flight generation never finished"
    assert len(results["long"]["output_ids"]) == 96
    got = eng.get_weights_by_name("embed/weight")
    np.testing.assert_array_equal(got, emb)
    srv.close()


def test_distributed_weight_sync_rejects_bad_updates(model_dirs):
    """Bad names/shapes fail loudly BEFORE any mutation (all-or-nothing
    commit) and the trainer sees the failure ack."""
    from ltp_sglang_tpu.weight_sync.distributed import TrainerWeightServer

    base, _ = model_dirs
    eng = _mkengine(base)
    old_norm = eng.get_weights_by_name("norm").copy()
    srv = TrainerWeightServer()
    wt = threading.Thread(target=srv.wait_for_members, args=(1,), daemon=True)
    wt.start()
    eng.init_weights_update_group("127.0.0.1", srv.port)
    wt.join(timeout=10)

    bad = [
        ("model.norm.weight", np.ones((999,), np.float32)),  # wrong shape
    ]
    errs = {}

    def bcast():
        try:
            srv.broadcast(bad)
        except RuntimeError as e:
            errs["trainer"] = str(e)

    bt = threading.Thread(target=bcast, daemon=True)
    bt.start()
    ok, msg = eng.update_weights_from_distributed(
        ["model.norm.weight"], ["float32"], [[999]]
    )
    assert not ok and "shape mismatch" in msg, (ok, msg)
    bt.join(timeout=10)
    assert "trainer" in errs, "trainer was not told the update failed"
    np.testing.assert_array_equal(eng.get_weights_by_name("norm"), old_norm)
    # Unknown group
    ok, msg = eng.update_weights_from_distributed(["x"], group_name="nope")
    assert not ok and "not initialized" in msg
    srv.close()


def test_native_path_and_hf_name_mix(model_dirs):
    """apply_named_updates accepts native slash paths and HF names in one
    batch. Dense q/k/v projections are FUSED into qkv_proj (layers/linear.py
    fuse_dense_projections), so both name forms must resolve onto column
    slices of the fused kernel; stacked per-layer HF updates are grouped
    into one scatter per leaf."""
    import jax.numpy as jnp

    from ltp_sglang_tpu.weight_sync.distributed import apply_named_updates

    base, _ = model_dirs
    eng = _mkengine(base)
    r = eng.model_runner
    layers = r.params["layers"]
    assert "qkv_proj" in layers and "q_proj" not in layers
    L = TINY_LLAMA_CFG["num_hidden_layers"]
    D = TINY_LLAMA_CFG["hidden_size"]
    fused = np.asarray(layers["qkv_proj"]["kernel"])  # [L, D, qn+2*kn]
    qn = np.asarray(layers["o_proj"]["kernel"]).shape[-2]
    kn = (fused.shape[-1] - qn) // 2
    rng = np.random.default_rng(0)
    # HF names: per-layer q_proj updates, HF layout [out, in].
    new_q = [rng.standard_normal((qn, D)).astype(np.float32)
             for _ in range(L)]
    # Native slash path: whole stacked k_proj, native layout [L, in, out] —
    # must land on columns [qn, qn+kn) of the fused leaf.
    new_k = rng.standard_normal((L, D, kn)).astype(np.float32)
    new_norm = rng.standard_normal((D,)).astype(np.float32)
    apply_named_updates(r, [
        ("model.layers.0.self_attn.q_proj.weight", new_q[0]),
        ("model.layers.1.self_attn.q_proj.weight", new_q[1]),
        ("layers/k_proj/kernel", new_k),
        ("norm", new_norm),
    ])
    got = np.asarray(r.params["layers"]["qkv_proj"]["kernel"])
    for i in range(L):
        np.testing.assert_allclose(got[i, :, :qn], new_q[i].T, rtol=1e-6)
    np.testing.assert_allclose(got[:, :, qn : qn + kn], new_k, rtol=1e-6)
    # v columns untouched.
    np.testing.assert_allclose(
        got[:, :, qn + kn :], fused[:, :, qn + kn :], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r.params["norm"]), new_norm,
                               rtol=1e-6)
    # Unknown native paths still fail loudly (no silent fused fallback).
    with pytest.raises(KeyError):
        apply_named_updates(r, [("layers/zz_proj/kernel", new_k)])
    assert not jnp.issubdtype(r.params["norm"].dtype, jnp.integer)
