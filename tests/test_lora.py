"""LoRA serving: PEFT adapter loading + batched multi-adapter correctness."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir


def make_adapter(base_dir, rank=4, alpha=8, seed=3):
    """Fabricate a PEFT adapter for q_proj/v_proj + a dense checkpoint with
    the adapter merged (the ground truth)."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(base_dir, dtype=torch.float32)
    L = TINY_LLAMA_CFG["num_hidden_layers"]
    rng = np.random.default_rng(seed)
    tensors = {}
    scale = alpha / rank
    with torch.no_grad():
        for i in range(L):
            for tgt in ("q_proj", "v_proj"):
                w = dict(model.named_parameters())[
                    f"model.layers.{i}.self_attn.{tgt}.weight"
                ]
                N, K = w.shape
                A = rng.standard_normal((rank, K)).astype(np.float32) * 0.05
                B = rng.standard_normal((N, rank)).astype(np.float32) * 0.05
                base = f"base_model.model.model.layers.{i}.self_attn.{tgt}"
                tensors[base + ".lora_A.weight"] = torch.tensor(A)
                tensors[base + ".lora_B.weight"] = torch.tensor(B)
                w += torch.tensor(scale * (B @ A))

    adapter_dir = tempfile.mkdtemp(prefix="lora_adapter_")
    with open(os.path.join(adapter_dir, "adapter_config.json"), "w") as f:
        json.dump({"r": rank, "lora_alpha": alpha, "target_modules": ["q_proj", "v_proj"]}, f)
    save_file(tensors, os.path.join(adapter_dir, "adapter_model.safetensors"))

    merged_dir = tempfile.mkdtemp(prefix="lora_merged_")
    model.save_pretrained(merged_dir, safe_serialization=True)
    return adapter_dir, merged_dir


@pytest.fixture(scope="module")
def dirs():
    base = tempfile.mkdtemp(prefix="lora_base_")
    write_tiny_model_dir(base)
    adapter, merged = make_adapter(base)
    return base, adapter, merged


def make_engine(model_dir, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(
        ServerArgs(
            model_path=model_dir, dtype="float32",
            max_total_tokens=2048, max_running_requests=8, **kw,
        )
    )


def test_lora_matches_merged_weights(dirs):
    base_dir, adapter_dir, merged_dir = dirs
    prompt = [1, 5, 7, 9, 100]
    sp = {"max_new_tokens": 10, "temperature": 0.0}

    merged = make_engine(merged_dir)
    ref = merged.generate(input_ids=prompt, sampling_params=sp)

    eng = make_engine(base_dir)
    out = eng.generate(
        prompt=None, input_ids=prompt, sampling_params=sp,
    )
    # Route through HTTP-style lora_path: use the GenerateReqInput field.
    from ltp_sglang_tpu.managers.io_struct import GenerateReqInput

    gri = GenerateReqInput(input_ids=prompt, sampling_params=sp, lora_path=adapter_dir)
    gri.normalize_batch_and_arguments()
    req = eng._make_req(gri)
    eng.scheduler.add_request(req)
    while not req.finished():
        eng.scheduler.event_loop_step()
    assert req.output_ids == ref["output_ids"], (req.output_ids, ref["output_ids"])
    # And differs from the un-adapted base model.
    assert req.output_ids != out["output_ids"]


def test_lora_mixed_batch(dirs):
    base_dir, adapter_dir, _ = dirs
    eng = make_engine(base_dir)
    base_ref = eng.generate(
        input_ids=[2, 4, 6, 8], sampling_params={"max_new_tokens": 8, "temperature": 0.0}
    )

    from ltp_sglang_tpu.managers.io_struct import GenerateReqInput

    sp = {"max_new_tokens": 8, "temperature": 0.0}
    reqs = []
    for lora in (None, adapter_dir):
        gri = GenerateReqInput(input_ids=[2, 4, 6, 8], sampling_params=sp, lora_path=lora)
        gri.normalize_batch_and_arguments()
        r = eng._make_req(gri)
        eng.scheduler.add_request(r)
        reqs.append(r)
    while any(not r.finished() for r in reqs):
        eng.scheduler.event_loop_step()
    # The no-adapter request in a mixed batch is bit-exact vs solo base run.
    assert reqs[0].output_ids == base_ref["output_ids"]
    assert reqs[1].output_ids != base_ref["output_ids"]
