"""Greedy parity vs HF transformers for each supported dense architecture
(the analog of test/srt/models/test_generation_models.py)."""

import tempfile

import pytest

from tiny_configs import (
    TINY_MISTRAL_CFG,
    TINY_QWEN2_CFG,
    TINY_QWEN3_CFG,
    write_tiny_model_dir,
)


@pytest.mark.parametrize(
    "cfg",
    [TINY_QWEN2_CFG, TINY_QWEN3_CFG, TINY_MISTRAL_CFG],
    ids=["qwen2", "qwen3", "mistral"],
)
def test_greedy_parity(cfg):
    import torch
    from transformers import AutoModelForCausalLM

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix=f"tiny_{cfg['model_type']}_")
    write_tiny_model_dir(d, cfg=cfg)

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42]
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=16, do_sample=False
        )[0].tolist()[len(prompt):]

    eng = Engine(
        ServerArgs(
            model_path=d,
            dtype="float32",
            max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    out = eng.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 16, "temperature": 0.0}
    )
    assert out["output_ids"] == ref, f"{cfg['model_type']}: {out['output_ids']} != {ref}"
