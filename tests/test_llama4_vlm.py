"""Llama-4 VLM (the reference's mllama4): HF greedy parity with image
injection — unfold patch embed, 2D vision rope, pixel shuffle adapter,
bias-free projector over the Llama4 MoE text body."""

import json
import os
import tempfile

import numpy as np
import pytest

IMG_TOKEN = 500


def _make_llama4_vlm_dir():
    import torch
    from transformers import (
        Llama4Config,
        Llama4ForConditionalGeneration,
        Llama4TextConfig,
        Llama4VisionConfig,
    )

    text_cfg = Llama4TextConfig(
        hidden_size=128, intermediate_size=64, intermediate_size_mlp=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, vocab_size=512, max_position_embeddings=256,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        eos_token_id=2, num_local_experts=4, num_experts_per_tok=2,
        use_qk_norm=True, attn_temperature_tuning=True, floor_scale=16.0,
        attn_scale=0.1, attention_chunk_size=16, attention_bias=False,
        interleave_moe_layer_step=1,
    )
    vision_cfg = Llama4VisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=8,
        pixel_shuffle_ratio=0.5, projector_input_dim=64,
        projector_output_dim=64, vision_output_dim=64, rope_theta=10000,
    )
    cfg = Llama4Config(
        vision_config=vision_cfg.to_dict(), text_config=text_cfg.to_dict(),
        image_token_index=IMG_TOKEN,
    )
    torch.manual_seed(5)
    model = Llama4ForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_llama4vlm_")
    model.save_pretrained(d, safe_serialization=True)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": 32},
            "crop_size": {"height": 32, "width": 32},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


@pytest.fixture(scope="module")
def llama4_vlm_bits():
    return _make_llama4_vlm_dir()


def test_llama4_vlm_hf_parity(llama4_vlm_bits):
    import torch

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.multimodal.processor import ClipImagePreprocessor

    d, hf = llama4_vlm_bits
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    pre = ClipImagePreprocessor({
        "size": {"shortest_edge": 32}, "crop_size": {"height": 32, "width": 32},
        "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
    })
    pix = pre(img)

    # (32/8)^2 = 16 patches -> pixel shuffle 0.5 -> 4 image tokens.
    n_tok = 4
    prompt = [1, 7, 9] + [IMG_TOKEN] * n_tok + [11, 13]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=10, do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    assert eng.mm_processor is not None
    assert eng.model_runner.model.num_image_tokens == n_tok
    out = eng.generate(
        input_ids=[1, 7, 9, IMG_TOKEN, 11, 13],
        sampling_params={"max_new_tokens": 10, "temperature": 0.0},
        image_data=[img],
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)
