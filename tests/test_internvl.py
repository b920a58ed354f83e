"""InternVL serving: HF greedy parity with image injection (InternViT tower
with layer scale + pixel shuffle + projector over the qwen2 LM)."""

import tempfile

import numpy as np
import pytest

IMG_TOKEN = 500


def _make_internvl_dir():
    import torch
    from transformers import (
        InternVLConfig,
        InternVLForConditionalGeneration,
        InternVLVisionConfig,
        Qwen2Config,
    )

    text_cfg = Qwen2Config(
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        vocab_size=512, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=2,
    )
    vision_cfg = InternVLVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8,
        use_qk_norm=True, use_mean_pooling=True,
    )
    cfg = InternVLConfig(
        vision_config=vision_cfg.to_dict(), text_config=text_cfg.to_dict(),
        image_token_id=IMG_TOKEN, downsample_ratio=0.5,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(31)
    model = InternVLForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_internvl_")
    model.save_pretrained(d, safe_serialization=True)
    import json, os

    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": 32},
            "crop_size": {"height": 32, "width": 32},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


@pytest.fixture(scope="module")
def internvl_bits():
    return _make_internvl_dir()


def _image(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)


def test_internvl_hf_parity(internvl_bits):
    import torch

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.multimodal.processor import ClipImagePreprocessor

    d, hf = internvl_bits
    img = _image(3)
    pre = ClipImagePreprocessor({
        "size": {"shortest_edge": 32}, "crop_size": {"height": 32, "width": 32},
        "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
    })
    pix = pre(img)

    # (32/8)^2 patches -> pixel shuffle 0.5 -> 4 image tokens.
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
