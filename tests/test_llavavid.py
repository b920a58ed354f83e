"""Video modality (LLaVA-NeXT-Video): HF greedy parity with clip injection
through the generic multimodal pipeline (per-frame CLIP + spatial pool +
projector), plus load_video sampling units."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

VID_TOKEN = 500
NUM_FRAMES = 4
VISION_CFG = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 64,
    "image_size": 16,
    "patch_size": 4,  # -> 4x4 grid; stride-2 pool -> 4 tokens/frame
    "layer_norm_eps": 1e-5,
    "hidden_act": "quick_gelu",
    "projection_dim": 32,
    "num_channels": 3,
    "model_type": "clip_vision_model",
}
TOKENS_PER_FRAME = 4
N_VID_TOKENS = NUM_FRAMES * TOKENS_PER_FRAME


def _make_dir():
    import torch
    from transformers import (
        LlavaNextVideoConfig,
        LlavaNextVideoForConditionalGeneration,
    )

    text_cfg = {k: v for k, v in TINY_LLAMA_CFG.items() if k != "architectures"}
    cfg = LlavaNextVideoConfig(
        vision_config=dict(VISION_CFG),
        text_config=text_cfg,
        video_token_index=VID_TOKEN,
        image_token_index=VID_TOKEN + 1,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        spatial_pool_stride=2,
        spatial_pool_mode="average",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(31)
    model = LlavaNextVideoForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_llavavid_")
    model.save_pretrained(d, safe_serialization=True)
    # num_frames is a serving-side knob (config.json), not an HF field.
    with open(os.path.join(d, "config.json")) as f:
        raw = json.load(f)
    raw["num_frames"] = NUM_FRAMES
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(raw, f)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": 16}, "crop_size": {"height": 16, "width": 16},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


@pytest.fixture(scope="module")
def vid_bits():
    return _make_dir()


def _clip(seed, t=NUM_FRAMES):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(t, 16, 16, 3), dtype=np.uint8)


def _engine(d, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8, **kw,
    ))


PROMPT = [1, 9, 8, VID_TOKEN, 7, 6, 5, 11, 12]
SP = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}


def _hf_greedy(model, input_ids, clip_u8, max_new):
    import torch

    mean = np.float32(0.5)
    px = (clip_u8.astype(np.float32) / 255.0 - mean) / mean
    px = px.transpose(0, 3, 1, 2)  # [T, 3, H, W]
    i = input_ids.index(VID_TOKEN)
    expanded = input_ids[:i] + [VID_TOKEN] * N_VID_TOKENS + input_ids[i + 1:]
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values_videos=torch.tensor(px[None]),
            attention_mask=torch.ones((1, len(expanded)), dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
        )
    return out[0].tolist()[len(expanded):]


def test_llavavid_hf_parity(vid_bits):
    d, hf = vid_bits
    clip = _clip(3)
    want = _hf_greedy(hf, PROMPT, clip, SP["max_new_tokens"])
    eng = _engine(d)
    try:
        got = eng.generate(input_ids=PROMPT, sampling_params=SP,
                           image_data=[clip])["output_ids"]
    finally:
        eng.shutdown()
    assert got == want


def test_llavavid_distinguishes_clips(vid_bits):
    d, hf = vid_bits
    eng = _engine(d)
    try:
        outs = []
        for seed in (3, 4):
            outs.append(eng.generate(
                input_ids=PROMPT, sampling_params=SP,
                image_data=[_clip(seed)])["output_ids"])
        # Same prompt positions, different clips: radix must not conflate.
        want2 = _hf_greedy(hf, PROMPT, _clip(4), SP["max_new_tokens"])
        assert outs[1] == want2
    finally:
        eng.shutdown()


def test_load_video_sampling():
    from ltp_sglang_tpu.multimodal.processor import load_video

    # ndarray [T, H, W, 3] downsamples uniformly
    frames = np.stack([np.full((4, 4, 3), i, np.uint8) for i in range(10)])
    out = load_video(frames, 4)
    assert [f[0, 0, 0] for f in out] == [0, 3, 6, 9]
    # short clip repeats frames to fill
    out = load_video([frames[0], frames[1]], 4)
    assert len(out) == 4
    # single image becomes a 1-frame-repeated clip
    out = load_video(frames[0], 3)
    assert len(out) == 3 and (out[2] == 0).all()
