"""Multimodal input processing.

Counterpart of multimodal/processors/base_processor.py + llava.py and the
pad/hash machinery in managers/schedule_batch.py:205-375:

- `load_image` accepts file paths, raw bytes, base64 / data URIs, numpy
  arrays, and PIL images.
- `ClipImagePreprocessor` mirrors HF CLIPImageProcessor (bicubic
  shortest-edge resize, center crop, rescale, channel normalize) from the
  model's preprocessor_config.json.
- `MultimodalProcessor.process` expands each image placeholder token into
  `num_image_tokens` PAD ids derived from the image content hash (offset
  past the vocab), so the radix tree distinguishes different images at the
  same prompt positions, and returns MultimodalItem records the scheduler
  encodes lazily.
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import io
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class MultimodalItem:
    offset: int  # position of the first image token in the expanded prompt
    length: int  # number of placeholder positions
    pad_value: int  # radix-distinguishing pseudo-token id (>= vocab)
    feature: np.ndarray  # pixel_values [3, H, W] (pre-encode)
    embeds: Optional[np.ndarray] = None  # [length, Dm] once encoded
    # Qwen-VL family: (t, h_llm, w_llm) merged feature grid for M-RoPE
    # (multimodal/mrope.py); None for flat-token VLMs (llava).
    llm_grid: Optional[tuple] = None


def load_image(data) -> "np.ndarray":
    """-> RGB uint8 [H, W, 3]."""
    from PIL import Image

    if isinstance(data, np.ndarray):
        return data.astype(np.uint8)
    if hasattr(data, "convert"):  # PIL image
        return np.asarray(data.convert("RGB"))
    if isinstance(data, str):
        if data.startswith("data:"):
            data = base64.b64decode(data.split(",", 1)[1])
        elif os.path.exists(data):
            with open(data, "rb") as f:
                data = f.read()
        else:
            data = base64.b64decode(data)
    if isinstance(data, (bytes, bytearray)):
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise ValueError(f"unsupported image input type {type(data)}")


class ClipImagePreprocessor:
    def __init__(self, cfg: Dict[str, Any]):
        size = cfg.get("size", {})
        self.shortest_edge = (
            size.get("shortest_edge", 336) if isinstance(size, dict) else size
        )
        crop = cfg.get("crop_size", {})
        self.crop = crop.get("height", self.shortest_edge) if isinstance(crop, dict) else crop
        self.mean = np.asarray(
            cfg.get("image_mean", [0.48145466, 0.4578275, 0.40821073]), np.float32
        )
        self.std = np.asarray(
            cfg.get("image_std", [0.26862954, 0.26130258, 0.27577711]), np.float32
        )
        self.rescale = float(cfg.get("rescale_factor", 1 / 255))

    @classmethod
    def from_model_dir(cls, model_dir: str) -> "ClipImagePreprocessor":
        path = os.path.join(model_dir, "preprocessor_config.json")
        cfg = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
        return cls(cfg)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """uint8 [H, W, 3] -> float32 [3, C, C] (resize/crop/normalize)."""
        from PIL import Image

        im = Image.fromarray(image)
        w, h = im.size
        short = min(w, h)
        scale = self.shortest_edge / short
        im = im.resize(
            (max(1, round(w * scale)), max(1, round(h * scale))),
            Image.Resampling.BICUBIC,
        )
        w, h = im.size
        left = (w - self.crop) // 2
        top = (h - self.crop) // 2
        im = im.crop((left, top, left + self.crop, top + self.crop))
        arr = np.asarray(im, np.float32) * self.rescale
        arr = (arr - self.mean) / self.std
        return arr.transpose(2, 0, 1)  # [3, C, C]


def load_video(data, num_frames: int) -> List[np.ndarray]:
    """-> exactly `num_frames` RGB uint8 frames (uniform temporal sampling;
    short clips repeat their last frame).

    Accepted inputs: a list/tuple of frames (each anything `load_image`
    takes), a [T, H, W, 3] ndarray, a directory of frame images (sorted),
    or a single image (served as a 1-frame clip). Compressed video
    containers are not decoded here (no codec dependency in this image) —
    decode upstream (reference processors also receive decoded frames)."""
    if isinstance(data, np.ndarray) and data.ndim == 4:
        frames = [data[i] for i in range(data.shape[0])]
    elif isinstance(data, (list, tuple)):
        frames = [load_image(f) for f in data]
    elif isinstance(data, str) and os.path.isdir(data):
        names = sorted(
            n for n in os.listdir(data)
            if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp"))
        )
        frames = [load_image(os.path.join(data, n)) for n in names]
    else:
        frames = [load_image(data)]
    if not frames:
        raise ValueError("video input decoded to zero frames")
    idx = np.linspace(0, len(frames) - 1, num_frames).round().astype(int)
    return [np.asarray(frames[i], np.uint8) for i in idx]


def hash_feature(feature: np.ndarray) -> int:
    return int.from_bytes(
        hashlib.sha256(np.ascontiguousarray(feature).tobytes()).digest()[:8],
        "little",
    )


class WhisperMelPreprocessor:
    """Audio -> fixed 30 s log-mel windows (Qwen2-Audio's front end).

    Wraps transformers' WhisperFeatureExtractor (pure numpy: hann STFT +
    slaney mel filterbank + log compression) so our mels are bit-equal to
    the HF pipeline's; accepts raw waveform arrays (float, 16 kHz)."""

    def __init__(self, n_mel: int = 128, n_frames: int = 3000,
                 sampling_rate: int = 16000):
        from transformers import WhisperFeatureExtractor

        # frames = chunk_length * sampling_rate / hop(160) = chunk * 100.
        self.fe = WhisperFeatureExtractor(
            feature_size=n_mel, sampling_rate=sampling_rate,
            chunk_length=max(1, n_frames // 100),
        )
        self.sampling_rate = sampling_rate

    def __call__(self, audio) -> np.ndarray:
        wav = np.asarray(audio, np.float32).reshape(-1)
        out = self.fe(
            wav, sampling_rate=self.sampling_rate, return_tensors="np",
            padding="max_length",
        )
        return out["input_features"][0]  # [n_mel, 3000]


class MultimodalProcessor:
    def __init__(self, model, model_dir: str, vocab_size: int):
        self.model = model
        self.vocab_size = vocab_size
        self.image_token_index = model.image_token_index
        self.num_image_tokens = model.num_image_tokens
        self.audio_modality = bool(getattr(model, "audio_modality", False))
        self.video_modality = bool(getattr(model, "video_modality", False))
        self.num_frames = int(getattr(model, "num_frames", 0) or 0)
        if self.audio_modality:
            self.audio_preprocessor = WhisperMelPreprocessor(
                n_mel=getattr(model, "n_mel", 128),
                n_frames=2 * getattr(model, "max_source_positions", 1500),
            )
        self.preprocessor = ClipImagePreprocessor.from_model_dir(model_dir)
        # Fixed-resolution VLMs (qwen-vl family here): every image resizes
        # to one square so the vision tower's window partition / grids stay
        # compile-time static.
        fixed = getattr(model, "fixed_image_size", None)
        if fixed:
            self.preprocessor.shortest_edge = fixed
            self.preprocessor.crop = fixed
        self.llm_grid = getattr(model, "mm_llm_grid", None)

    def process(
        self, input_ids: List[int], images: List[Any]
    ) -> Tuple[List[int], List[MultimodalItem]]:
        """Expand each image placeholder into num_image_tokens hash-derived
        pad ids; returns (expanded_ids, items)."""
        slots = [i for i, t in enumerate(input_ids) if t == self.image_token_index]
        if len(slots) != len(images):
            raise ValueError(
                f"prompt has {len(slots)} image tokens but {len(images)} images"
            )
        out: List[int] = []
        items: List[MultimodalItem] = []
        img_i = 0
        for i, tok in enumerate(input_ids):
            if tok != self.image_token_index:
                out.append(tok)
                continue
            if self.audio_modality:
                feature = self.audio_preprocessor(images[img_i])
            elif self.video_modality:
                frames = load_video(images[img_i], self.num_frames)
                feature = np.stack([self.preprocessor(f) for f in frames])
            else:
                feature = self.preprocessor(load_image(images[img_i]))
            pad = self.vocab_size + hash_feature(feature) % (1 << 30)
            items.append(MultimodalItem(
                offset=len(out), length=self.num_image_tokens,
                pad_value=pad, feature=feature, llm_grid=self.llm_grid,
            ))
            out.extend([pad] * self.num_image_tokens)
            img_i += 1
        return out, items
