"""Typed request/response payloads.

Counterpart of managers/io_struct.py:38-1117 (the reference has ~70 classes
for its ZMQ process boundaries; the single-controller design needs far fewer —
these cross the HTTP/engine boundary). GenerateReqInput keeps the reference's
field names and batch normalization semantics (io_struct.py:64-174).
"""

from __future__ import annotations

import dataclasses
import uuid
from numbers import Integral
from typing import Any, Dict, List, Optional, Union


@dataclasses.dataclass
class GenerateReqInput:
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    sampling_params: Optional[Union[Dict, List[Dict]]] = None
    rid: Optional[Union[str, List[str]]] = None
    return_logprob: Union[bool, List[bool]] = False
    logprob_start_len: Union[int, List[int]] = -1
    top_logprobs_num: Union[int, List[int]] = 0
    stream: bool = False
    lora_path: Optional[Union[str, List[str]]] = None
    # Multimodal inputs: one image (path / base64 / data URI / ndarray) or a
    # list per request; list-of-lists for batches.
    image_data: Optional[Any] = None
    # Logprobs at specific token ids each step (score API; token_ids_logprobs
    # in the reference io_struct). One shared list for the whole batch.
    token_ids_logprob: Optional[List[int]] = None
    session_params: Optional[Dict] = None
    custom_logit_processor: Optional[Union[str, List[str]]] = None
    return_hidden_states: bool = False
    # PD disaggregation routing
    bootstrap_host: Optional[Union[str, List[str]]] = None
    bootstrap_port: Optional[Union[int, List[int]]] = None
    bootstrap_room: Optional[Union[int, List[int]]] = None
    data_parallel_rank: Optional[int] = None

    is_single: bool = dataclasses.field(default=True, init=False)
    batch_size: int = dataclasses.field(default=1, init=False)

    def normalize_batch_and_arguments(self):
        """Mirror io_struct.py normalize_batch_and_arguments: figure out
        single-vs-batch, broadcast scalar args, expand parallel n>1."""
        if self.text is None and self.input_ids is None:
            raise ValueError("either text or input_ids must be provided")
        if self.text is not None and self.input_ids is not None:
            raise ValueError("text and input_ids are mutually exclusive")

        if self.text is not None:
            self.is_single = isinstance(self.text, str)
            self.batch_size = 1 if self.is_single else len(self.text)
        else:
            self.is_single = bool(len(self.input_ids)) and isinstance(
                self.input_ids[0], Integral
            )
            self.batch_size = 1 if self.is_single else len(self.input_ids)

        if self.rid is None:
            if self.is_single:
                self.rid = uuid.uuid4().hex
            else:
                self.rid = [uuid.uuid4().hex for _ in range(self.batch_size)]

    def __getitem__(self, i: int) -> "GenerateReqInput":
        """Slice a batch input into a single-request view."""
        def pick(v, default=None):
            if isinstance(v, list):
                return v[i]
            return v

        out = GenerateReqInput(
            text=self.text[i] if isinstance(self.text, list) else None,
            input_ids=(
                self.input_ids[i]
                if (self.input_ids is not None and not self.is_single)
                else self.input_ids
            ),
            sampling_params=pick(self.sampling_params),
            rid=pick(self.rid),
            return_logprob=pick(self.return_logprob),
            logprob_start_len=pick(self.logprob_start_len, -1),
            top_logprobs_num=pick(self.top_logprobs_num, 0),
            stream=self.stream,
            lora_path=pick(self.lora_path),
            token_ids_logprob=self.token_ids_logprob,
            image_data=pick(self.image_data),
            custom_logit_processor=pick(self.custom_logit_processor),
        )
        out.is_single = True
        out.batch_size = 1
        return out


@dataclasses.dataclass
class EmbeddingReqInput:
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    rid: Optional[Union[str, List[str]]] = None


@dataclasses.dataclass
class AbortReq:
    rid: str


@dataclasses.dataclass
class FlushCacheReq:
    pass


@dataclasses.dataclass
class UpdateWeightsReqInput:
    model_path: Optional[str] = None
    load_format: Optional[str] = None
