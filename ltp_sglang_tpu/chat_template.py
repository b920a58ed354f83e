"""Named chat-template registry.

Counterpart of the reference's conversation.py template registry
(`get_conv_template`, `match_chat_template`): when the tokenizer has no
`apply_chat_template` (or the user overrides via --chat-template), a named
template renders the message list and supplies the right stop markers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ChatTemplate:
    name: str
    system_fmt: str  # format with {content}
    user_fmt: str
    assistant_fmt: str  # used for history turns
    assistant_prefix: str  # generation prompt
    stop_strs: Tuple[str, ...] = ()
    default_system: str = ""

    def apply(self, messages: List[Dict[str, str]],
              add_generation_prompt: bool = True) -> str:
        out = []
        saw_system = False
        for m in messages:
            role = m.get("role", "user")
            content = _text_of(m.get("content", ""))
            if role == "system":
                out.append(self.system_fmt.format(content=content))
                saw_system = True
            elif role == "assistant":
                out.append(self.assistant_fmt.format(content=content))
            else:
                out.append(self.user_fmt.format(content=content))
        if self.default_system and not saw_system:
            out.insert(0, self.system_fmt.format(content=self.default_system))
        if add_generation_prompt:
            out.append(self.assistant_prefix)
        return "".join(out)


def _text_of(content) -> str:
    """OpenAI content may be a string or a list of typed parts."""
    if isinstance(content, str):
        return content
    if isinstance(content, list):
        return "".join(
            p.get("text", "") for p in content if isinstance(p, dict)
            and p.get("type") in (None, "text")
        )
    return str(content)


_REGISTRY: Dict[str, ChatTemplate] = {}


def register(t: ChatTemplate):
    _REGISTRY[t.name] = t
    return t


register(ChatTemplate(
    name="llama-3",
    system_fmt="<|start_header_id|>system<|end_header_id|>\n\n{content}<|eot_id|>",
    user_fmt="<|start_header_id|>user<|end_header_id|>\n\n{content}<|eot_id|>",
    assistant_fmt="<|start_header_id|>assistant<|end_header_id|>\n\n{content}<|eot_id|>",
    assistant_prefix="<|start_header_id|>assistant<|end_header_id|>\n\n",
    stop_strs=("<|eot_id|>",),
))
register(ChatTemplate(
    name="chatml",  # qwen2/qwen2.5/qwen3 and many others
    system_fmt="<|im_start|>system\n{content}<|im_end|>\n",
    user_fmt="<|im_start|>user\n{content}<|im_end|>\n",
    assistant_fmt="<|im_start|>assistant\n{content}<|im_end|>\n",
    assistant_prefix="<|im_start|>assistant\n",
    stop_strs=("<|im_end|>",),
    default_system="You are a helpful assistant.",
))
register(ChatTemplate(
    name="mistral",
    system_fmt="[INST] {content}\n",
    user_fmt="[INST] {content} [/INST]",
    assistant_fmt="{content}</s>",
    assistant_prefix="",
    stop_strs=("</s>",),
))
register(ChatTemplate(
    name="gemma",
    system_fmt="<start_of_turn>user\n{content}<end_of_turn>\n",
    user_fmt="<start_of_turn>user\n{content}<end_of_turn>\n",
    assistant_fmt="<start_of_turn>model\n{content}<end_of_turn>\n",
    assistant_prefix="<start_of_turn>model\n",
    stop_strs=("<end_of_turn>",),
))
register(ChatTemplate(
    name="deepseek",
    system_fmt="{content}\n\n",
    user_fmt="User: {content}\n\n",
    assistant_fmt="Assistant: {content}<｜end▁of▁sentence｜>",
    assistant_prefix="Assistant:",
    stop_strs=("<｜end▁of▁sentence｜>",),
))
register(ChatTemplate(
    name="phi",
    system_fmt="<|system|>\n{content}<|end|>\n",
    user_fmt="<|user|>\n{content}<|end|>\n",
    assistant_fmt="<|assistant|>\n{content}<|end|>\n",
    assistant_prefix="<|assistant|>\n",
    stop_strs=("<|end|>",),
))
register(ChatTemplate(
    name="plain",  # last-resort fallback (the old inline behavior)
    system_fmt="<|system|>\n{content}\n",
    user_fmt="<|user|>\n{content}\n",
    assistant_fmt="<|assistant|>\n{content}\n",
    assistant_prefix="<|assistant|>\n",
))

_MATCHERS = [
    ("llama-3", ("llama-3", "llama3", "llama_3")),
    ("chatml", ("qwen", "chatml", "yi-")),
    ("mistral", ("mistral", "mixtral")),
    ("gemma", ("gemma",)),
    ("deepseek", ("deepseek",)),
    ("phi", ("phi-3", "phi3", "phi-4")),
]


def get_chat_template(name: str) -> ChatTemplate:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown chat template {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def match_chat_template(model_path: str) -> ChatTemplate:
    low = (model_path or "").lower()
    for name, needles in _MATCHERS:
        if any(n in low for n in needles):
            return _REGISTRY[name]
    return _REGISTRY["plain"]
