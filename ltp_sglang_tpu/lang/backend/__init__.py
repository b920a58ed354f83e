"""DSL backends (python/sglang/lang/backend/): the local Engine object itself,
RuntimeEndpoint (this framework's HTTP server), and third-party
OpenAI-compatible / Anthropic endpoints."""

from ltp_sglang_tpu.lang.backend.anthropic import Anthropic
from ltp_sglang_tpu.lang.backend.litellm import LiteLLM
from ltp_sglang_tpu.lang.backend.openai import OpenAI
from ltp_sglang_tpu.lang.backend.runtime_endpoint import RuntimeEndpoint
from ltp_sglang_tpu.lang.backend.vertexai import VertexAI

__all__ = ["Anthropic", "LiteLLM", "OpenAI", "RuntimeEndpoint", "VertexAI"]
