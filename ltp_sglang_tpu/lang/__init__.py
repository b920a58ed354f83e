from ltp_sglang_tpu.lang.api import (
    assistant,
    function,
    gen,
    image,
    select,
    system,
    user,
)
from ltp_sglang_tpu.lang.backend import (  # noqa: F401
    Anthropic,
    LiteLLM,
    OpenAI,
    RuntimeEndpoint,
    VertexAI,
)
