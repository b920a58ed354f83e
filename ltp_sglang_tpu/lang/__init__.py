from ltp_sglang_tpu.lang.api import (
    assistant,
    function,
    gen,
    select,
    system,
    user,
)
