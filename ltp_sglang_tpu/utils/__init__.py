from ltp_sglang_tpu.utils.common import (
    cdiv,
    round_up,
    next_power_of_2,
    bucketize,
    get_bool_env_var,
    get_int_env_var,
    set_random_seed,
)
