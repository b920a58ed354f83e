from ltp_sglang_tpu.debug_utils.dumper import dumper  # noqa: F401
