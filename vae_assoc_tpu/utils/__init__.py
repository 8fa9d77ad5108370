from vae_assoc_tpu.utils.compile_cache import enable_compile_cache
from vae_assoc_tpu.utils.logging import MetricsLogger, read_jsonl

__all__ = ["MetricsLogger", "enable_compile_cache", "read_jsonl"]
# checkpoint and viz are imported lazily by callers (orbax / matplotlib
# are heavier deps than the logging core).
