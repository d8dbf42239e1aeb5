"""Runtime utilities (compilation cache, profiling helpers)."""

from gsmpm_tpu.utils.cache import enable_compilation_cache  # noqa: F401
