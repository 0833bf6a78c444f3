from .cache import enable_compilation_cache
from .compiler_options import compiler_options_from_env

__all__ = ["enable_compilation_cache", "compiler_options_from_env"]
