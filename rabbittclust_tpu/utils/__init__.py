from .glibc_rand import GlibcRand, glibc_rand_stream  # noqa: F401
from .timers import Timer  # noqa: F401
