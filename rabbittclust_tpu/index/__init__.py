from .inverted import InvertedIndex, CsrIndex  # noqa: F401
