from .base import SketchSet  # noqa: F401
from .kssd import (  # noqa: F401
    KssdParams,
    get_shuffle_table,
    sketch_files_kssd,
    sketch_sequences_kssd,
)
