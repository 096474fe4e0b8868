from .mash import (  # noqa: F401
    aaf_distance,
    jaccard_index,
    mash_distance,
    min_jaccard_for_threshold,
    size_ratio_limit,
)
