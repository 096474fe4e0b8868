from .union_find import UnionFind  # noqa: F401
from .mst import (  # noqa: F401
    MstResult,
    compute_mst,
    cut_forest,
    clusters_from_forest,
    kruskal,
)
