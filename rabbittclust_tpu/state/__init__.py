from .cluster_io import print_cluster_result, write_cluster_file  # noqa: F401
