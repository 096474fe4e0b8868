"""rabbittclust_tpu — TPU-native genome clustering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RabbitBio/RabbitTClust: k-mer sketching (KSSD / MinHash), sketch-distance
estimation (Mash / AAF containment), and large-scale clustering
(single-linkage-over-MST, greedy incremental, Louvain/Leiden, DBSCAN) with
persistence, incremental append, and representative databases.

Layer map (mirrors SURVEY.md §7):
    io/        host streaming FASTA ingest, genome metadata
    sketch/    KSSD + MinHash sketch builders (native C++ fast path)
    ops/       Pallas/JAX device kernels (pairwise intersection engine)
    index/     inverted indexes (host + CSR device form)
    distance/  Mash / AAF distance math
    cluster/   MST, greedy, leiden, dbscan engines + postprocess
    state/     persistence formats, RepDB / cluster states, append
    parallel/  device mesh, sharded distance tiles, collective merge
    cli/       clust-mst / clust-greedy / clust-leiden / clust-dbscan
    utils/     glibc rand emulation, native bindings, timers
"""

__version__ = "0.1.0"
