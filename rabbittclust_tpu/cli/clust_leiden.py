"""clust-leiden entry point (reference src/main.cpp:391-477 dispatch)."""

from __future__ import annotations

import sys

from .common import base_parser, make_output_options, validate_common
from ..cluster.leiden import cluster_graph, community_clusters, load_graph
from ..state.cluster_io import write_cluster_file


def main(argv=None) -> int:
    p = base_parser("leiden")
    args = p.parse_args(argv)
    validate_common(args, "leiden")
    opts = make_output_options(args, "leiden")

    use_louvain = args.use_louvain
    knn_k = args.knn_k
    if use_louvain and knn_k == 0:
        knn_k = 1000
        print(f"-----Auto-enabled: edge-parallel + warm-start + knn={knn_k}",
              file=sys.stderr)
    if knn_k == 0:
        knn_k = 500
        print(f"-----Auto-selecting k-NN: k={knn_k} (use --knn 0 to disable)",
              file=sys.stderr)
    if 0 < knn_k < 10:
        print(f"WARNING: --knn value too small ({knn_k}), recommend at "
              f"least 50. Using 50.", file=sys.stderr)
        knn_k = 50

    if getattr(args, "multihost", None):
        # AFTER the auto-kNN resolution: the multihost graph must prune
        # with the same k the single-host run auto-selects, or the two
        # commands return different partitions on dense corpora
        args.knn_k = knn_k
        from .clust_mst import run_multihost
        return run_multihost(args, False, "leiden")

    if args.pregraph:
        import os
        if os.path.isdir(args.pregraph):
            # reference semantics (sub_command.cpp:3200-3226): the argument
            # is a sketch folder; the graph lives at <folder>/leiden.graph
            # and sketches supply the genome metadata for the output rows
            from ..state.sketch_io import load_kssd_sketches
            ss, _ = load_kssd_sketches(args.pregraph)
            print(f"-----the size of sketches is: {len(ss)}", file=sys.stderr)
            n, graph = load_graph(
                os.path.join(args.pregraph, "leiden.graph"))
            clusters = cluster_graph(n, graph, args.resolution,
                                     not use_louvain)
            write_cluster_file(args.output, clusters, ss, args.threshold)
        else:
            # convenience fallback: a bare graph file (ours are saved as
            # <output>.graph); no sketch metadata, so rows carry ids only
            n, graph = load_graph(args.pregraph)
            clusters = cluster_graph(n, graph, args.resolution,
                                     not use_louvain)
            _write_membership(clusters, args.output)
        print(f"-----write the cluster result into: {args.output}",
              file=sys.stderr)
        return 0

    if not args.is_fast:
        print("ERROR: clust-leiden requires --fast option", file=sys.stderr)
        return 1

    folder = None
    if args.presketched:
        from ..state.sketch_io import load_kssd_sketches
        ss, kp = load_kssd_sketches(args.presketched)
        folder = args.presketched
        # from-sketch: k derives from the sketch params (half_k * 2,
        # reference sub_command.cpp:3173)
        cluster_kmer = kp.kmer_size
    else:
        kmer_size = args.kmer_size or 19
        # from-genome: the reference passes the RAW CLI k to
        # KssdLeidenCluster's distance math even though KSSD sketched
        # with the rounded-even 2*half_k (sub_command.cpp:3144) — a
        # replicated quirk, visible only for odd -k (golden:
        # test_leiden_graph_byte_identical at k=21)
        cluster_kmer = kmer_size
        if not (0 <= args.drlevel <= 8):
            print(f"ERROR: invalid drlevel {args.drlevel}, should be in "
                  f"[0, 8]", file=sys.stderr)
            return 1
        from ..io.fasta import read_file_list
        from ..sketch.kssd import sketch_files_kssd, sketch_sequences_kssd
        if args.sketch_by_file:
            ss, kp = sketch_files_kssd(read_file_list(args.input),
                                       args.min_len, kmer_size, args.drlevel,
                                       args.threads)
        else:
            ss, kp = sketch_sequences_kssd(args.input, args.min_len,
                                           kmer_size, args.drlevel,
                                           args.threads)
    print(f"-----the size of sketches (genomes) is: {len(ss)}",
          file=sys.stderr)
    graph_path = None
    if not args.no_save:
        # save sketches to a run folder (reference compute_kssd_sketches,
        # sub_command.cpp:3121) and the graph as <folder>/leiden.graph so
        # --pregraph <folder> works for fast resolution sweeps
        import os
        from ..state import sketch_io
        if folder is None:
            folder = sketch_io.default_folder_path()
            sketch_io.ensure_folder(folder)
            sketch_io.save_kssd_sketches(ss, kp, folder)
            sketch_io.save_kssd_index(ss.hashes, ss.use64, folder)
        graph_path = os.path.join(folder, "leiden.graph")
    # --louvain auto-enables the edge-parallel warm-start path
    # (reference main.cpp:403-414)
    clusters = community_clusters(
        ss.hashes, args.threshold, cluster_kmer, args.resolution,
        use_leiden=not use_louvain, knn_k=knn_k,
        graph_save_path=graph_path, use_device=args.use_device,
        edge_parallel=use_louvain)
    write_cluster_file(args.output, clusters, ss, args.threshold)
    print(f"-----write the cluster result into: {args.output}",
          file=sys.stderr)
    return 0


def _write_membership(clusters, output: str) -> None:
    with open(output, "w") as f:
        f.write(f"# Clustering from pre-built graph\n")
        f.write(f"# Total clusters: {len(clusters)}\n#\n")
        for ci, members in enumerate(clusters):
            f.write(f"the cluster {ci} is: \n")
            for li, gid in enumerate(members):
                f.write(f"\t{li:5d}\t{gid:6d}\n")
            f.write("\n")


def cli() -> int:
    """Console entry with reference-style clean error reporting."""
    try:
        return main()
    except FileNotFoundError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 1
    except ValueError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(cli())
