"""clust-dbscan entry point (reference src/main.cpp:478-522 dispatch)."""

from __future__ import annotations

import sys

from .common import base_parser, validate_common
from .. import workflows as wf
from ..cluster.dbscan import dbscan_cluster, write_dbscan_result


def main(argv=None) -> int:
    p = base_parser("dbscan")
    args = p.parse_args(argv)
    validate_common(args, "dbscan")

    if getattr(args, "multihost", None):
        if getattr(args, "minhash_dbscan", False):
            # library path exists (multihost_dbscan(minhash=True)); the
            # CLI keeps MinHash sketching single-host like the reference
            print("ERROR: --multihost clust-dbscan requires --fast "
                  "(KSSD); use parallel.multihost.multihost_dbscan("
                  "minhash=True) from the API", file=sys.stderr)
            return 1
        from .clust_mst import run_multihost
        return run_multihost(args, False, "dbscan")

    if not args.is_fast:
        if getattr(args, "minhash_dbscan", False):
            return _minhash_main(args)
        # reference parity: main.cpp:481-484 (the MinHash engine exists at
        # dbscan.cpp:987 but is unreachable there; our --minhash flag
        # exposes it)
        print("ERROR: clust-dbscan requires --fast option", file=sys.stderr)
        return 1
    print("-----Using DBSCAN clustering", file=sys.stderr)
    print(f"-----DBSCAN parameters: eps={args.eps}, minPts={args.minpts}",
          file=sys.stderr)
    if not (0 <= args.drlevel <= 8):
        print(f"ERROR: invalid drlevel {args.drlevel}, should be in [0, 8]",
              file=sys.stderr)
        return 1

    if args.append:
        print("ERROR: --append not supported for DBSCAN clustering",
              file=sys.stderr)
        return 1

    if args.presketched:
        from ..state.sketch_io import load_kssd_sketches
        ss, kp = load_kssd_sketches(args.presketched)
        # from-sketch: the reference derives k from the sketch params
        # (kmer_size = info.half_k * 2, sub_command.cpp:3247)
        cluster_kmer = kp.kmer_size
    else:
        kmer_size = args.kmer_size or 19
        tuned = wf.tune_kssd_parameters(
            args.sketch_by_file, args.kmer_size is not None, args.input,
            args.threads, args.min_len, False, kmer_size, args.eps,
            args.drlevel)
        from ..io.fasta import read_file_list
        from ..sketch.kssd import sketch_files_kssd, sketch_sequences_kssd
        if args.sketch_by_file:
            ss, kp = sketch_files_kssd(read_file_list(args.input),
                                       args.min_len, tuned.kmer_size,
                                       args.drlevel, args.threads)
        else:
            ss, kp = sketch_sequences_kssd(args.input, args.min_len,
                                           tuned.kmer_size, args.drlevel,
                                           args.threads)
        # from-genome: the reference clusters with the RAW (tuned) CLI k
        # even though KSSD sketched with the rounded-even 2*half_k
        # (KssdDBSCAN receives kmerSize verbatim, sub_command.cpp:3281) —
        # a replicated quirk, visible only for odd -k
        cluster_kmer = tuned.kmer_size
    print(f"-----the size of sketches (genomes) is: {len(ss)}",
          file=sys.stderr)
    result = dbscan_cluster(ss.hashes, args.eps, args.minpts, cluster_kmer,
                            knn_k=args.knn_k, max_posting=args.max_posting,
                            use_device=args.use_device)
    write_dbscan_result(result, ss, args.output, args.eps, args.minpts)
    print(f"-----write the cluster result into: {args.output}",
          file=sys.stderr)
    print(f"-----clusters: {result.num_clusters}, noise: "
          f"{result.num_noise}", file=sys.stderr)
    return 0


def _minhash_main(args) -> int:
    """DBSCAN over MinHash sketches: the reference's latent MinHashDBSCAN
    engine (dbscan.cpp:987-1097), golden byte-identical via the
    minhash-dbscan-oracle driver.  Sketching follows the reference's
    default convention (use_inverted_index=true keeps input-order IDs,
    SketchInfo.cpp:982-989)."""
    from ..sketch.minhash import (MinHashParams, sketch_files_minhash,
                                  sketch_sequences_minhash)
    from ..cluster.dbscan import minhash_dbscan_cluster
    from ..io.fasta import read_file_list

    print("-----Using DBSCAN clustering (MinHash)", file=sys.stderr)
    print(f"-----DBSCAN parameters: eps={args.eps}, minPts={args.minpts}",
          file=sys.stderr)
    kmer_size = args.kmer_size or 21
    sketch_size = args.sketch_size or 1000
    is_containment = args.contain_compress is not None
    p = MinHashParams(kmer_size=kmer_size, sketch_size=sketch_size,
                      is_containment=is_containment,
                      contain_compress=args.contain_compress or 1000)
    if args.sketch_by_file:
        ss = sketch_files_minhash(read_file_list(args.input), args.min_len,
                                  p, args.threads)
    else:
        ss = sketch_sequences_minhash(args.input, args.min_len, p,
                                      args.threads)
    print(f"-----the size of sketches (genomes) is: {len(ss)}",
          file=sys.stderr)
    result = minhash_dbscan_cluster(ss.hashes, args.eps, args.minpts,
                                    kmer_size, is_containment=is_containment)
    write_dbscan_result(result, ss, args.output, args.eps, args.minpts)
    print(f"-----write the cluster result into: {args.output}",
          file=sys.stderr)
    print(f"-----clusters: {result.num_clusters}, noise: "
          f"{result.num_noise}", file=sys.stderr)
    return 0


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
