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

    if not args.is_fast:
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
    print(f"-----the size of sketches (genomes) is: {len(ss)}",
          file=sys.stderr)
    result = dbscan_cluster(ss.hashes, args.eps, args.minpts, kp.kmer_size,
                            knn_k=args.knn_k, max_posting=args.max_posting,
                            use_device=args.use_device)
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
