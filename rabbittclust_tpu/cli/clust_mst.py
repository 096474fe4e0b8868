"""clust-mst entry point (reference src/main.cpp:524-651 dispatch)."""

from __future__ import annotations

import sys

from .common import base_parser, make_output_options, validate_common
from .. import workflows as wf


def main(argv=None) -> int:
    p = base_parser("mst")
    args = p.parse_args(argv)
    validate_common(args, "mst")
    opts = make_output_options(args, "mst")
    is_containment = args.contain_compress is not None
    module = "mst"

    if args.sketch_func in ("WMH", "HLL", "OMH"):
        # extra sketch types: dense all-pairs modifyMST path (latent in the
        # reference); only fresh genome input is supported
        if args.is_fast or args.repdb_path or args.presketched \
                or args.premsted or args.append:
            print("ERROR: --sketch-func WMH/HLL/OMH supports fresh genome "
                  "input only (no --fast/--db/--presketched/--premsted/"
                  "--append)", file=sys.stderr)
            return 1
        if not args.input:
            print("ERROR: -i/--input needed", file=sys.stderr)
            return 1
        from ..workflows_extra import clust_from_genomes_extra
        clust_from_genomes_extra(
            args.input, args.output, args.sketch_by_file, args.sketch_func,
            args.kmer_size or 21, args.threshold, args.min_len, opts)
        return 0

    if args.repdb_path:
        from .repdb import run_mst_repdb
        return run_mst_repdb(args, opts)

    if getattr(args, "multihost", None):
        return run_multihost(args, is_containment, "mst")

    if args.is_fast:
        if args.build_db:
            if not args.sketch_by_file:
                print("ERROR: --buildDB currently requires -l/--list",
                      file=sys.stderr)
                return 1
            if not args.input:
                print("ERROR: --buildDB requires -i/--input", file=sys.stderr)
                return 1
            from ..workflows_db import build_kssd_db_fast
            build_kssd_db_fast(args.input, args.build_db,
                               args.kmer_size is not None, is_containment,
                               args.min_len, args.kmer_size or 21,
                               args.drlevel, args.threads)
            return 0
        if args.premsted and not args.append:
            wf.clust_from_mst_fast(args.premsted, args.output, args.threshold,
                                   args.threads, opts)
            return 0
        if args.presketched and not args.append:
            wf.clust_from_sketch_fast(args.presketched, args.output,
                                      args.threshold, args.threads,
                                      is_containment, opts, module)
            return 0
        if args.append and not (args.presketched or args.premsted):
            print("ERROR: option --append, option --presketched or "
                  "--premsted needed", file=sys.stderr)
            return 1
        if args.append:
            wf.append_clust_mst_fast(args.presketched or args.premsted,
                                     args.append, args.output,
                                     args.sketch_by_file, is_containment,
                                     args.min_len, args.threshold,
                                     args.threads, opts)
            return 0
        tuned = wf.tune_kssd_parameters(
            args.sketch_by_file, args.kmer_size is not None, args.input,
            args.threads, args.min_len, is_containment,
            args.kmer_size or 19, args.threshold, args.drlevel)
        wf.clust_from_genome_fast(
            args.input, args.output, None, args.sketch_by_file,
            is_containment, tuned.kmer_size, args.threshold, args.drlevel,
            args.min_len, args.threads, opts, module)
        return 0

    # MinHash (default) path
    if args.premsted and not args.append:
        wf.clust_from_mst_fast(args.premsted, args.output, args.threshold,
                               args.threads, opts, kssd=False)
        return 0
    if args.presketched and not args.append:
        wf.clust_from_sketches(args.presketched, args.output, args.threshold,
                               args.threads, opts, module)
        return 0
    if args.append:
        if not (args.presketched or args.premsted):
            print("ERROR: option --append, option --presketched or "
                  "--premsted needed", file=sys.stderr)
            return 1
        from ..workflows_minhash_append import append_clust_mst
        append_clust_mst(args.presketched or args.premsted, args.append,
                         args.output, args.sketch_by_file, args.min_len,
                         args.threshold, args.threads, opts)
        return 0
    tuned = wf.tune_parameters(
        args.sketch_by_file, args.kmer_size is not None, args.input,
        args.threads, args.min_len, is_containment,
        args.sketch_size is not None, args.kmer_size or 21, args.threshold,
        args.contain_compress or 1000, args.sketch_size or 1000)
    wf.clust_from_genomes(
        args.input, args.output, None, args.sketch_by_file, tuned.kmer_size,
        args.sketch_size or 1000, args.threshold, tuned.is_containment,
        tuned.contain_compress, args.min_len, args.threads, opts, module)
    return 0


def run_multihost(args, is_containment: bool, module: str) -> int:
    """Shared --multihost dispatch for clust-mst/clust-greedy/clust-leiden
    (KSSD fresh-genome input)."""
    if not args.is_fast:
        print("ERROR: --multihost requires --fast (KSSD sketches)",
              file=sys.stderr)
        return 1
    if not args.input:
        print("ERROR: --multihost requires -i/--input genomes",
              file=sys.stderr)
        return 1
    if args.presketched or getattr(args, "premsted", None) or args.append:
        print("ERROR: --multihost supports fresh genome input only",
              file=sys.stderr)
        return 1
    from ..workflows_dist import clust_mst_multihost, parse_multihost_spec
    coord, n_proc, pid = parse_multihost_spec(args.multihost)
    import os
    vdev = os.environ.get("RTC_VIRTUAL_CPU_DEVICES")
    # clust-dbscan spells its distance threshold --eps
    threshold = args.eps if module == "dbscan" else args.threshold
    clust_mst_multihost(
        args.input, args.output, coord, n_proc, pid,
        sketch_by_file=args.sketch_by_file, is_containment=is_containment,
        kmer_size=args.kmer_size, threshold=threshold,
        drlevel=args.drlevel, min_len=args.min_len, threads=args.threads,
        module=module, min_pts=getattr(args, "minpts", 5),
        max_posting=getattr(args, "max_posting", 0),
        resolution=getattr(args, "resolution", 1.0),
        use_leiden=not getattr(args, "use_louvain", False),
        knn_k=getattr(args, "knn_k", 0),
        virtual_cpu_devices=int(vdev) if vdev else None)
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
