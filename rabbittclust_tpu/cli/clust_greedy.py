"""clust-greedy entry point (reference src/main.cpp:291-390 dispatch)."""

from __future__ import annotations

import sys

from .common import base_parser, make_output_options, validate_common
from .. import workflows as wf


def main(argv=None) -> int:
    p = base_parser("greedy")
    args = p.parse_args(argv)
    validate_common(args, "greedy")
    opts = make_output_options(args, "greedy")
    is_containment = args.contain_compress is not None
    module = "greedy"

    if args.sketch_func in ("WMH", "HLL", "OMH"):
        # reference greedy explicitly rejects these (greedy.cpp:313-317)
        print("can only support MinHash and KSSD with greedy incremental "
              "clust", file=sys.stderr)
        return 1

    if args.repdb_path:
        from .repdb import run_greedy_repdb
        return run_greedy_repdb(args, opts)

    if getattr(args, "multihost", None):
        from .clust_mst import run_multihost
        return run_multihost(args, is_containment, "greedy")

    if args.is_fast and args.presketched and not args.append:
        wf.clust_from_sketch_fast(args.presketched, args.output,
                                  args.threshold, args.threads,
                                  is_containment, opts, module)
        return 0
    if args.append and not args.presketched:
        print("ERROR option --append, option --presketched needed",
              file=sys.stderr)
        return 1
    if args.append and args.presketched:
        if args.is_fast:
            wf.append_clust_greedy_fast(args.presketched, args.append,
                                        args.output, args.sketch_by_file,
                                        args.min_len, args.threshold,
                                        args.threads, opts)
        else:
            from ..workflows_minhash_append import append_clust_greedy
            append_clust_greedy(args.presketched, args.append, args.output,
                                args.sketch_by_file, args.min_len,
                                args.threshold, args.threads, opts)
        return 0
    if args.presketched and not args.is_fast:
        wf.clust_from_sketches(args.presketched, args.output, args.threshold,
                               args.threads, opts, module)
        return 0
    if args.is_fast:
        tuned = wf.tune_kssd_parameters(
            args.sketch_by_file, args.kmer_size is not None, args.input,
            args.threads, args.min_len, is_containment,
            args.kmer_size or 19, args.threshold, args.drlevel)
        wf.clust_from_genome_fast(
            args.input, args.output, None, args.sketch_by_file,
            is_containment, tuned.kmer_size, args.threshold, args.drlevel,
            args.min_len, args.threads, opts, module)
        return 0
    tuned = wf.tune_parameters(
        args.sketch_by_file, args.kmer_size is not None, args.input,
        args.threads, args.min_len, is_containment,
        args.sketch_size is not None, args.kmer_size or 21, args.threshold,
        args.contain_compress or 1000, args.sketch_size or 1000,
        greedy_default_containment=True)
    wf.clust_from_genomes(
        args.input, args.output, None, args.sketch_by_file, tuned.kmer_size,
        args.sketch_size or 1000, args.threshold, tuned.is_containment,
        tuned.contain_compress, args.min_len, args.threads, opts, module)
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
