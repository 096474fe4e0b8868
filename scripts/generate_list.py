#!/usr/bin/env python
"""Build an absolute-path genome list file from downloaded genome dirs.

Equivalent of the reference's benchmark/generateList.sh: optionally
decompress .fna.gz files, then write one absolute FASTA path per line —
the `-l -i <list>` input of clust-mst / clust-greedy.

Usage:
    python scripts/generate_list.py genomes/bacteria [...dirs] -o refList
    python scripts/generate_list.py genomes --decompress -o refList
"""

from __future__ import annotations

import argparse
import gzip
import os
import shutil
import sys

EXTS = (".fna", ".fa", ".fasta")


def decompress(path: str) -> str:
    out = path[:-3]
    with gzip.open(path, "rb") as src, open(out + ".part", "wb") as dst:
        shutil.copyfileobj(src, dst, 1 << 20)
    os.replace(out + ".part", out)
    os.remove(path)
    return out


def collect(dirs, do_decompress: bool):
    paths = []
    for d in dirs:
        for root, _sub, files in os.walk(d):
            for name in sorted(files):
                p = os.path.join(root, name)
                if do_decompress and name.endswith(tuple(
                        e + ".gz" for e in EXTS)):
                    p = decompress(p)
                    name = os.path.basename(p)
                if name.endswith(EXTS) or name.endswith(tuple(
                        e + ".gz" for e in EXTS)):
                    paths.append(os.path.abspath(p))
    return paths


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("-o", "--output", default="refList")
    ap.add_argument("--decompress", action="store_true",
                    help="gunzip .fna.gz files in place first (the reference "
                         "recommends decompressed inputs)")
    args = ap.parse_args(argv)
    paths = collect(args.dirs, args.decompress)
    with open(args.output, "w") as f:
        for p in paths:
            f.write(p + "\n")
    print(f"wrote {len(paths)} paths to {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
