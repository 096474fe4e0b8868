#!/usr/bin/env python
"""Download genome sets from NCBI RefSeq / GenBank for benchmarking.

Equivalent of the reference's benchmark/download/ tools
(download_refseq.py, download_genbank.sh — see
/root/reference/benchmark/download/README.md): fetches the
assembly_summary.txt for a clade, derives per-assembly FASTA URLs, and
downloads them resumably with gzip-integrity checking.  Re-designed as one
small stdlib-only tool instead of the vendored Bonsai script.

Usage:
    python scripts/download_genomes.py bacteria --source refseq -o refseqDir
    python scripts/download_genomes.py bacteria --source genbank -o genbankDir
    python scripts/download_genomes.py --help

After downloading, build the input list with scripts/generate_list.py.
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys
import urllib.request
from concurrent.futures import ThreadPoolExecutor

CLADES = ["archaea", "bacteria", "fungi", "viral", "plant", "protozoa",
          "human", "vertebrate_mammalian", "vertebrate_other"]
BASE = "https://ftp.ncbi.nlm.nih.gov/genomes"


def summary_url(source: str, clade: str) -> str:
    return f"{BASE}/{source}/{clade}/assembly_summary.txt"


def parse_summary(text: str):
    """Yield (accession, ftp_path) from an assembly_summary.txt body."""
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        cols = line.split("\t")
        if len(cols) > 19 and cols[19].startswith(("ftp://", "https://")):
            yield cols[0], cols[19]


def fasta_url(ftp_path: str) -> str:
    """Per-assembly genomic FASTA URL: <path>/<basename>_genomic.fna.gz."""
    base = ftp_path.rstrip("/").rsplit("/", 1)[-1]
    url = f"{ftp_path.rstrip('/')}/{base}_genomic.fna.gz"
    return url.replace("ftp://", "https://", 1)


def is_valid_gzip(path: str) -> bool:
    """Cheap integrity check: header magic + decodable first block (the
    reference recommends validating compressed downloads before use)."""
    try:
        with gzip.open(path, "rb") as f:
            f.read(1 << 16)
        return True
    except (OSError, EOFError):
        return False


def fetch(url: str, dest: str, retries: int = 3) -> bool:
    if os.path.exists(dest) and is_valid_gzip(dest):
        return True
    for _ in range(retries):
        try:
            with urllib.request.urlopen(url, timeout=120) as r, \
                    open(dest + ".part", "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(dest + ".part", dest)
            if is_valid_gzip(dest):
                return True
            os.remove(dest)
        except OSError as e:
            print(f"retrying {url}: {e}", file=sys.stderr)
    return False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("clades", nargs="+", choices=CLADES + ["all"])
    ap.add_argument("--source", choices=["refseq", "genbank"],
                    default="refseq")
    ap.add_argument("-o", "--output-dir", default="genomes")
    ap.add_argument("-j", "--jobs", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0,
                    help="download at most this many assemblies per clade")
    args = ap.parse_args(argv)
    clades = CLADES if "all" in args.clades else args.clades
    os.makedirs(args.output_dir, exist_ok=True)
    failed = 0
    for clade in clades:
        with urllib.request.urlopen(summary_url(args.source, clade),
                                    timeout=120) as r:
            entries = list(parse_summary(r.read().decode("utf-8", "replace")))
        if args.limit:
            entries = entries[:args.limit]
        print(f"{clade}: {len(entries)} assemblies", file=sys.stderr)
        outdir = os.path.join(args.output_dir, clade)
        os.makedirs(outdir, exist_ok=True)
        with ThreadPoolExecutor(max_workers=args.jobs) as ex:
            jobs = []
            for _acc, path in entries:
                url = fasta_url(path)
                dest = os.path.join(outdir, url.rsplit("/", 1)[-1])
                jobs.append(ex.submit(fetch, url, dest))
            failed += sum(not j.result() for j in jobs)
    if failed:
        print(f"{failed} downloads failed", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
