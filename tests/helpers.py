"""Test data generators (semantics of reference benchmark/simulate tools)."""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import List


def rand_seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng: random.Random, s: str, rate: float) -> str:
    out = []
    for c in s:
        if rng.random() < rate:
            out.append(rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


@dataclass
class GenomeFixture:
    files: List[str]
    labels: List[int]       # ground-truth cluster per file
    list_file: str          # file-list path (-l input)
    single_fasta: str       # all sequences in one FASTA (by-sequence input)


def write_fasta(path: str, name: str, comment: str, seq: str) -> None:
    with open(path, "w") as f:
        f.write(f">{name} {comment}\n")
        for k in range(0, len(seq), 80):
            f.write(seq[k:k + 80] + "\n")


def make_clustered_genomes(tmpdir, n_clusters=4, per_cluster=5, length=30000,
                           mutation=0.01, seed=7, fragment=False,
                           length_jitter=0) -> GenomeFixture:
    rng = random.Random(seed)
    files, labels, seqs = [], [], []
    for ci in range(n_clusters):
        base = rand_seq(rng, length)
        for m in range(per_cluster):
            s = mutate(rng, base, mutation)
            if length_jitter:
                # varied per-genome lengths -> varied sketch sizes ->
                # effectively unique distances (no mass-tie degeneracy)
                s = s[:length - rng.randint(0, length_jitter)]
            if fragment and m > 0:
                # containment test: random-length fragment of the seed
                frag_len = rng.randint(length // 3, length)
                start = rng.randint(0, length - frag_len)
                s = s[start:start + frag_len]
            fp = os.path.join(tmpdir, f"g{ci}_{m}.fna")
            write_fasta(fp, f"genome_{ci}_{m}", f"cluster{ci}", s)
            files.append(fp)
            labels.append(ci)
            seqs.append((f"genome_{ci}_{m}", f"cluster{ci}", s))
    list_file = os.path.join(tmpdir, "list.txt")
    with open(list_file, "w") as f:
        f.write("\n".join(files) + "\n")
    single = os.path.join(tmpdir, "all.fna")
    with open(single, "w") as f:
        for name, comment, s in seqs:
            f.write(f">{name} {comment}\n")
            for k in range(0, len(s), 80):
                f.write(s[k:k + 80] + "\n")
    return GenomeFixture(files=files, labels=labels, list_file=list_file,
                         single_fasta=single)


def clusters_to_labels(clusters, n):
    lab = [-1] * n
    for ci, members in enumerate(clusters):
        for m in members:
            lab[m] = ci
    return lab


def same_partition(labels_a, labels_b) -> bool:
    """True iff the two labelings induce the same partition."""
    from collections import defaultdict
    ga = defaultdict(set)
    gb = defaultdict(set)
    for i, l in enumerate(labels_a):
        ga[l].add(i)
    for i, l in enumerate(labels_b):
        gb[l].add(i)
    return set(map(frozenset, ga.values())) == set(map(frozenset, gb.values()))


def parse_cluster_file(path: str):
    """Parse a .cluster text file into [[global_id, ...], ...]."""
    clusters, cur = [], None
    with open(path) as f:
        for line in f:
            if line.startswith("the cluster"):
                if cur is not None:
                    clusters.append(cur)
                cur = []
            elif line.startswith("\t") and cur is not None:
                cur.append(int(line.split("\t")[2]))
    if cur is not None:
        clusters.append(cur)
    return clusters
