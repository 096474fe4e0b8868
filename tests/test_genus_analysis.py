"""Genus/species cluster-relationship analysis (evaltools/genus_analysis)
golden vs the REFERENCE benchmark/analysis scripts — they are pure Python,
so we run them directly on a synthetic fixture and assert byte-identical
TSV outputs (reference analyze_genus_pair_clusters.py and
analyze_genus_species_relationships.py; the plot port is checked for a
valid PNG render)."""

import csv
import os
import subprocess
import sys

import pytest

REF_DIR = "/root/reference/benchmark/analysis"


def _write_fixture(tmp_path):
    """3 genera x several species over 6 clusters with merged, pure,
    suspect-bearing and no-groundtruth members."""
    # accession scheme: GCF_0000xx.1
    def acc(i):
        return f"GCF_{i:06d}.1"

    clusters = {
        0: [acc(1), acc(2), acc(3), acc(4)],          # pure genus 100
        1: [acc(5), acc(6), acc(10), acc(11)],        # merged 100+200
        2: [acc(12), acc(13), acc(14), acc(15), acc(16), acc(17),
            acc(18), acc(19), acc(20), acc(21), acc(22)],  # big mixed
        3: [acc(30)],                                 # singleton genus 300
        4: [acc(31), acc(32), acc(99)],               # 99 has no truth
        5: [acc(33), acc(34)],                        # pure genus 200
    }
    cluster_file = tmp_path / "toy.cluster"
    with open(cluster_file, "w") as fp:
        fp.write("# Clustering threshold: 0.050000\n#\n")
        for cid, mem in clusters.items():
            fp.write(f"the cluster {cid} is: \n")
            for li, a in enumerate(mem):
                fp.write(f"\t{li:5d}\t{li:6d}\t{1000:12d}nt\t"
                         f"/data/{a}_genomic.fna.gz\t{a}\tx\n")
            fp.write("\n")

    genus_of = {1: 100, 2: 100, 3: 100, 4: 100, 5: 100, 6: 100,
                10: 200, 11: 200, 12: 100, 13: 100, 14: 100, 15: 100,
                16: 200, 17: 200, 18: 200, 19: 200, 20: 300, 21: 300,
                22: 300, 30: 300, 31: 100, 32: 200, 33: 200, 34: 200}
    species_of = {1: 1001, 2: 1001, 3: 1001, 4: 1002, 5: 1002, 6: 1003,
                  10: 2001, 11: 2001, 12: 1001, 13: 1001, 14: 1002,
                  15: 1002, 16: 2001, 17: 2001, 18: 2002, 19: 2002,
                  20: 3001, 21: 3001, 22: 3002, 30: 3001, 31: 1003,
                  32: 2002, 33: 2001, 34: 2002}
    gname = {100: "Alpha", 200: "Beta", 300: "Gamma"}
    sname = {1001: "Alpha one", 1002: "Alpha two", 1003: "Alpha three",
             2001: "Beta one", 2002: "Beta two", 3001: "Gamma one",
             3002: "Gamma two"}

    genus_tsv = tmp_path / "genus.tsv"
    with open(genus_tsv, "w", newline="") as fp:
        w = csv.writer(fp, delimiter="\t")
        w.writerow(["assembly_accession", "genus_id", "organism_name"])
        for i, g in sorted(genus_of.items()):
            w.writerow([acc(i), g, f"{gname[g]} sp{i}"])
    species_tsv = tmp_path / "species.tsv"
    with open(species_tsv, "w", newline="") as fp:
        w = csv.writer(fp, delimiter="\t")
        w.writerow(["assembly_accession", "species_taxid", "organism_name"])
        for i, s in sorted(species_of.items()):
            w.writerow([acc(i), s, f"{sname[s]} strain{i}"])
    return cluster_file, genus_tsv, species_tsv


def _run(cmd, cwd=None):
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=cwd)
    assert r.returncode == 0, f"{cmd}\n{r.stdout}\n{r.stderr}"
    return r


def _diff_dir(ref_dir, our_dir, names):
    for name in names:
        ref = (ref_dir / name).read_bytes()
        ours = (our_dir / name).read_bytes()
        assert ref == ours, f"{name} differs from the reference script"


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference analysis scripts unavailable")
def test_pair_analysis_byte_identical(tmp_path):
    cluster_file, genus_tsv, _ = _write_fixture(tmp_path)
    ref_out = tmp_path / "ref_pair"
    our_out = tmp_path / "our_pair"
    argsc = ["--cluster-file", str(cluster_file), "--genus-groundtruth",
             str(genus_tsv), "--g1-id", "100", "--g2-id", "200",
             "--g1-name", "Alpha", "--g2-name", "Beta"]
    _run([sys.executable,
          os.path.join(REF_DIR, "analyze_genus_pair_clusters.py"),
          *argsc, "--output-dir", str(ref_out)])
    _run([sys.executable, "-m",
          "rabbittclust_tpu.evaltools.genus_analysis", "pair",
          *argsc, "--output-dir", str(our_out)],
         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    _diff_dir(ref_out, our_out,
              ["alpha_beta_cluster_distribution.tsv",
               "alpha_beta_cluster_distribution_summary.tsv"])


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference analysis scripts unavailable")
def test_relationships_byte_identical(tmp_path):
    cluster_file, genus_tsv, species_tsv = _write_fixture(tmp_path)
    ref_out = tmp_path / "ref_rel"
    our_out = tmp_path / "our_rel"
    argsc = ["--cluster", str(cluster_file), "--species-groundtruth",
             str(species_tsv), "--genus-groundtruth", str(genus_tsv),
             "--top-k", "5"]
    _run([sys.executable,
          os.path.join(REF_DIR, "analyze_genus_species_relationships.py"),
          *argsc, "--output-dir", str(ref_out)])
    _run([sys.executable, "-m",
          "rabbittclust_tpu.evaltools.genus_analysis", "relationships",
          *argsc, "--output-dir", str(our_out)],
         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    _diff_dir(ref_out, our_out,
              ["top_genus_pairs.tsv", "boundary_conflicts.tsv",
               "minority_outliers.tsv", "suspects.tsv",
               "cluster_summary.tsv"])


def test_plot_renders_png(tmp_path):
    cluster_file, genus_tsv, _ = _write_fixture(tmp_path)
    out = tmp_path / "pair"
    _run([sys.executable, "-m",
          "rabbittclust_tpu.evaltools.genus_analysis", "pair",
          "--cluster-file", str(cluster_file), "--genus-groundtruth",
          str(genus_tsv), "--g1-id", "100", "--g2-id", "200",
          "--g1-name", "Alpha", "--g2-name", "Beta",
          "--output-dir", str(out)],
         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    png = tmp_path / "pair.png"
    _run([sys.executable, "-m",
          "rabbittclust_tpu.evaltools.genus_analysis", "plot",
          "--input", str(out / "alpha_beta_cluster_distribution.tsv"),
          "--output", str(png), "--g1-name", "Alpha",
          "--g2-name", "Beta"],
         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    data = png.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 10000
