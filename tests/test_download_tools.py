"""Offline tests for the benchmark data-acquisition tools
(scripts/download_genomes.py, scripts/generate_list.py — equivalents of
reference benchmark/download/ + generateList.sh)."""

import gzip
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_summary_and_fasta_url():
    dg = _load("download_genomes")
    cols = [""] * 20
    cols[0] = "GCF_000005845.2"
    cols[19] = ("https://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/005/845/"
                "GCF_000005845.2_ASM584v2")
    body = "#h1\n#h2\n" + "\t".join(cols) + "\nshort line\n"
    entries = list(dg.parse_summary(body))
    assert entries == [(cols[0], cols[19])]
    assert dg.fasta_url(cols[19]).endswith(
        "GCF_000005845.2_ASM584v2/GCF_000005845.2_ASM584v2_genomic.fna.gz")
    # genbank-style ftp:// paths are rewritten to https
    assert dg.fasta_url("ftp://x/y/GCA_1_v1").startswith("https://x/y/")


def test_gzip_validity_check(tmp_path):
    dg = _load("download_genomes")
    good = tmp_path / "g.fna.gz"
    with gzip.open(good, "wb") as f:
        f.write(b">s\nACGT\n")
    bad = tmp_path / "b.fna.gz"
    bad.write_bytes(b"\x1f\x8bnot really gzip data")
    assert dg.is_valid_gzip(str(good))
    assert not dg.is_valid_gzip(str(bad))


def test_generate_list_collect_and_decompress(tmp_path):
    gl = _load("generate_list")
    d = tmp_path / "bacteria"
    d.mkdir()
    (d / "a.fna").write_text(">a\nACGT\n")
    with gzip.open(d / "b.fna.gz", "wb") as f:
        f.write(b">b\nTTTT\n")
    (d / "notes.txt").write_text("ignored")
    out = tmp_path / "refList"
    rc = gl.main([str(d), "--decompress", "-o", str(out)])
    assert rc == 0
    paths = out.read_text().splitlines()
    assert [os.path.basename(p) for p in sorted(paths)] == ["a.fna", "b.fna"]
    assert all(os.path.isabs(p) and os.path.exists(p) for p in paths)
    assert not (d / "b.fna.gz").exists()  # decompressed in place
