"""Golden parity for the taxonomy-analysis evaluation tools.

Reference oracles compiled from benchmark/evaluation/src (precalLabel,
calPurity, analysisPurity, checkTaxonomyStatus, mapGenome; boost::split
replaced by the functional stub in tests/reference_oracle/boost/).  Test
data is constructed tie-free (distinct cluster sizes, distinct species
group sizes) so the reference's unordered-map iteration order cannot
influence its output, making byte-comparison meaningful.
"""

import os
import subprocess
import sys

import pytest

from tests.test_golden_reference import ORACLE_DIR, BUILD_SCRIPT, same_bytes

EVAL_TOOLS = ("precalLabel", "calPurity", "analysisPurity",
              "checkTaxonomyStatus", "mapGenome")


@pytest.fixture(scope="module")
def eval_oracle():
    tools = {t: os.path.join(ORACLE_DIR, t) for t in EVAL_TOOLS}
    if not all(os.path.exists(p) for p in tools.values()):
        if not os.path.exists("/root/reference/benchmark/evaluation/src"):
            pytest.skip("reference evaluation sources unavailable")
        r = subprocess.run(["bash", BUILD_SCRIPT], capture_output=True,
                           text=True)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return tools


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    """Synthetic clusters + taxonomy: 4 clusters of sizes 5/4/2/1 over
    species 901-904; genus 801 holds 901, genus 802 holds 902+904 (so one
    impure cluster is cross-genus -> .diff, one same-genus -> .same)."""
    tmp = tmp_path_factory.mktemp("evalgold")

    # accession -> species taxid; cluster layout (first member = rep)
    clusters = [
        # cross-genus impure: dominant 3x901 + minority 2x902
        [("GCF_000001.1", 901), ("GCF_000002.1", 901), ("GCF_000003.1", 901),
         ("GCF_000004.1", 902), ("GCF_000005.1", 902)],
        # same-genus impure: dominant 3x902 + minority 1x904 (both genus 802)
        [("GCF_000006.1", 902), ("GCF_000007.1", 902), ("GCF_000008.1", 902),
         ("GCF_000009.1", 904)],
        # pure pair
        [("GCF_000010.1", 903), ("GCF_000011.1", 903)],
        # singleton whose label 901 is defeated by cluster 0 -> bad label -1
        [("GCF_000012.1", 901)],
    ]

    gt = tmp / "ground.truth"
    with gt.open("w") as f:
        f.write("assembly_accession\tspecies_taxid\torganism_name\n")
        seen = set()
        for members in clusters:
            for acc, taxid in members:
                f.write(f"{acc}\t{taxid}\tOrganism species{taxid} strain\n")
                seen.add(taxid)

    clust = tmp / "result.cluster"
    with clust.open("w") as f:
        gid = 0
        for ci, members in enumerate(clusters):
            f.write(f"the cluster {ci} is: \n")
            for mi, (acc, _) in enumerate(members):
                fn = f"/data/{acc}_ASM{gid}v1.fna"
                f.write(f"\t{mi:5d}\t{gid:6d}\t{25000 + gid:12d}nt\t"
                        f"{fn:>20s}\t{'seq_' + acc:>20s}\tOrganism x\n")
                gid += 1

    nodes = tmp / "nodes.dmp"
    rows = [(1, 1, "no rank"), (601, 1, "order"), (701, 601, "family"),
            (801, 701, "genus"), (802, 701, "genus"),
            (901, 801, "species"), (902, 802, "species"),
            (903, 801, "species"), (904, 802, "species")]
    with nodes.open("w") as f:
        for tid, parent, rank in rows:
            f.write(f"{tid}\t|\t{parent}\t|\t{rank}\t|\tx\t|\n")

    ani = tmp / "ANI_report.txt"
    statuses = ["species-match", "genus-match", "species-match", "mismatch",
                "species-match", "low-coverage", "species-match",
                "species-match", "subspecies-match", "species-match",
                "species-match", "species-match"]
    with ani.open("w") as f:
        f.write("genbank-accession\tspecies-taxid\tbest-match-species-taxid"
                "\tbest-match-status\texcluded-from-refseq\tqcoverage"
                "\tscoverage\n")
        i = 0
        for members in clusters:
            for acc, taxid in members:
                bm = taxid if statuses[i] == "species-match" else taxid + 10
                efr = "na" if i % 3 else "derived-from-metagenome"
                f.write(f"{acc}\t{taxid}\t{bm}\t{statuses[i]}\t{efr}"
                        f"\t{90 + i}.5\t{80 + i}.25\n")
                i += 1
    return {"dir": tmp, "ground_truth": str(gt), "cluster": str(clust),
            "nodes": str(nodes), "ani": str(ani)}


def _run_ref(tool_path, args, cwd):
    r = subprocess.run([tool_path, *args], cwd=cwd, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-1500:]


def _run_ours(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-m",
                        "rabbittclust_tpu.evaltools.taxonomy", *args],
                       cwd=cwd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-1500:]


def test_precal_label_byte_identical(eval_oracle, scenario, tmp_path):
    ref_out = tmp_path / "ref.f1"
    our_out = tmp_path / "our.f1"
    _run_ref(eval_oracle["precalLabel"],
             ["RabbitTClust", "-l", scenario["ground_truth"],
              scenario["cluster"], str(ref_out)], str(tmp_path))
    _run_ours(["precal-label", "-l", scenario["ground_truth"],
               scenario["cluster"], str(our_out)], str(tmp_path))
    assert same_bytes(str(ref_out), str(our_out))
    assert same_bytes(str(ref_out) + ".humanReadable",
                      str(our_out) + ".humanReadable")
    # the defeated singleton got a fresh negative label
    ours_row = (our_out.read_text().splitlines())[0].split()
    assert ours_row[-1] == "-1"


def test_cal_purity_byte_identical(eval_oracle, scenario, tmp_path):
    ref_out = tmp_path / "ref.purity"
    our_out = tmp_path / "our.purity"
    _run_ref(eval_oracle["calPurity"],
             ["-l", scenario["ground_truth"], scenario["cluster"],
              str(ref_out)], str(tmp_path))
    _run_ours(["cal-purity", "-l", scenario["ground_truth"],
               scenario["cluster"], str(our_out)], str(tmp_path))
    assert same_bytes(str(ref_out), str(our_out))
    for ext in (".accession.unpurity", ".accession.purity"):
        assert same_bytes(str(ref_out) + ext, str(our_out) + ext), ext


def test_analysis_purity_byte_identical(eval_oracle, scenario, tmp_path):
    # feed both sides the SAME calPurity .accession.unpurity file
    acc = tmp_path / "p.purity"
    _run_ref(eval_oracle["calPurity"],
             ["-l", scenario["ground_truth"], scenario["cluster"],
              str(acc)], str(tmp_path))
    unpurity = str(acc) + ".accession.unpurity"
    ref_out = tmp_path / "ref.ana"
    our_out = tmp_path / "our.ana"
    _run_ref(eval_oracle["analysisPurity"],
             [scenario["nodes"], unpurity, str(ref_out)], str(tmp_path))
    _run_ours(["analysis-purity", scenario["nodes"], unpurity,
               str(our_out)], str(tmp_path))
    for ext in (".same", ".diff", ".same0"):
        assert same_bytes(str(ref_out) + ext, str(our_out) + ext), ext
    # the scenario must exercise both branches
    assert len(open(str(ref_out) + ".diff").read().splitlines()) > 1
    assert len(open(str(ref_out) + ".same").read().splitlines()) > 1


def test_check_taxonomy_status_byte_identical(eval_oracle, scenario,
                                              tmp_path):
    acc = tmp_path / "p.purity"
    _run_ref(eval_oracle["calPurity"],
             ["-l", scenario["ground_truth"], scenario["cluster"],
              str(acc)], str(tmp_path))
    ana = tmp_path / "p.ana"
    _run_ref(eval_oracle["analysisPurity"],
             [scenario["nodes"], str(acc) + ".accession.unpurity",
              str(ana)], str(tmp_path))
    ref_out = tmp_path / "ref.check"
    our_out = tmp_path / "our.check"
    _run_ref(eval_oracle["checkTaxonomyStatus"],
             [scenario["ani"], str(ana) + ".diff", str(ref_out)],
             str(tmp_path))
    _run_ours(["check-status", scenario["ani"], str(ana) + ".diff",
               str(our_out)], str(tmp_path))
    for ext in (".species_taxid.check", ".best_match_species_taxid.check",
                ".exclude_from_refseq.check", ".best_match_status.check",
                ".perfect.check", ".coverage.check"):
        assert same_bytes(str(ref_out) + ext, str(our_out) + ext), ext


def test_map_genome_byte_identical(eval_oracle, tmp_path):
    # uniform-type files (single map entry -> deterministic output order);
    # exercises the UNVERIFIED skip and trailing-comma strip
    f1 = tmp_path / "a.fna"
    f1.write_text(">s1 Escherichia coli, strain K12\nACGTACGT\n"
                  ">s2 UNVERIFIED: Escherichia coli, more words\nACGTACGT\n")
    f2 = tmp_path / "b.fna"
    f2.write_text(">t1 Salmonella enterica subsp\nACGTACGT\n")
    lst = tmp_path / "list.txt"
    lst.write_text(f"{f1}\n{f2}\n")
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    _run_ref(eval_oracle["mapGenome"], [str(lst)], str(ref_d))
    _run_ours(["map-genome", str(lst)], str(our_d))
    assert same_bytes(str(ref_d / "mapType.out"), str(our_d / "mapType.out"))


def test_map_genome_detects_mixed_types(tmp_path):
    from rabbittclust_tpu.evaltools.taxonomy import map_genome
    f1 = tmp_path / "mixed.fna"
    f1.write_text(">s1 Escherichia coli x\nACGT\n>s2 Bacillus subtilis y\n"
                  "ACGT\n")
    lst = tmp_path / "list.txt"
    lst.write_text(f"{f1}\n")
    bad = map_genome(str(lst), str(tmp_path / "mapType.out"))
    assert bad == [str(f1)]
