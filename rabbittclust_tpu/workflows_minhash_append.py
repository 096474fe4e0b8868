"""MinHash (non --fast) append workflows for clust-mst / clust-greedy."""

from __future__ import annotations

from .io.fasta import read_file_list
from .sketch.minhash import sketch_files_minhash, sketch_sequences_minhash
from .state import sketch_io
from .workflows import OutputOptions, _mst_outputs, compute_minhash_clusters


def _sketch_new(input_file, sketch_by_file, min_len, p, threads):
    if sketch_by_file:
        return sketch_files_minhash(read_file_list(input_file), min_len, p,
                                    threads)
    return sketch_sequences_minhash(input_file, min_len, p, threads)


def append_clust_mst(folder_path: str, input_file: str, output_file: str,
                     sketch_by_file: bool, min_len: int, threshold: float,
                     threads: int, opts: OutputOptions):
    ss, p = sketch_io.load_minhash_sketches(folder_path)
    pre_n = len(ss)
    new_ss = _sketch_new(input_file, sketch_by_file, min_len, p, threads)
    ss.extend(new_ss)
    pre_mst = None
    try:
        pre_mst = sketch_io.load_mst(folder_path)
    except FileNotFoundError:
        pre_n = 0
    from .cluster.mst import compute_mst
    res = compute_mst(ss.hashes, threshold, p.kmer_size,
                      is_containment=p.is_containment, with_dense=opts.dense,
                      start_index=pre_n if pre_mst else 0, pre_edges=pre_mst)
    if not opts.no_save:
        sketch_io.save_minhash_sketches(
            ss, folder_path, p.kmer_size, p.is_containment,
            p.contain_compress, p.sketch_size)
        sketch_io.save_genome_info(ss, folder_path, "mst", kssd=False)
        sketch_io.save_mst(res.mst, folder_path)
    return _mst_outputs(ss, res, threshold, output_file, opts, folder_path,
                        kssd=False)


def append_clust_greedy(folder_path: str, input_file: str, output_file: str,
                        sketch_by_file: bool, min_len: int, threshold: float,
                        threads: int, opts: OutputOptions):
    ss, p = sketch_io.load_minhash_sketches(folder_path)
    new_ss = _sketch_new(input_file, sketch_by_file, min_len, p, threads)
    ss.extend(new_ss)
    if not opts.no_save:
        sketch_io.save_minhash_sketches(
            ss, folder_path, p.kmer_size, p.is_containment,
            p.contain_compress, p.sketch_size)
    return compute_minhash_clusters(ss, p, threshold, threads, output_file,
                                    opts, folder_path, "greedy")
