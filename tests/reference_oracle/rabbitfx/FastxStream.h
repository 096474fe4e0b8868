// Minimal functional stub for RabbitFX's FastaFileReader (test oracle only).
// Parses FASTA (plain or gzip via zlib) sequence-by-sequence and returns
// FastaChunk lists of up to kSeqsPerChunk records, assigning gid in global
// file order — the semantics the reference consumers rely on
// (SketchInfo.cpp:158-175: producer_fasta_task loop).
#ifndef RTC_STUB_FASTXSTREAM_H
#define RTC_STUB_FASTXSTREAM_H

#include <zlib.h>

#include <string>

#include "FastxChunk.h"

namespace rabbit {
namespace fa {

class FastaFileReader {
  public:
    static const int kSeqsPerChunk = 8;

    FastaFileReader(const std::string &file, FastaDataPool &/*pool*/,
                    bool /*isGz*/) {
        fp_ = gzopen(file.c_str(), "rb");
        next_gid_ = 0;
        pending_header_.clear();
        have_pending_ = false;
    }

    ~FastaFileReader() {
        if (fp_) gzclose(fp_);
    }

    // NULL at EOF; otherwise a chunk of up to kSeqsPerChunk sequences.
    FastaChunk *readNextChunkList() {
        if (!fp_) return nullptr;
        FastaChunk *fc = new FastaChunk;
        fc->chunk = new FastaDataChunk;
        while ((int)fc->refs.size() < kSeqsPerChunk) {
            Reference r;
            if (!readOne(r)) break;
            r.gid = next_gid_++;
            fc->refs.push_back(std::move(r));
        }
        if (fc->refs.empty()) {
            delete fc->chunk;
            delete fc;
            return nullptr;
        }
        return fc;
    }

  private:
    bool readLine(std::string &out) {
        out.clear();
        char buf[65536];
        bool got = false;
        while (gzgets(fp_, buf, sizeof(buf)) != nullptr) {
            got = true;
            out += buf;
            if (!out.empty() && out.back() == '\n') {
                out.pop_back();
                if (!out.empty() && out.back() == '\r') out.pop_back();
                break;
            }
        }
        return got;
    }

    bool readOne(Reference &r) {
        std::string line;
        if (!have_pending_) {
            // scan forward to the next header
            while (true) {
                if (!readLine(line)) return false;
                if (!line.empty() && line[0] == '>') break;
            }
            pending_header_ = line;
        }
        have_pending_ = false;
        // split header into name (first token) + comment (rest), kseq-style
        const std::string &h = pending_header_;
        size_t i = 1;
        while (i < h.size() && !isspace((unsigned char)h[i])) i++;
        r.name = h.substr(1, i - 1);
        while (i < h.size() && isspace((unsigned char)h[i])) i++;
        r.comment = (i < h.size()) ? h.substr(i) : std::string();
        r.seq.clear();
        while (readLine(line)) {
            if (!line.empty() && line[0] == '>') {
                pending_header_ = line;
                have_pending_ = true;
                break;
            }
            r.seq += line;
        }
        r.length = (int)r.seq.size();
        return true;
    }

    gzFile fp_ = nullptr;
    int next_gid_ = 0;
    std::string pending_header_;
    bool have_pending_ = false;
};

}  // namespace fa
}  // namespace rabbit

#endif
