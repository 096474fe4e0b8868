// Minimal functional stub for the absent RabbitFX submodule (test oracle
// only).  Reconstructed from the reference's call sites
// (SketchInfo.cpp:156-435,483-516,563-640,742-770): FastaDataPool,
// FastaChunk/FastaDataChunk, Reference records, and a chunked reader that
// yields sequences in file order.  Behavior-identical for the oracle's
// single-producer/single-consumer (-t 1) runs: gid = global sequence index,
// chunks carry parsed Reference records directly.
#ifndef RTC_STUB_FASTXCHUNK_H
#define RTC_STUB_FASTXCHUNK_H

#include <cstdint>
#include <string>
#include <vector>

namespace rabbit {

typedef int64_t int64;

namespace fa {

struct Reference {
    std::string name;
    std::string comment;
    std::string seq;
    int length = 0;
    int gid = 0;
};

struct FastaDataChunk {
    FastaDataChunk *next = nullptr;
};

class FastaDataPool {
  public:
    FastaDataPool(int /*nChunks*/, size_t /*chunkSize*/) {}
    // Real RabbitFX returns the chunk to the pool; callers read c->next
    // AFTER Release (SketchInfo.cpp:195-203), so this must keep the chunk
    // alive. The oracle process is short-lived; leaking is fine.
    void Release(FastaDataChunk * /*c*/) {}
};

struct FastaChunk {
    FastaDataChunk *chunk = nullptr;
    std::vector<Reference> refs;
};

inline int chunkListFormat(FastaChunk &fc, std::vector<Reference> &out) {
    out = fc.refs;
    return (int)out.size();
}

}  // namespace fa
}  // namespace rabbit

using rabbit::fa::Reference;

#endif
