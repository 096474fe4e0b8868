// Functional stand-in for the RabbitSketch submodule (absent from the
// reference snapshot), used ONLY to compile the reference binaries as a
// golden-test oracle.  Written fresh for this framework's test suite.
//
// MinHash implements Mash semantics (canonical k-mer = memcmp-smaller of
// k-mer / revcomp, MurmurHash3 seed 42, bottom-s distinct hashes) and the
// distance formulas the reference's own MST/greedy code uses, so the
// oracle's MinHash outputs are directly comparable with rabbittclust_tpu.
// KSSD/WMinHash/HyperLogLog/OrderMinHash are latent in the reference CLI
// (sketchFunc is hard-wired to "MinHash"); their stubs satisfy the API.
#ifndef STUB_SKETCH_H
#define STUB_SKETCH_H

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <set>
#include <string>
#include <vector>

namespace Sketch {

// ---- MurmurHash3 (public domain algorithm, Austin Appleby) ----
inline uint64_t stub_rotl64_(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}
inline uint32_t stub_rotl32_(uint32_t x, int8_t r) {
  return (x << r) | (x >> (32 - r));
}
inline uint64_t stub_fmix64_(uint64_t k) {
  k ^= k >> 33; k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33; k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33; return k;
}
inline void stub_mmh3_x64_128_(const void* key, int len, uint32_t seed,
                               void* out) {
  const uint8_t* data = (const uint8_t*)key;
  const int nblocks = len / 16;
  uint64_t h1 = seed, h2 = seed;
  const uint64_t c1 = 0x87c37b91114253d5ULL, c2 = 0x4cf5ad432745937fULL;
  for (int i = 0; i < nblocks; i++) {
    uint64_t k1, k2;
    memcpy(&k1, data + i * 16, 8);
    memcpy(&k2, data + i * 16 + 8, 8);
    k1 *= c1; k1 = stub_rotl64_(k1, 31); k1 *= c2; h1 ^= k1;
    h1 = stub_rotl64_(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729;
    k2 *= c2; k2 = stub_rotl64_(k2, 33); k2 *= c1; h2 ^= k2;
    h2 = stub_rotl64_(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5;
  }
  const uint8_t* tail = data + nblocks * 16;
  uint64_t k1 = 0, k2 = 0;
  switch (len & 15) {
    case 15: k2 ^= ((uint64_t)tail[14]) << 48; [[fallthrough]];
    case 14: k2 ^= ((uint64_t)tail[13]) << 40; [[fallthrough]];
    case 13: k2 ^= ((uint64_t)tail[12]) << 32; [[fallthrough]];
    case 12: k2 ^= ((uint64_t)tail[11]) << 24; [[fallthrough]];
    case 11: k2 ^= ((uint64_t)tail[10]) << 16; [[fallthrough]];
    case 10: k2 ^= ((uint64_t)tail[9]) << 8; [[fallthrough]];
    case 9:  k2 ^= ((uint64_t)tail[8]);
             k2 *= c2; k2 = stub_rotl64_(k2, 33); k2 *= c1; h2 ^= k2;
             [[fallthrough]];
    case 8:  k1 ^= ((uint64_t)tail[7]) << 56; [[fallthrough]];
    case 7:  k1 ^= ((uint64_t)tail[6]) << 48; [[fallthrough]];
    case 6:  k1 ^= ((uint64_t)tail[5]) << 40; [[fallthrough]];
    case 5:  k1 ^= ((uint64_t)tail[4]) << 32; [[fallthrough]];
    case 4:  k1 ^= ((uint64_t)tail[3]) << 24; [[fallthrough]];
    case 3:  k1 ^= ((uint64_t)tail[2]) << 16; [[fallthrough]];
    case 2:  k1 ^= ((uint64_t)tail[1]) << 8; [[fallthrough]];
    case 1:  k1 ^= ((uint64_t)tail[0]);
             k1 *= c1; k1 = stub_rotl64_(k1, 31); k1 *= c2; h1 ^= k1;
  }
  h1 ^= len; h2 ^= len;
  h1 += h2; h2 += h1;
  h1 = stub_fmix64_(h1); h2 = stub_fmix64_(h2);
  h1 += h2; h2 += h1;
  ((uint64_t*)out)[0] = h1;
  ((uint64_t*)out)[1] = h2;
}
inline uint32_t stub_mmh3_x86_32_(const void* key, int len, uint32_t seed) {
  const uint8_t* data = (const uint8_t*)key;
  const int nblocks = len / 4;
  uint32_t h1 = seed;
  const uint32_t c1 = 0xcc9e2d51, c2 = 0x1b873593;
  for (int i = 0; i < nblocks; i++) {
    uint32_t k1;
    memcpy(&k1, data + i * 4, 4);
    k1 *= c1; k1 = stub_rotl32_(k1, 15); k1 *= c2;
    h1 ^= k1; h1 = stub_rotl32_(h1, 13); h1 = h1 * 5 + 0xe6546b64;
  }
  const uint8_t* tail = data + nblocks * 4;
  uint32_t k1 = 0;
  switch (len & 3) {
    case 3: k1 ^= tail[2] << 16; [[fallthrough]];
    case 2: k1 ^= tail[1] << 8; [[fallthrough]];
    case 1: k1 ^= tail[0];
            k1 *= c1; k1 = stub_rotl32_(k1, 15); k1 *= c2; h1 ^= k1;
  }
  h1 ^= len;
  h1 ^= h1 >> 16; h1 *= 0x85ebca6b; h1 ^= h1 >> 13;
  h1 *= 0xc2b2ae35; h1 ^= h1 >> 16;
  return h1;
}

class MinHash {
  int kmerSize_, sketchSize_;
  std::set<uint64_t> kept_;  // bottom-s distinct hashes (ordered)

 public:
  MinHash(int kmerSize = 21, int sketchSize = 1000)
      : kmerSize_(kmerSize), sketchSize_(sketchSize) {}

  void update(const char* seq) {
    int len = (int)strlen(seq);
    if (len < kmerSize_) return;
    const bool use64 = kmerSize_ > 16;
    std::vector<char> fwd(kmerSize_), rc(kmerSize_);
    auto comp = [](char c) {
      switch (c) {
        case 'A': return 'T'; case 'C': return 'G';
        case 'G': return 'C'; case 'T': return 'A';
        default: return 'N';
      }
    };
    for (int i = 0; i + kmerSize_ <= len; ++i) {
      bool ok = true;
      for (int j = 0; j < kmerSize_; ++j) {
        char c = seq[i + j];
        if (c >= 'a') c -= 32;
        if (c != 'A' && c != 'C' && c != 'G' && c != 'T') { ok = false; break; }
        fwd[j] = c;
      }
      if (!ok) continue;
      for (int j = 0; j < kmerSize_; ++j) rc[j] = comp(fwd[kmerSize_ - 1 - j]);
      const char* can =
          memcmp(fwd.data(), rc.data(), kmerSize_) <= 0 ? fwd.data() : rc.data();
      uint64_t h;
      if (use64) {
        uint64_t out[2];
        stub_mmh3_x64_128_(can, kmerSize_, 42, out);
        h = out[0];
      } else {
        h = stub_mmh3_x86_32_(can, kmerSize_, 42);
      }
      if ((int)kept_.size() < sketchSize_) {
        kept_.insert(h);
      } else if (h < *kept_.rbegin()) {
        if (kept_.insert(h).second && (int)kept_.size() > sketchSize_) {
          kept_.erase(std::prev(kept_.end()));
        }
      }
    }
  }

  std::vector<uint64_t> storeMinHashes() const {
    return std::vector<uint64_t>(kept_.begin(), kept_.end());
  }
  void loadMinHashes(const std::vector<uint64_t>& v) {
    kept_ = std::set<uint64_t>(v.begin(), v.end());
  }
  int getKmerSize() const { return kmerSize_; }
  int getSketchSize() const { return sketchSize_; }

  double jaccard(MinHash* other) const {
    uint64_t common = 0;
    auto a = kept_.begin();
    auto b = other->kept_.begin();
    while (a != kept_.end() && b != other->kept_.end()) {
      if (*a < *b) ++a;
      else if (*b < *a) ++b;
      else { ++common; ++a; ++b; }
    }
    uint64_t uni = kept_.size() + other->kept_.size() - common;
    return uni == 0 ? 0.0 : (double)common / uni;
  }
  double distance(MinHash* other) const {
    double j = jaccard(const_cast<MinHash*>(other));
    if (j == 1.0) return 0.0;
    if (j == 0.0) return 1.0;
    double d = -std::log(2.0 * j / (1.0 + j)) / kmerSize_;
    return d > 1.0 ? 1.0 : d;
  }
  double containJaccard(MinHash* other) const {
    uint64_t common = 0;
    auto a = kept_.begin();
    auto b = other->kept_.begin();
    while (a != kept_.end() && b != other->kept_.end()) {
      if (*a < *b) ++a;
      else if (*b < *a) ++b;
      else { ++common; ++a; ++b; }
    }
    uint64_t mn = std::min(kept_.size(), other->kept_.size());
    return mn == 0 ? 0.0 : (double)common / mn;
  }
  double containDistance(MinHash* other) const {
    double c = containJaccard(const_cast<MinHash*>(other));
    if (c == 1.0) return 0.0;
    if (c == 0.0) return 1.0;
    double d = -std::log(c) / kmerSize_;
    return d > 1.0 ? 1.0 : d;
  }
};

struct KSSDParameters {
  int half_k, half_subk, drlevel;
  KSSDParameters(int hk = 10, int hs = 6, int dl = 3)
      : half_k(hk), half_subk(hs), drlevel(dl) {}
};

class KSSD {
  KSSDParameters p_;
  std::vector<uint64_t> hashes_;

 public:
  explicit KSSD(const KSSDParameters& p) : p_(p) {}
  void update(const char*) {}
  double distance(KSSD*) const { return 1.0; }
  std::vector<uint64_t> storeHashes() const { return hashes_; }
  void loadHashes(const std::vector<uint64_t>& v) { hashes_ = v; }
  int get_half_k() const { return p_.half_k; }
  int get_half_subk() const { return p_.half_subk; }
  int get_drlevel() const { return p_.drlevel; }
};

struct WMHParameters {
  int kmerSize, sketchSize, windowSize;
  double* r = nullptr;
  double* c = nullptr;
  double* b = nullptr;
};
inline void getCWS(double* /*r*/, double* /*c*/, double* /*b*/,
                   int /*sketchSize*/, int /*dim*/) {}

class WMinHash {
 public:
  explicit WMinHash(const WMHParameters&) {}
  void update(const char*) {}
  void computeHistoSketch() {}
  double distance(WMinHash*) const { return 1.0; }
};

class HyperLogLog {
 public:
  explicit HyperLogLog(int /*bits*/ = 10) {}
  void update(const char*) {}
  double distance(const HyperLogLog&) const { return 1.0; }
  double distance(HyperLogLog*) const { return 1.0; }
};

class OrderMinHash {
 public:
  OrderMinHash() {}
  void buildSketch(const char*) {}
  double distance(OrderMinHash*) const { return 1.0; }
  double distance(const OrderMinHash&) const { return 1.0; }
};

}  // namespace Sketch

// some call sites use getCWS unqualified
using Sketch::getCWS;

#endif  // STUB_SKETCH_H
