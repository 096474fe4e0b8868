// robin_hood stub for compiling the reference's leiden.cpp as a
// graph-construction oracle (the real robin_hood.h lives in the absent
// RabbitSketch submodule).  std::unordered_map is drop-in for every
// robin_hood::unordered_map use in leiden.cpp (operator[], find, clear,
// range-for).  NOTE: iteration ORDER differs from the real robin-hood
// map, so oracle comparisons canonicalize edge order (both engines'
// per-node edge emission order is a hash-map artifact, not semantics).
#pragma once
#include <cstdint>
#include <map>            // leiden.cpp uses std::map transitively via the
#include <unordered_map>  // real robin_hood.h's include chain
#include <utility>

namespace robin_hood {
template <class K, class V, class H = std::hash<K>>
using unordered_map = std::unordered_map<K, V, H>;
}
