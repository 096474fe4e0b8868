// Minimal functional stub of boost::algorithm::is_any_of for the oracle
// build (only what analysisPurity/checkTaxonomyStatus use).
#pragma once
#include <string>
namespace boost {
struct __is_any_of {
  std::string set;
  bool operator()(char c) const { return set.find(c) != std::string::npos; }
};
inline __is_any_of is_any_of(const std::string& s) { return {s}; }
}
