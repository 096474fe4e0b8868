// Minimal functional stub of boost::algorithm::split with
// token_compress_on semantics (adjacent delimiters merged, no leading
// empty token when the string starts with a delimiter run is NOT boost's
// behavior -- boost keeps a single leading empty token; replicate boost).
#pragma once
#include <string>
#include <vector>
#include "classification.hpp"
namespace boost {
namespace algorithm { enum token_compress_mode_type { token_compress_off, token_compress_on }; }
using algorithm::token_compress_on;
using algorithm::token_compress_off;
template <class Seq, class Pred>
void split(Seq& out, const std::string& s, Pred pred,
           algorithm::token_compress_mode_type mode = algorithm::token_compress_off) {
  out.clear();
  size_t i = 0, n = s.size();
  std::string cur;
  bool in_delim_run = false;
  for (i = 0; i < n; ++i) {
    if (pred(s[i])) {
      if (mode == algorithm::token_compress_on) {
        if (!in_delim_run) { out.push_back(cur); cur.clear(); in_delim_run = true; }
      } else {
        out.push_back(cur); cur.clear();
      }
    } else {
      cur += s[i];
      in_delim_run = false;
    }
  }
  out.push_back(cur);
}
}
