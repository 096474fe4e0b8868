// Minimal igraph stub — just enough to COMPILE AND LINK the reference's
// leiden.cpp as a GRAPH-CONSTRUCTION oracle (tests/reference_oracle/
// leiden_graph_oracle.cpp).  Community detection is deliberately
// non-functional here (memberships stay zero): only the similarity-graph
// build (leiden.cpp:168-293) and its save_graph_to_file output
// (leiden.cpp:474-492) are golden-compared; the real igraph calls are
// never part of the oracle contract (the upstream submodule chain is
// absent from the reference snapshot).
#pragma once
#include <cstdlib>
#include <cstring>

typedef long long igraph_integer_t;
typedef double igraph_real_t;

#define IGRAPH_UNDIRECTED 0
#define IGRAPH_SUCCESS 0

typedef struct {
  double* stor_begin;
  long long n;
} igraph_vector_t;

typedef struct {
  long long* stor_begin;
  long long n;
} igraph_vector_int_t;

typedef struct {
  int unused;
} igraph_t;

#define VECTOR(v) ((v).stor_begin)

static inline int igraph_vector_init(igraph_vector_t* v, long long n) {
  v->n = n;
  v->stor_begin = (double*)calloc(n > 0 ? (size_t)n : 1, sizeof(double));
  return 0;
}
static inline int igraph_vector_int_init(igraph_vector_int_t* v,
                                         long long n) {
  v->n = n;
  v->stor_begin =
      (long long*)calloc(n > 0 ? (size_t)n : 1, sizeof(long long));
  return 0;
}
static inline long long igraph_vector_size(const igraph_vector_t* v) {
  return v->n;
}
static inline int igraph_vector_resize(igraph_vector_t* v, long long n) {
  v->stor_begin =
      (double*)realloc(v->stor_begin, (n > 0 ? (size_t)n : 1) * sizeof(double));
  if (n > v->n) memset(v->stor_begin + v->n, 0, (size_t)(n - v->n) * sizeof(double));
  v->n = n;
  return 0;
}
static inline int igraph_vector_init_copy(igraph_vector_t* dst,
                                          const igraph_vector_t* src) {
  igraph_vector_init(dst, src->n);
  memcpy(dst->stor_begin, src->stor_begin, (size_t)src->n * sizeof(double));
  return 0;
}
static inline void igraph_vector_destroy(igraph_vector_t* v) {
  free(v->stor_begin);
  v->stor_begin = nullptr;
  v->n = 0;
}
static inline void igraph_vector_int_destroy(igraph_vector_int_t* v) {
  free(v->stor_begin);
  v->stor_begin = nullptr;
  v->n = 0;
}
static inline int igraph_create(igraph_t*, const igraph_vector_int_t*,
                                long long, int) {
  return 0;
}
static inline void igraph_destroy(igraph_t*) {}
static inline int igraph_community_multilevel(const igraph_t*,
                                              const igraph_vector_t*,
                                              double,
                                              igraph_vector_int_t*,
                                              void*,
                                              igraph_vector_t* modularity) {
  if (modularity) {
    igraph_vector_resize(modularity, 1);
    modularity->stor_begin[0] = 0.0;
  }
  return 0;  // membership stays all-zero: NOT a community oracle
}
static inline int igraph_community_leiden(const igraph_t*,
                                          const igraph_vector_t*,
                                          const igraph_vector_t*, double,
                                          double, bool, int,
                                          igraph_vector_int_t*,
                                          igraph_integer_t* nb_clusters,
                                          igraph_real_t* quality) {
  if (nb_clusters) *nb_clusters = 1;
  if (quality) *quality = 0.0;
  return 0;  // membership stays all-zero: NOT a community oracle
}
