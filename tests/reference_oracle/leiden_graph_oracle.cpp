// Oracle driver for the reference's Leiden GRAPH-CONSTRUCTION stage
// (leiden.cpp:168-293) and its save_graph_to_file format
// (leiden.cpp:474-492).  The community-detection calls are satisfied by
// the non-functional igraph stub (tests/reference_oracle/igraph.h) — the
// returned clusters are garbage and unused; ONLY the .graph file saved
// right after igraph_create is the golden artifact.  Sketching uses the
// reference's own sketchFileWithKssd (the clust-leiden path,
// sub_command.cpp:2154-2169), so genome ids match our clust-leiden CLI.
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "SketchInfo.h"
#include "leiden.h"

using std::cerr;
using std::endl;
using std::string;
using std::vector;

int main(int argc, char** argv) {
  if (argc < 6) {
    cerr << "usage: " << argv[0]
         << " <genome_list> <out.graph> <threshold> <k> <drlevel> [knn]"
         << endl;
    return 2;
  }
  string listFile = argv[1];
  string graphOut = argv[2];
  double threshold = atof(argv[3]);
  int kmerSize = atoi(argv[4]);
  int drlevel = atoi(argv[5]);
  int knn_k = argc > 6 ? atoi(argv[6]) : 0;

  vector<KssdSketchInfo> sketches;
  KssdParameters info;
  if (!sketchFileWithKssd(listFile, 10000, kmerSize, drlevel, sketches,
                          info, 1)) {
    cerr << "sketching failed" << endl;
    return 1;
  }
  cerr << "-----the size of sketches is: " << sketches.size() << endl;
  // resolution/use_leiden are irrelevant: community detection is stubbed
  KssdLeidenCluster(sketches, 0, threshold, 1, kmerSize, 1.0, false, knn_k,
                    graphOut);
  return 0;
}
