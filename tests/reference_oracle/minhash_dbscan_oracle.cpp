// Oracle driver for the reference's LATENT MinHashDBSCAN engine
// (dbscan.cpp:987-1097).  The reference CLI cannot reach it —
// main.cpp:481-484 requires --fast for clust-dbscan, which dispatches the
// KSSD engine only — so we link the reference's own SketchInfo.cpp +
// dbscan.cpp and drive the function directly.  Sketching follows the
// reference's default convention (use_inverted_index = true,
// main.cpp:104): an index pointer is passed so sketches keep input-order
// IDs (SketchInfo.cpp:982-989 skips the genome-size sort).
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "SketchInfo.h"
#include "dbscan.h"

using std::cerr;
using std::endl;
using std::string;
using std::vector;

int main(int argc, char** argv) {
  if (argc < 7) {
    cerr << "usage: " << argv[0]
         << " <list|fasta> <out> <eps> <minPts> <k> <sketchSize>"
            " [contain <c>] [byseq]" << endl;
    return 2;
  }
  string inputFile = argv[1];
  string outputFile = argv[2];
  double eps = atof(argv[3]);
  int minPts = atoi(argv[4]);
  int kmerSize = atoi(argv[5]);
  int sketchSize = atoi(argv[6]);
  bool isContainment = false;
  int containCompress = 1000;
  bool sketchByFile = true;
  for (int i = 7; i < argc; ++i) {
    if (!strcmp(argv[i], "contain")) {
      isContainment = true;
      containCompress = atoi(argv[++i]);
    } else if (!strcmp(argv[i], "byseq")) {
      sketchByFile = false;
    }
  }
  vector<SketchInfo> sketches;
  MinHashInvertedIndex idx;  // keeps input-order IDs (no size sort)
  bool ok;
  if (sketchByFile) {
    ok = sketchFiles(inputFile, 10000, kmerSize, sketchSize, "MinHash",
                     isContainment, containCompress, sketches, 1, &idx);
  } else {
    ok = sketchSequences(inputFile, kmerSize, sketchSize, 10000, "MinHash",
                         isContainment, containCompress, sketches, 1, &idx);
  }
  if (!ok) {
    cerr << "sketching failed" << endl;
    return 1;
  }
  cerr << "-----the size of sketches is: " << sketches.size() << endl;
  DBSCANResult res = MinHashDBSCAN(sketches, eps, minPts, /*sketch_func_id=*/0, 1);
  printDBSCANResult(res, sketches, sketchByFile, outputFile, eps, minPts);
  return 0;
}
