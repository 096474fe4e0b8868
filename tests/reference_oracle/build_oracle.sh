#!/bin/bash
# Build the reference RabbitTClust binaries as golden-test oracles.
# Sources stay in /root/reference (read-only); the absent RabbitSketch
# submodule is replaced by our functional stub Sketch.h; output goes to the
# (gitignored) .cache/ref_build folder.
set -e
REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=${OUT:-$HERE/../../.cache/ref_build}
mkdir -p "$OUT"

CXXFLAGS="-O2 -std=c++17 -fopenmp -Wno-format -Wno-unused-result -w -I$HERE -I$REF/src"
SRCS="$REF/src/main.cpp $REF/src/SketchInfo.cpp $REF/src/MST.cpp \
      $REF/src/MST_IO.cpp $REF/src/Sketch_IO.cpp $REF/src/sub_command.cpp \
      $REF/src/cluster_postprocess.cpp $REF/src/mst_state.cpp"

# clust-mst (default flavor)
g++ $CXXFLAGS -D Timer -o "$OUT/clust-mst" $SRCS -lz -lgomp -lpthread

# clust-greedy
g++ $CXXFLAGS -D Timer -D GREEDY_CLUST -o "$OUT/clust-greedy" $SRCS \
    "$REF/src/greedy.cpp" -lz -lgomp -lpthread

# clust-dbscan
g++ $CXXFLAGS -D Timer -D DBSCAN_CLUST -o "$OUT/clust-dbscan" $SRCS \
    "$REF/src/dbscan.cpp" -lz -lgomp -lpthread

# Latent MinHashDBSCAN driver (dbscan.cpp:987 is unreachable from the
# reference CLI; this driver calls it directly — see the .cpp header)
g++ $CXXFLAGS -o "$OUT/minhash-dbscan-oracle" \
    "$HERE/minhash_dbscan_oracle.cpp" "$REF/src/SketchInfo.cpp" \
    "$REF/src/dbscan.cpp" -lz -lgomp -lpthread

# RabbitFX-enabled flavors (functional stub in rabbitfx/): unlock the
# reference's KSSD by-sequence path (sketchSequencesWithKssd is only
# compiled under RABBIT_FX, SketchInfo.cpp:563-640)
FXFLAGS="$CXXFLAGS -I$HERE/rabbitfx -D RABBIT_FX"
g++ $FXFLAGS -D Timer -o "$OUT/clust-mst-fx" $SRCS -lz -lgomp -lpthread
g++ $FXFLAGS -D Timer -D GREEDY_CLUST -o "$OUT/clust-greedy-fx" $SRCS \
    "$REF/src/greedy.cpp" -lz -lgomp -lpthread

# Leiden graph-construction oracle: leiden.cpp compiled with the
# non-functional igraph stub ($HERE/igraph.h) + robin_hood stub
# ($HERE/RabbitSketch/src/robin_hood.h via the -I$HERE fallback for the
# relative ../RabbitSketch include); only the saved .graph is golden
g++ $CXXFLAGS -I"$HERE/rs_anchor" -D LEIDEN_CLUST \
    -o "$OUT/leiden-graph-oracle" \
    "$HERE/leiden_graph_oracle.cpp" "$REF/src/leiden.cpp" \
    "$REF/src/SketchInfo.cpp" -lz -lgomp -lpthread

# Benchmark-evaluation tools (benchmark/evaluation/src): precalLabel and
# mapGenome build as-is; calPurity links groundTruth.cpp; analysisPurity /
# checkTaxonomyStatus use the boost::split functional stub in boost/.
EVAL="$REF/benchmark/evaluation/src"
EVALFLAGS="-O2 -w -I$HERE -I$EVAL"
g++ $EVALFLAGS -o "$OUT/precalLabel" "$EVAL/precalLabel.cpp" -lz -fopenmp
g++ $EVALFLAGS -o "$OUT/mapGenome" "$EVAL/mapGenome.cpp" -lz -fopenmp
g++ $EVALFLAGS -o "$OUT/calPurity" "$EVAL/calPurity.cpp" \
    "$EVAL/groundTruth.cpp" -lz -fopenmp
g++ $EVALFLAGS -o "$OUT/analysisPurity" "$EVAL/analysisPurity.cpp" \
    -lz -fopenmp
g++ $EVALFLAGS -o "$OUT/checkTaxonomyStatus" "$EVAL/checkTaxonomyStatus.cpp" \
    -lz -fopenmp

echo "oracle binaries in $OUT"
