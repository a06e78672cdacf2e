#!/usr/bin/env bash
# GC benchmark sweep (reference: run_gc.sh — same flags/structure;
# TEST=1 uses generated RMAT graphs, TEST=2 the data/small smoke suite).
TEST="${TEST:-1}"
DATA="${DATA:-/data/gunrock_dataset/large}"
FLAGS="--niter 10 --mxvmode 0 --timing 1 --directed 2"
cd "$(dirname "$0")"

if [ "$TEST" = "0" ]; then
  for file in ak2010 belgium_osm coAuthorsDBLP delaunay_n10 delaunay_n13 \
              delaunay_n21 webbase-1M soc-LiveJournal1 kron_g500-logn21; do
    echo python examples/ggc.py $FLAGS "$DATA/$file/$file.mtx"
    python examples/ggc.py $FLAGS "$DATA/$file/$file.mtx"
  done
fi

if [ "$TEST" = "1" ]; then
  for spec in rmat:18:16 rmat:20:16 rmat:22:16; do
    echo python examples/ggc.py $FLAGS --skip_cpu_verify "$spec"
    python examples/ggc.py $FLAGS --skip_cpu_verify "$spec"
  done
fi

if [ "$TEST" = "2" ]; then
  for file in test_bc test_cc test_mesh test_mis test_pr small chesapeake; do
    echo python examples/ggc.py $FLAGS "data/small/$file.mtx"
    python examples/ggc.py $FLAGS "data/small/$file.mtx"
  done
fi
