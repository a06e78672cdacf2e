#!/usr/bin/env bash
# BFS benchmark sweep (reference: run_bfs.sh — same tiered TEST structure and
# tuned flags; graphs come from RMAT generation or local .mtx files since the
# gunrock/topc dataset mirrors need external downloads).
#   TEST=0  large suite (drop .mtx files under $DATA first)
#   TEST=1  RMAT scaling sweep (generated on the fly, no downloads)
#   TEST=2  data/small smoke suite
TEST="${TEST:-1}"
DATA="${DATA:-/data/gunrock_dataset/large}"
FLAGS="--timing 0 --earlyexit 1 --mxvmode 0 --struconly 1 --niter 5 --opreuse 1"
cd "$(dirname "$0")"

if [ "$TEST" = "0" ]; then
  for file in ak2010 belgium_osm coAuthorsDBLP delaunay_n10 delaunay_n13 \
              delaunay_n21 webbase-1M soc-LiveJournal1 kron_g500-logn21; do
    echo python examples/gbfs.py $FLAGS "$DATA/$file/$file.mtx"
    python examples/gbfs.py $FLAGS "$DATA/$file/$file.mtx"
  done
fi

if [ "$TEST" = "1" ]; then
  for spec in rmat:18:16 rmat:20:16 rmat:22:16; do
    echo python examples/gbfs.py $FLAGS --skip_cpu_verify "$spec"
    python examples/gbfs.py $FLAGS --skip_cpu_verify "$spec"
  done
  echo python examples/gbfs.py $FLAGS --skip_cpu_verify --memusage 0.5 rmat:24:16
  python examples/gbfs.py $FLAGS --skip_cpu_verify --memusage 0.5 rmat:24:16
fi

if [ "$TEST" = "2" ]; then
  for file in test_bc test_cc test_mesh test_mis test_pr small chesapeake; do
    echo python examples/gbfs.py $FLAGS "data/small/$file.mtx"
    python examples/gbfs.py $FLAGS "data/small/$file.mtx"
  done
fi
