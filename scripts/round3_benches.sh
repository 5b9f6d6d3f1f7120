#!/bin/bash
# End-of-round perf artifact production on the idle chip (VERDICT r2 #2).
# Run AFTER stopping any training job; every step writes a committed JSON.
# (diagnose_throughput.py already has a committed clean-chip artifact from
# earlier this round; re-run it manually if the kernels change.)
set -x
cd /root/repo
mkdir -p log
BENCH_FULL=1 timeout 1800 python bench.py 2> log/bench_stderr.log
timeout 1200 python benchmarks/bench_kernels.py 2> log/bench_kernels_stderr.log
timeout 1200 python benchmarks/bench_multihead.py 2> log/bench_multihead_stderr.log
timeout 900 python scripts/probe_scatter_bwd.py 2> log/scatter_stderr.log
echo BENCHES DONE
