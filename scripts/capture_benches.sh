#!/bin/bash
# Capture the bench regimes as committed JSON (VERDICT r2 Next #3).
# Run on the real chip with no other TPU process active.
set -e
cd /root/repo
mkdir -p benchmarks
python bench.py --out benchmarks/bench_default.json
python bench.py --streaming --out benchmarks/bench_streaming.json
python bench.py --int8 --out benchmarks/bench_int8.json
python bench.py --int8-static --out benchmarks/bench_int8_static.json
# Stage split (reference rt_stat analog) at the streaming batch; the split
# forces a sync per stage, so its fps is diagnostic, not headline.
python bench.py --streaming --stage-timing --out benchmarks/bench_stage_timing.json
echo "wrote benchmarks/*.json"
