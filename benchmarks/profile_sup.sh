#!/bin/bash
# retry-supervised per-stage TPU profiling (tunnel faults are transient)
cd /root/repo
for stage in "$@"; do
  for attempt in 1 2 3; do
    out=$(timeout 1500 python benchmarks/profile_batched.py "$stage" 2>&1 | grep -E "^($stage|done)")
    if [ -n "$out" ]; then echo "$out"; break; fi
    echo "[$stage attempt $attempt failed; waiting 150s]"
    sleep 150
  done
done
echo ALLDONE
