#!/bin/bash
# 3 sequential driver-shaped sessions (fresh process/JVM each)
set -u
for i in 1 2 3; do
  echo "=== session $i ==="
  python /root/repo/tools/driver_session_bench.py \
    > /root/repo/tools/driver_shape_runs/session_$i.stdout.log \
    2> /root/repo/tools/driver_shape_runs/session_$i.stderr.log
  echo "rc=$?"
done
