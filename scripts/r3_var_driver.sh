#!/bin/bash
# Staged posterior-variance runs: safe configs first, each its own process.
cd /root/repo
for cfg in "65536 host 512" "65536 scan 512" "131072 host 512" "262144 host 512"; do
  echo "=== RUN $cfg ==="
  timeout 1500 python scripts/r3_tpu_var.py $cfg
  rc=$?
  echo "=== rc=$rc ==="
  if [ $rc -ne 0 ]; then
    echo "stage failed; waiting 120s for tunnel recovery"
    sleep 120
  fi
done
echo "=== RUN dense2 ==="
timeout 2400 python scripts/r3_tpu_dense2.py
echo "=== dense2 rc=$? ==="
echo "VAR DRIVER DONE"
