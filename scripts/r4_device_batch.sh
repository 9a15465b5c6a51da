#!/bin/bash
# Round-4 device measurement batch — run while the evolution campaign is
# PAUSED (single-client tunnel: never two TPU processes at once).
# Usage: bash scripts/r4_device_batch.sh [outdir]
set -u
OUT=${1:-/tmp/r4_batch}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "--- exit $? ---"
  tail -15 "$OUT/$name.log"
}

run ab_r4_3d   python scripts/tpu_ab_r4.py --case 3d
run ab_r4_2d   python scripts/tpu_ab_r4.py --case 2d
run vpu_roof   python scripts/vpu_roofline_elasticity.py
run fas_rho    python scripts/fas_rho_df64.py
run hh_df64    python scripts/helmholtz_convergence.py --device --df64 --ks 80 160 320
run batch64    python scripts/batch_eval_demo.py --n 64
echo "=== all done; logs in $OUT ==="
