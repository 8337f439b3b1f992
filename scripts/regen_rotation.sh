#!/bin/bash
# Regenerate the nine shear-era rotation-uncertainty sets with the
# reference-parity GATHER warp (PERF.md round-4 provenance note): BM-1/2/3
# and LF-1..6 rotation tensors were produced in round-2 windows when the
# engine default was the shear warp; MF-1/2/3 already used gather.
#
# Moves each stale rotation_uncertainty dir aside, reruns the uncertainty
# stage (dropblock dirs exist -> skipped; only rotation regenerates), then
# re-renders the cross-model density report. One job at a time (single
# TPU tenant). ~90 min total.
set -u
cd /root/repo
ROOT=_runs/MATRIX
DATA=_runs/augmented_data
MODELS="BM-1,BM-2,BM-3,LF-1,LF-2,LF-3,LF-4,LF-5,LF-6"

for m in ${MODELS//,/ }; do
  d="$ROOT/$m/rotation_uncertainty"
  if [ -d "$d" ]; then
    n=0; while [ -e "$d.shear$n" ]; do n=$((n+1)); done
    mv "$d" "$d.shear$n"
    echo "[regen_rotation] moved aside $d -> $d.shear$n"
  fi
done

python -m unet_research_tpu.cli.run_matrix \
  -stage uncertainty -data_path "$DATA" -out_root "$ROOT" \
  -models "$MODELS" --with_dependent || exit 1

python -m unet_research_tpu.cli.run_matrix \
  -stage density -data_path "$DATA" -out_root "$ROOT" \
  -models "BM-1,BM-2,BM-3,MF-1,MF-2,MF-3,LF-1,LF-2,LF-3,LF-4,LF-5,LF-6" \
  --with_dependent --force
echo "REGEN ROTATION DONE $(date -u +%H:%M:%S)"
