#!/bin/bash
# Full-physics WAAM soak on the real chip (VERDICT round-2 item 3 "Done"
# criterion): latent heat (apparent cp) + melt-pool enhanced k + radiation,
# with multi-threshold thermal history (t8/5) and interpass control, on a
# cylinder STL end-to-end through the flagship CLI.
#
# Usage: bash scripts/waam_varprop_soak.sh [outdir]
set -e
OUT=${1:-/tmp/waam_vp_soak}
mkdir -p "$OUT"
python - <<'EOF'
from adi_thermal_fields_tpu.geometry.primitives import cylinder_mesh
from adi_thermal_fields_tpu.geometry.stl import save_stl_binary
m = cylinder_mesh(radius=0.012, height=0.024, n_phi=96)  # 24x24 mm, SI
save_stl_binary("/tmp/waam_vp_cyl.stl", m)
print("stl written")
EOF
time python -m adi_thermal_fields_tpu.apps.waam_from_stl \
    --stl /tmp/waam_vp_cyl.stl --dx_mm 1.0 --cfl 2 \
    --precision float32 \
    --emissivity 0.45 --latent_J_kg 270000 --solidus_C 1420 \
    --liquidus_C 1470 --melt_k_factor 4 \
    --history_t_crit 800,500 --interpass_T 400 --interpass_dwell_s 5 \
    --t_hold_s 60 --save_vtk 0 --outdir "$OUT" 2>&1 | tail -25
ls -la "$OUT"
