#!/usr/bin/env bash
# Standard-codec RD baselines over an image directory
# (parity: the reference's run-benchmarks.sh driving compressai.utils.bench).
#
# Usage: scripts/run_benchmarks.sh DATASET_DIR [OUTPUT_DIR]
set -euo pipefail

DATASET="${1:?usage: run_benchmarks.sh DATASET_DIR [OUTPUT_DIR]}"
OUT="${2:-benchmark_results}"
mkdir -p "$OUT"

for codec in jpeg webp jpeg2000; do
  echo "== $codec =="
  python -m spatiotemporalentropymodel_tpu.eval.bench_codecs "$codec" \
    "$DATASET" -q 10 20 30 40 50 60 70 80 90 -o "$OUT/$codec.json"
done

# external-binary codecs run only when the binaries are installed
for codec in bpg vtm hm av1; do
  if python - "$codec" <<'EOF'
import sys
from spatiotemporalentropymodel_tpu.eval.bench_codecs import get_codec
sys.exit(0 if get_codec(sys.argv[1]).available() else 1)
EOF
  then
    echo "== $codec =="
    python -m spatiotemporalentropymodel_tpu.eval.bench_codecs "$codec" \
      "$DATASET" -o "$OUT/$codec.json"
  else
    echo "== $codec: binary not found, skipped =="
  fi
done

echo "results in $OUT/; plot with:"
echo "  python -m spatiotemporalentropymodel_tpu.eval.plot $OUT/*.json -o rd.png"
