#!/usr/bin/env bash
# Package xhs_ocr_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
python - <<'EOF'
from xhs_ocr_spark.session import package_zip
print(package_zip("dist"))
EOF
echo "submit with:"
echo "  spark-submit --py-files dist/xhs_ocr_spark.zip scripts/submit_extract.py <input> <output>"
