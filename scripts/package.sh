#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit cluster launches.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/reden_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/reden_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("reden_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("dist/reden_spark.zip written")
EOF
