#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f /tmp/angola_erp_ocr_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("/tmp/angola_erp_ocr_spark.zip", "w") as z:
    for root, _dirs, files in os.walk("angola_erp_ocr_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote /tmp/angola_erp_ocr_spark.zip")
EOF
