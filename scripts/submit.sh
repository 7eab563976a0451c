#!/usr/bin/env bash
# Package the engine and launch via spark-submit --py-files (north rule).
#
# Usage:
#   scripts/submit.sh [bench|scaling] [extra spark-submit args...]
#
# On a real cluster set SPARK_MASTER (e.g. spark://host:7077 or yarn);
# defaults to local[$SPARK_GRAFT_CPUS].
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-bench}"; shift || true
ZIP=/tmp/geotools_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('geotools_spark'):
        if '__pycache__' in root: continue
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
print('packaged', '$ZIP')
"

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
if [ "$MODE" = "scaling" ]; then
  export SPARK_GRAFT_SCALING=1
fi
exec spark-submit --master "$MASTER" --py-files "$ZIP" "$@" bench.py
