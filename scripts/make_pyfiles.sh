#!/usr/bin/env bash
# Package kgforge for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kgforge.zip
zip -qr dist/kgforge.zip kgforge -x '*__pycache__*'
echo "dist/kgforge.zip:"
unzip -l dist/kgforge.zip | tail -2
