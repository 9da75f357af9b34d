#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north rule: "ships via
# spark-submit --py-files to a multi-executor cluster").
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-lss_pyfiles.zip}"
rm -f "$OUT"
zip -qr "$OUT" legislation_scraper_spark -x '*__pycache__*'
echo "$OUT"
