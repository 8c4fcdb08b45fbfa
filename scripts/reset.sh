#!/usr/bin/env bash
# Clear training artifacts (reference reset.sh equivalent: wipes and
# recreates ./checkpoints and ./output). Usage: scripts/reset.sh [workdir]
set -euo pipefail
cd "${1:-.}"
rm -rf ./checkpoints ./output
mkdir -p ./checkpoints ./output ./output/samples
echo "reset: ./checkpoints ./output cleared"
