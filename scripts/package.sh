#!/usr/bin/env bash
# Build the --py-files zip for cluster submission (north rule:
# "run via spark-submit --py-files").
#
#   scripts/package.sh            -> dist/kg_spark.zip
#   spark-submit --py-files dist/kg_spark.zip \
#       --master yarn --deploy-mode cluster \
#       your_job.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kg_spark.zip
zip -qr dist/kg_spark.zip knowledgegraphgenerator_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "dist/kg_spark.zip:"
unzip -l dist/kg_spark.zip | tail -3
