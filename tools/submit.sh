#!/usr/bin/env bash
# Cluster launch recipe (north rule: "run via spark-submit --py-files
# on a multi-executor cluster at N and 4N executors").
#
# Packages the sparkval library into a zip and submits the CLI with it.
# Locally this runs against local[N]; on a real cluster swap --master
# for your YARN/K8s endpoint and size the executor flags — the engine
# code is identical either way (nothing in sparkval assumes local mode).
#
# Usage:
#   tools/submit.sh build-baseline --corpus C.parquet --out B.parquet
#   tools/submit.sh validate --corpus SNAP.parquet --baseline B.parquet
#
# Env:
#   SPARKVAL_MASTER     default local[8]      (cluster: yarn / k8s://...)
#   SPARKVAL_EXECUTORS  default (unset)       (cluster: --num-executors N;
#                                              scaling evidence = same job
#                                              at N and 4N)
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
MASTER="${SPARKVAL_MASTER:-local[8]}"
ZIP="$(mktemp -d)/sparkval.zip"

# library only — cli.py is the driver file, testdata/ and tests/ stay out
(cd "$REPO" && zip -qr "$ZIP" sparkval -x 'sparkval/__pycache__/*' -x '*/__pycache__/*')

EXTRA=()
if [[ -n "${SPARKVAL_EXECUTORS:-}" ]]; then
  EXTRA+=(--num-executors "$SPARKVAL_EXECUTORS")
fi

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  "${EXTRA[@]}" \
  "$REPO/sparkval/cli.py" "$@"
