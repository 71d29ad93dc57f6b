#!/bin/bash
# Round-close evidence script (VERDICT r12 task 5): one command that runs
# the FULL correctness gate and lands the builder-side per-query artifact,
# so an empty driver-side CORRECTNESS_r{N}.json (observed rounds 11 and 12)
# can never again leave a round without hash-level evidence.
#
#   bash tools/close_round.sh <round-number> [sf_dir]
#
# Produces CORRECTNESS_BUILDER_r{N}.json in the repo root (the driver
# artifact's exact shape, via tools/check.py --json) and exits nonzero if
# any query fails, errors, or is missing — a failing close is loud.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: close_round.sh <round-number> [sf_dir]}"
SF_DIR="${2:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft_close_rXXXX)"
ART="CORRECTNESS_BUILDER_r${ROUND}.json"

echo "[close] verify: full suite at ${SF_DIR} -> ${OUT}"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify ${SF_DIR} ${OUT}"

if [ -s "${OUT}/errors.json" ] && [ "$(cat "${OUT}/errors.json")" != "{}" ]; then
  echo "[close] FAIL: Verify recorded per-query errors:"
  cat "${OUT}/errors.json"
  exit 1
fi

echo "[close] oracle compare -> ${ART}"
# check.py writes the artifact BEFORE exiting nonzero on failures, so the
# evidence always lands; set -e then stops a failing close right here
python3 tools/check.py "${OUT}" "${SF_DIR}" --json "${ART}"

python3 - "$ART" <<'EOF'
import json, sys
rec = json.load(open(sys.argv[1]))
bad = {k: v for k, v in rec.items()
       if not (v.get("rows_match") and v.get("schema_match")
               and v.get("hash_match") and v.get("err") is None)}
print(f"[close] {len(rec)} queries recorded, {len(bad)} failing")
if bad:
    for k, v in sorted(bad.items())[:10]:
        print(f"  FAIL {k}: {v}")
    sys.exit(1)
EOF
echo "[close] OK — commit ${ART} with the round-close records"
