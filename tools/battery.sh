#!/usr/bin/env bash
# Full-test-battery runner with durable per-test logging.
# Each run writes battery_<label>.log (full sbt output, per-test
# durations) and target/test-reports/*.xml (JUnit XML: every test name,
# time, and failure detail) so a once-per-battery flake names itself.
#
# Usage: tools/battery.sh <label> [workdir]
set -u
label="${1:?usage: battery.sh <label> [workdir]}"
dir="${2:-$(cd "$(dirname "$0")/.." && pwd)}"
cd "$dir" || exit 2
log="battery_${label}.log"
start=$(date +%s)
sbt -batch test >"$log" 2>&1
rc=$?
end=$(date +%s)
echo "== battery $label: rc=$rc wall=$((end - start))s log=$dir/$log =="
grep -E "Tests: succeeded|All tests passed|\*\*\* [0-9]+ TESTS? FAILED|\*\*\* [0-9]+ SUITES? ABORTED" "$log" | tail -5
grep -E "\*\*\* FAILED \*\*\*|\*\*\* ABORTED \*\*\*" "$log" | head -40
exit $rc
