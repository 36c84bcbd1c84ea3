#!/bin/bash
# Per-file suite runner for hosts that kill long-running processes.
#
# On 2026-08-16 (r14 session) this box began SIGKILLing any pytest
# process at ~695-705 s of runtime (three consecutive full-suite runs
# died at 685/705/695 s with the Spark JVM vanishing mid-run — no OOM,
# no hs_err, cgroup counters clean — while the IDENTICAL code had run
# the monolithic suite green in 37:20 the same morning). Running each
# test file as its own pytest process stays under the kill window and
# gives the same complete signal; test_queries_oracle (the one >10-min
# file) runs as four round-robin name slices.
#
# Usage: bash tools/run_suite_chunked.sh   (writes /tmp/chunk_results.txt)
cd "$(dirname "$0")/.." || exit 1
rm -f /tmp/chunk_results.txt
fail=0
for f in tests/test_*.py; do
  base=$(basename "$f")
  if [ "$base" = "test_queries_oracle.py" ]; then
    for s in 0 1 2 3; do
      names=$(python3 - "$s" <<'PY'
import sys
from sport_data_pipeline_spark.plans import all_queries
names = sorted(all_queries())
s = int(sys.argv[1])
print(" or ".join(n for i, n in enumerate(names) if i % 4 == s))
PY
)
      python3 -m pytest "$f" -q -k "$names" > "/tmp/chunk_${base}_${s}.log" 2>&1
      rc=$?
      echo "${base}[slice $s]: rc=$rc $(tail -1 /tmp/chunk_${base}_${s}.log)" >> /tmp/chunk_results.txt
      [ $rc -ne 0 ] && fail=1
    done
  else
    python3 -m pytest "$f" -q > "/tmp/chunk_${base}.log" 2>&1
    rc=$?
    echo "${base}: rc=$rc $(tail -1 /tmp/chunk_${base}.log)" >> /tmp/chunk_results.txt
    [ $rc -ne 0 ] && fail=1
  fi
done
echo "ALL_DONE fail=$fail" >> /tmp/chunk_results.txt
exit $fail
