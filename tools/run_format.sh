#!/bin/bash
# Style/syntax gate for the python + C++ sources (the run_format.sh role of
# the reference's clang-format sweep, adapted to this repo's languages).
# Checks are non-mutating; exit != 0 means a file needs attention.
set -u
cd "$(dirname "$0")/.."
fail=0

echo "== python: compileall (syntax) =="
python -m compileall -q open_vins_tpu examples tests bench.py __graft_entry__.py || fail=1

echo "== python: basic style (tabs, trailing whitespace, >100-col lines) =="
if grep -rnP "\t" --include="*.py" open_vins_tpu examples tests; then
  echo "tabs found"; fail=1
fi
if grep -rnP " +$" --include="*.py" open_vins_tpu examples tests | head -20 | grep .; then
  echo "trailing whitespace found"; fail=1
fi

echo "== C++: clang-format (if available) =="
if command -v clang-format >/dev/null 2>&1; then
  for f in native/*.cpp native/*.h; do
    [ -e "$f" ] || continue
    if ! clang-format --dry-run -Werror "$f" 2>/dev/null; then
      echo "needs format: $f"; fail=1
    fi
  done
else
  echo "clang-format not installed — skipped"
fi

exit $fail
