#!/bin/bash
# Per-module LoC report (the reference's run_size.sh role, cloc-free:
# the container has no cloc, so count non-blank non-comment lines inline).
cd "$(dirname "$0")/.."

count() {
  # non-blank, non-pure-comment lines across the given files
  cat "$@" 2>/dev/null | grep -cvE '^\s*(#|//|$)'
}

line() { printf -- '---------------------------------------------\n'; }

line; echo " open_vins_tpu (device framework)"; line
for d in ops core models frontend init sim eval parallel utils; do
  n=$(count open_vins_tpu/$d/*.py)
  printf "  %-10s %6s LoC\n" "$d" "$n"
done
printf "  %-10s %6s LoC  (total)\n" "" "$(count open_vins_tpu/*/*.py)"

line; echo " native (C++ host runtime)"; line
printf "  %-10s %6s LoC\n" "native" "$(count native/*.cpp native/*.h)"

line; echo " examples (CLI tools)"; line
printf "  %-10s %6s LoC\n" "examples" "$(count examples/*.py)"

line; echo " tests"; line
printf "  %-10s %6s LoC\n" "tests" "$(count tests/*.py)"
