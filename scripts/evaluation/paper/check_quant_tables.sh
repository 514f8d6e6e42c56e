#!/bin/bash
# Acceptance check from the reference README.md:196-221: regenerate
# quant_tables/ with quantitative.sh and diff every table against the
# published originals (quant_tables_orig/).  Exact byte match per table.
#
# Usage: check_quant_tables.sh [generated_dir] [orig_dir]
#   generated_dir  defaults to ./quant_tables
#   orig_dir       defaults to /root/reference/quant_tables_orig
GEN=${1:-quant_tables}
ORIG=${2:-/root/reference/quant_tables_orig}

if [ ! -d "$GEN" ]; then
    echo "generated table directory $GEN not found — run scripts/evaluation/paper/quantitative.sh first" >&2
    exit 2
fi
if [ ! -d "$ORIG" ]; then
    echo "original table directory $ORIG not found" >&2
    exit 2
fi

PASS=0; FAIL=0; MISSING=0
for orig_file in "$ORIG"/*.txt; do
    name=$(basename "$orig_file")
    gen_file="$GEN/$name"
    if [ ! -f "$gen_file" ]; then
        echo "MISSING  $name"
        MISSING=$((MISSING + 1))
    elif diff -q "$orig_file" "$gen_file" > /dev/null; then
        echo "MATCH    $name"
        PASS=$((PASS + 1))
    else
        echo "DIFFERS  $name"
        diff "$orig_file" "$gen_file" | head -12 | sed 's/^/    /'
        FAIL=$((FAIL + 1))
    fi
done

echo
echo "summary: $PASS match, $FAIL differ, $MISSING missing (of $(ls "$ORIG"/*.txt | wc -l) tables)"
[ "$FAIL" -eq 0 ] && [ "$MISSING" -eq 0 ]
