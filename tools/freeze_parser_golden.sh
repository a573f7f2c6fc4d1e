#!/bin/sh
# Freeze pipeline outputs into golden/ — the DuckDB oracles for
# t_extract_parsers (150-conv fixture, sf-independent), t_extract and
# t_segment (bound to the driver's sf0.01 gate fixture) compare every
# future dump against these files value-for-value.
# Rerun ONLY when kernel/fold behavior deliberately changes, and re-verify
# the sbt-test goldens (src/test/resources/golden/) in the same change.
set -eu
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"   # must match the driver's gate SF
out=$(mktemp -d)
sbt -batch "runMain graft.Verify $SF_DIR $out"
rm -rf golden/extract_parsers golden/extract_full golden/segments
mkdir -p golden
cp -r "$out/t_extract_parsers" golden/extract_parsers
cp -r "$out/t_extract" golden/extract_full
cp -r "$out/t_segment" golden/segments
rm -rf "$out"
echo "frozen:"
du -sh golden/*
