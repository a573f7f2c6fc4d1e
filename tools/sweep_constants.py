#!/usr/bin/env python3
"""Gate-vacuity sweep: scan every Verify dump for single-valued columns.

A driver gate is only as strong as the variation it observes. A boolean
verdict column that is constant across the whole sf0.01 dump (header_ok
always true, retrain_due always false, anti-join side always empty) means
the gate never sees the other branch — a broken implementation that
hard-codes the constant would pass. Round 4's e_ann_retrain and round 5's
m_features/d_exact_dedup/d_ngram_lm vacuities were all of this shape; this
tool makes the sweep that found them repeatable.

Usage:
    python3 tools/sweep_constants.py /tmp/verify_out [--all]

Reports, per query, columns with exactly one distinct non-null value
(ignoring single-row results, where constancy is structural). By default
only flags columns whose NAME looks verdict-like (boolean dtype, or
matching ok/flag/due/is_/has_/_match/kept/dropped/valid patterns) — the
interesting gates; --all lists every constant column including scores and
keys, for a manual pass.

Known-acceptable constants are whitelisted inline with the reason; add an
entry ONLY with a comment saying why the constant is not a vacuous gate.
"""
import glob
import os
import re
import sys

import duckdb

# (query, column) -> why a constant here is fine (structural, not a gate)
WHITELIST = {
    # single literal scenario tag distinguishing this dump from its twin query;
    # the twin's value differs, so the pair is non-vacuous jointly
    ("d_clf_sep_train", "corpus"): "scenario tag, constant by construction",
    ("d_clf_train", "corpus"): "scenario tag, constant by construction",
    # structural: passthrough extraction is identity and cannot fail; the
    # corpus keeps U+FFFD markers off passthrough turns BY INVARIANT (the
    # identity oracle depends on it — PipelineSpec "corpus hygiene" pins
    # this), so error=false here is the invariant holding, not a blind
    # gate. The error branch is driver-visible in t_extract/t_extract_
    # parsers/t_lineage, which share the kernel and the quarantine path.
    ("t_extract_passthrough", "error"): "identity cannot fail; corpus invariant",
}

VERDICTY = re.compile(
    r"(^|_)(ok|flag|flags|due|fired|kept|dropped|valid|match|matched|hit|"
    r"pass|passed|dup|is|has|should|alive|empty|over|under)(_|$)|"
    r"^(is_|has_|any_|all_)", re.I)


def main() -> int:
    out_dir = sys.argv[1]
    show_all = "--all" in sys.argv[2:]
    con = duckdb.connect()
    findings, info = [], []
    for qdir in sorted(glob.glob(out_dir + "/*")):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        if not glob.glob(qdir + "/*.parquet"):
            continue
        rel = f"read_parquet('{qdir}/*.parquet')"
        nrows = con.sql(f"SELECT count(*) FROM {rel}").fetchone()[0]
        if nrows <= 1:
            continue  # constancy is structural in a 1-row result
        cols = con.sql(f"DESCRIBE SELECT * FROM {rel}").df()
        for col, dtype in zip(cols["column_name"], cols["column_type"]):
            if dtype.startswith(("STRUCT", "MAP")) or "[]" in dtype:
                continue  # nested: spot-check by hand if ever relevant
            # exact, not approx_count_distinct: the tool's whole job is
            # telling cardinality 1 from 2, and the dumps are small
            q = f'SELECT count(DISTINCT "{col}") FROM {rel} WHERE "{col}" IS NOT NULL'
            try:
                nd = con.sql(q).fetchone()[0]
            except Exception:
                continue
            if nd > 1:
                continue
            val = con.sql(
                f'SELECT "{col}" FROM {rel} WHERE "{col}" IS NOT NULL LIMIT 1'
            ).fetchone()
            val = val[0] if val else None
            entry = (name, col, dtype, repr(val)[:40], nrows)
            if (name, col) in WHITELIST:
                continue
            if dtype == "BOOLEAN" or VERDICTY.search(col):
                findings.append(entry)
            else:
                info.append(entry)

    for name, col, dtype, val, nrows in findings:
        print(f"GATE? {name:24s} {col:24s} {dtype:10s} = {val} ({nrows} rows)")
    if show_all:
        for name, col, dtype, val, nrows in info:
            print(f"const {name:24s} {col:24s} {dtype:10s} = {val} ({nrows} rows)")
    print(f"\n{len(findings)} verdict-like constant columns"
          f"{'' if show_all else f' (+{len(info)} other constants; --all to list)'}")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
