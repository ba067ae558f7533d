#!/usr/bin/env python3
"""Local simulator of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (with the sf tables registered
by name), sorts columns by name and rows by all columns, and compares
values. Prints a per-query PASS/FAIL summary. Local-iteration tool only —
not part of the library."""
import json
import math
import os
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and representation noise beyond round-trip precision
        return repr(round(v, 9) + 0.0)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def reject_nested(df, name, side):
    """The DRIVER's comparator sorts result frames with pandas
    sort_values, which raises on ndarray/list/dict cells — so any
    array- or struct-typed result column passes locally only because
    canon() stringifies it, then fails on the driver (the r9 8-query
    regression). Mirror the driver's real constraint: hard-fail here."""
    bad = []
    for c in df.columns:
        for v in df[c]:
            if v is None:
                continue
            if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
                bad.append(c)
            break
    if bad:
        raise ValueError(
            f"{name}: {side} result has nested column(s) {bad} — the "
            "driver comparator cannot sort these; reduce to scalar "
            "digests (QueryDefs.digestArray / digestWrap)")


def frame_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return cols, sorted(rows)


def coverage_gaps(query_names):
    """Inverse component map: every registry query must be cited by some
    COVERAGE.md row's correctness-query column, or a renamed query can
    silently orphan the component it certifies (VERDICT r8 #8). Returns
    the list of unmapped query names."""
    cov = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COVERAGE.md")
    try:
        with open(cov) as f:
            cited = set(re.findall(r"`([A-Za-z0-9_]+)`", f.read()))
    except OSError as e:
        print(f"WARN: cannot read COVERAGE.md ({e}); skipping coverage map")
        return []
    return sorted(q for q in query_names if q not in cited)


def header_drift(n_queries):
    """Doc headers advertise the registry size and keep lagging it:
    r10's COVERAGE.md said 198 while the registry held 209 (VERDICT r10
    #5); r11's README said 222 against 223 (VERDICT r11 #1). The dump
    may be a subset, so only a REGISTRY LARGER than a claimed count is
    provable drift — scan every query-count claim in COVERAGE.md and
    README.md so neither doc can lag again."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # (doc, pattern, all_matches): COVERAGE.md checks only its FIRST
    # count (the header — later mentions are round-history notes that
    # legitimately cite old sizes); README.md's claims are all current.
    claims = [
        ("COVERAGE.md", r"\*\*(\d+) queries", False),
        ("README.md", r"(\d+) operator queries", True),
        ("README.md", r"the (\d+) oracle-paired", True),
        # r12 ADVICE: a bench run labeled FINAL/full must not cite a
        # registry smaller than the current one — "the FINAL 234-query
        # tree" shipped while HEAD held 235 (round-HISTORY citations of
        # old sizes stay legal: they don't use the FINAL/full label)
        ("COVERAGE.md", r"FINAL (\d+)-query", True),
        ("COVERAGE.md", r"full (\d+)-query", True),
    ]
    msgs = []
    for doc, pat, all_matches in claims:
        try:
            with open(os.path.join(root, doc)) as f:
                text = f.read()
        except OSError:
            continue
        matches = re.finditer(pat, text) if all_matches else \
            [m for m in [re.search(pat, text)] if m]
        for m in matches:
            if n_queries > int(m.group(1)):
                msgs.append(
                    f"HEADER DRIFT: {doc} claims {m.group(1)} queries "
                    f"('{m.group(0)}') but this dump alone has "
                    f"{n_queries} — sync to QueryDefs.defs.size")
    return "\n".join(msgs) if msgs else None


def test_count_drift():
    """r12 VERDICT #6: COVERAGE.md's prose test count lagged the suite
    twice (409 claimed vs 419 measured). sbt writes per-suite JUnit XML
    under target/test-reports/ on every `sbt test`; summing their
    tests= attributes gives the measured count with no extra tooling.
    Only MEASURED > CLAIMED is provable drift (a selective testOnly run
    leaves stale per-suite XMLs that can undercount a fresh suite, and
    the dump may postdate a suite deletion)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reports = os.path.join(root, "target", "test-reports")
    try:
        xmls = [f for f in os.listdir(reports) if f.endswith(".xml")]
    except OSError:
        return None
    measured = 0
    for f in xmls:
        with open(os.path.join(reports, f)) as fh:
            m = re.search(r'tests="(\d+)"', fh.read())
            if m:
                measured += int(m.group(1))
    if not measured:
        return None
    try:
        with open(os.path.join(root, "COVERAGE.md")) as f:
            claims = re.findall(r"(\d+) ScalaTest", f.read())
    except OSError:
        return None
    msgs = [f"TEST-COUNT DRIFT: COVERAGE.md claims {c} ScalaTest tests "
            f"but target/test-reports sums to {measured} — re-run a full "
            "`sbt test`, then sync the prose"
            for c in claims if measured > int(c)]
    return "\n".join(msgs) if msgs else None


def main():
    if len(sys.argv) < 2:
        print(__doc__.strip())
        sys.exit(2)
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle_df = con.sql(sql).df()
            reject_nested(spark_df, name, "spark")
            reject_nested(oracle_df, name, "oracle")
            sc, sr = frame_rows(spark_df)
            oc, orows = frame_rows(oracle_df)
            if sc != oc:
                print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
                n_fail += 1
            elif len(sr) != len(orows):
                print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orows)}")
                n_fail += 1
            elif sr != orows:
                bad = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
                print(f"FAIL {name}: values differ; first diffs: {bad}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(sr)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    unmapped = coverage_gaps(oracles.keys())
    for q in unmapped:
        print(f"UNMAPPED {q}: not cited by any COVERAGE.md component row")
    drift = header_drift(len(oracles))
    if drift:
        print(drift)
    tdrift = test_count_drift()
    if tdrift:
        print(tdrift)
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracles)}"
          + (f"; {len(unmapped)} unmapped in COVERAGE.md" if unmapped else ""))
    sys.exit(1 if n_fail or unmapped or drift or tdrift else 0)


if __name__ == "__main__":
    main()
