#!/usr/bin/env python3
"""Aggregate graft coverage agent TSVs into line/branch coverage.

Line coverage: executable lines (lines with LineNumberTable entries in
the instrumented bytecode) hit in ANY dump, unioned across all classes
compiled from the same source file.

Branch coverage: two-way conditional jumps contribute 2 edges each —
fallthrough taken iff fallCount > 0, jump taken iff siteCount >
fallCount (the probes bracket the jump). Switches contribute 1 edge
(executed or not); per-case switch edges would need trampoline
instrumentation (documented limitation).

Usage: report.py [dumpdir] [--per-file] [--gate[=LINE_PCT]]

--gate makes the report an enforcing CI gate (the reference fails its
build below 90% line / 75% branch, build.gradle:216-232): exit 1 when
TOTAL line coverage is below LINE_PCT (default 90). The branch number is
reported but not gated — bytecode-edge branch coverage is not comparable
to the reference's source-level JaCoCo metric (see BASELINE.md §round-12).
"""
import sys, os, glob
from collections import defaultdict


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    per_file = "--per-file" in sys.argv
    gate = None
    for a in sys.argv[1:]:
        if a == "--gate":
            gate = 90.0
        elif a.startswith("--gate="):
            gate = float(a.split("=", 1)[1])
    dumpdir = args[0] if args else "target/coverage"
    files = sorted(glob.glob(os.path.join(dumpdir, "coverage-*.tsv")))
    if not files:
        print(f"no coverage-*.tsv under {dumpdir}", file=sys.stderr)
        sys.exit(1)

    # source key = (package dir of class, source file name)
    line_hit = defaultdict(bool)        # (src, line) -> hit
    # branch sites keyed per class (site identity = class + order index)
    branch = {}                          # (cls, idx) -> [src, line, site, fall, isswitch]
    site_counter = defaultdict(int)

    for f in files:
        per_class_idx = defaultdict(int)
        with open(f) as fh:
            for row in fh:
                parts = row.rstrip("\n").split("\t")
                if parts[0] == "L":
                    _, cls, srcf, line, hit = parts
                    src = (os.path.dirname(cls), srcf)
                    key = (src, int(line))
                    line_hit[key] = line_hit[key] or hit == "1"
                elif parts[0] == "B":
                    _, cls, srcf, line, site, fall, issw = parts
                    idx = per_class_idx[cls]
                    per_class_idx[cls] += 1
                    key = (cls, idx)
                    src = (os.path.dirname(cls), srcf)
                    if key not in branch:
                        branch[key] = [src, int(line), 0, 0, issw == "1"]
                    branch[key][2] += int(site)
                    branch[key][3] += int(fall)

    # line coverage per source
    per_src_lines = defaultdict(lambda: [0, 0])  # src -> [covered, total]
    for (src, _line), hit in line_hit.items():
        per_src_lines[src][1] += 1
        if hit:
            per_src_lines[src][0] += 1

    # branch coverage per source
    per_src_br = defaultdict(lambda: [0, 0])  # src -> [covered edges, total edges]
    for (_cls, _idx), (src, _line, site, fall, issw) in branch.items():
        if issw:
            per_src_br[src][1] += 1
            if site > 0:
                per_src_br[src][0] += 1
        else:
            per_src_br[src][1] += 2
            if fall > 0:
                per_src_br[src][0] += 1
            if site > fall:
                per_src_br[src][0] += 1

    if per_file:
        for src in sorted(per_src_lines):
            lc, lt = per_src_lines[src]
            bc, bt = per_src_br.get(src, (0, 0))
            bpct = f"{100*bc/bt:5.1f}%" if bt else "   — "
            print(f"{100*lc/lt:5.1f}% lines ({lc}/{lt})  {bpct} branches ({bc}/{bt})"
                  f"  {src[0]}/{src[1]}")

    lc = sum(v[0] for v in per_src_lines.values())
    lt = sum(v[1] for v in per_src_lines.values())
    bc = sum(v[0] for v in per_src_br.values())
    bt = sum(v[1] for v in per_src_br.values())
    line_pct = 100 * lc / lt
    print(f"TOTAL line coverage:   {line_pct:.2f}% ({lc}/{lt} executable lines)")
    print(f"TOTAL branch coverage: {100*bc/bt:.2f}% ({bc}/{bt} edges; switches=1 edge)")
    print(f"dumps: {len(files)}")
    if gate is not None:
        if line_pct < gate:
            print(f"COVERAGE GATE FAILED: {line_pct:.2f}% < {gate:.2f}% line",
                  file=sys.stderr)
            sys.exit(1)
        print(f"coverage gate passed: {line_pct:.2f}% >= {gate:.2f}% line")


if __name__ == "__main__":
    main()
