#!/usr/bin/env python3
"""Append/refresh the 'sf1 decade' section of SCALING.md from two
filtered heavy-set Bench logs (dev tooling only).

Usage: tools/scaling_sf1.py /tmp/bench_heavy_sf01.log /tmp/bench_heavy_sf1.log

The heavy set runs at sf0.1 (driver testdata) and sf1 (the repo's
generated fixtures/sf1 decade, tools/gen_sf1.py); the exponent fit is
log(t_sf1/t_sf0.1)/log(10). Both runs must use the same query filter
and SPARK_GRAFT_CPUS so suite-context effects cancel.
"""
import json
import math
import re
import sys

MARK_A = "<!-- sf1-decade:start -->"
MARK_B = "<!-- sf1-decade:end -->"


def parse(path):
    m = re.search(r'\{"metric".*\}', open(path).read())
    if not m:
        raise SystemExit(f"no bench JSON in {path}")
    return json.loads(m.group(0))


def main(lo_path, hi_path):
    lo, hi = parse(lo_path), parse(hi_path)
    rows = []
    for q in sorted(lo["queries"]):
        t0, t1 = lo["queries"][q], hi["queries"].get(q)
        if t1 is None:
            continue
        exp = math.log(t1 / t0) / math.log(10)
        flag = " ⚠" if exp > 1.15 and t1 > 1.0 else ""
        rows.append((exp, q, t0, t1, flag))
    rows.sort(reverse=True)
    lines = [MARK_A, "", "## sf1 decade (heavy set, generated fixtures)", ""]
    lines.append(
        f"Heavy-set rehearsal one decade past the driver's largest SF: "
        f"sf0.1 = driver testdata, sf1 = `fixtures/sf1` "
        f"(tools/gen_sf1.py, ~10× rows, same schemas/distributions). "
        f"Totals: sf0.1 = {lo['value']:.0f}s, sf1 = {hi['value']:.0f}s "
        f"({len(rows)} queries). Exponent = log₁₀(t₁/t₀.₁); "
        f"⚠ = worse than ~linear (exp > 1.15) at a material runtime.")
    lines += ["", (
        "What the rehearsal caught (round 9), fixed before these "
        "numbers: (1) the exact M×N scored pass (knnJoin) inherited a "
        "1-split corpus scan — the whole quadratic budget on one core, "
        "10+ min single-threaded; now spread to cluster width "
        "(q191 6.6→1.7 s at sf0.1, ~24 s at sf1 across 32 lanes). "
        "(2) rankedNeighborsIvf's bucket join capped parallelism at "
        "C=10 bucket keys; now salted ×8. (3) Bench now sizes "
        "spark.sql.files.maxPartitionBytes to the bench scale (4m; "
        "SPARK_GRAFT_MAX_SPLIT) — parquet row groups permitting — so "
        "narrow pre-shuffle segments parallelize. (4) q174's cap-free "
        "PPJoin was QUADRATIC here (exp 2.04, 660 s): this corpus's "
        "closed ~31-word vocabulary keeps prefix postings dense, so "
        "the lossless path is inherently Ω(pairs) on it; adding "
        "PPJoin's length filter inside the pair fan-out (size-packed "
        "postings, prune before distinct) cut it 24.6× to 26.9 s "
        "(exp 0.72). On open-vocabulary corpora the prefix filter "
        "does the heavy pruning; on closed vocabularies the documented "
        "escalation is the capped q23 or LSH q24 path.")]
    lines += ["", "| query | sf0.1 | sf1 | exp | |", "|---|---|---|---|---|"]
    for exp, q, t0, t1, flag in rows:
        lines.append(f"| {q} | {t0:.2f}s | {t1:.2f}s | {exp:.2f} |{flag} |")
    lines += ["", MARK_B]
    block = "\n".join(lines)
    md = open("SCALING.md").read()
    if MARK_A in md:
        md = re.sub(re.escape(MARK_A) + ".*?" + re.escape(MARK_B), block,
                    md, flags=re.S)
    else:
        md = md.rstrip() + "\n\n" + block + "\n"
    open("SCALING.md", "w").write(md)
    print(f"sf1 decade section written ({len(rows)} queries)")
    for exp, q, t0, t1, flag in rows:
        if flag:
            print(f"  TRIAGE {q}: {t0:.2f}s -> {t1:.2f}s (exp {exp:.2f})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
