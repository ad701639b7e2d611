#!/usr/bin/env python3
"""Scale rehearsal: fit per-query scaling exponents from Bench runs at
multiple scale factors and write SCALING.md (inlined into PLANS.md by
graft.Plans) plus a marker-delimited section in BASELINE.md.

Usage: tools/scaling.py bench_sf0.001.log bench_sf0.01.log bench_sf0.1.log

exponent = log(t_hi / t_lo) / log(sf_hi / sf_lo) over the top decade
(sf0.01 -> sf0.1), where fixed per-query overhead matters least.
exponent <= ~1 is linear-or-better; > 1.15 is flagged. Sub-0.3 s
queries are overhead-dominated at every tested SF — their exponents
are noise and marked '~'. Dev tooling only, not part of the engine."""
import json, math, re, sys

def parse(path):
    txt = open(path).read()
    m = re.search(r'\{"metric".*\}', txt)
    if not m:
        raise SystemExit(f"no bench JSON line in {path}")
    j = json.loads(m.group(0))
    sf = float(re.search(r"sf([0-9.]+)", str(j["sf"])).group(1))
    return sf, j["queries"], j["value"]

def main(paths):
    runs = sorted((parse(p) for p in paths), key=lambda r: r[0])
    sfs = [r[0] for r in runs]
    totals = [r[2] for r in runs]
    qnames = sorted(runs[-1][1].keys())
    lo, hi = runs[-2], runs[-1]
    ratio = math.log(hi[0] / lo[0])
    rows, flagged = [], []
    for q in qnames:
        ts = [r[1].get(q) for r in runs]
        if ts[-1] is None or ts[-2] is None:
            continue
        exp = math.log(ts[-1] / ts[-2]) / ratio
        small = ts[-1] < 0.3
        flag = "" if small or exp <= 1.15 else " ⚠"
        if flag:
            flagged.append((q, exp))
        rows.append((q, ts, exp, small, flag))
    out = []
    out.append("## Scaling rehearsal (multi-SF bench)\n")
    out.append(f"Bench totals: " + ", ".join(
        f"sf{sf}={t:.0f}s" for sf, t in zip(sfs, totals)) + ". ")
    out.append(f"Exponent fit over sf{lo[0]}→sf{hi[0]} "
               "(log t ratio / log sf ratio); ≤1 = linear or better "
               "(sub-linear means fixed overhead still dominates), "
               "'~' = query under 0.3 s at the top SF (overhead-"
               "dominated, exponent is noise), ⚠ = worse than ~linear "
               "(exponent > 1.15) and worth a plan audit.\n")
    out.append("| query | " + " | ".join(f"sf{sf}" for sf in sfs) +
               " | exp | |")
    out.append("|---|" + "---|" * (len(sfs) + 2))
    for q, ts, exp, small, flag in rows:
        tcells = " | ".join("-" if t is None else f"{t:.2f}s" for t in ts)
        ecell = "~" if small else f"{exp:.2f}"
        out.append(f"| {q} | {tcells} | {ecell} |{flag} |")
    out.append("")
    if flagged:
        out.append("Flagged super-linear (audit these): " + ", ".join(
            f"{q} ({e:.2f})" for q, e in sorted(flagged, key=lambda x: -x[1])) + "\n")
    else:
        out.append("No query scales worse than ~linear over the top decade.\n")
    body = "\n".join(out)
    # preserve the decade rehearsal sections (tools/scaling_sf1.py)
    # across regenerations of the 3-SF table
    try:
        import re as _re
        old = open("SCALING.md").read()
        for mk in ("sf1", "sf10"):
            m = _re.search(
                rf"<!-- {mk}-decade:start -->.*?<!-- {mk}-decade:end -->",
                old, _re.S)
            if m:
                body = body.rstrip() + "\n\n" + m.group(0) + "\n"
    except FileNotFoundError:
        pass
    open("SCALING.md", "w").write(body)

    # BASELINE.md: replace (or append) the marker-delimited section
    begin, end = "<!-- scaling:begin -->", "<!-- scaling:end -->"
    base = open("BASELINE.md").read()
    block = f"{begin}\n\n{body}\n{end}\n"
    if begin in base:
        base = re.sub(re.escape(begin) + r".*?" + re.escape(end) + r"\n?",
                      block, base, flags=re.S)
    else:
        base = base.rstrip() + "\n\n" + block
    open("BASELINE.md", "w").write(base)
    print(f"wrote SCALING.md ({len(rows)} queries, {len(flagged)} flagged) "
          "and BASELINE.md scaling section")

if __name__ == "__main__":
    main(sys.argv[1:])
