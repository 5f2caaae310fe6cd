#!/usr/bin/env python3
"""PLANS.md coverage ratchet — mechanical check that every benched query
whose effective time exceeds the threshold has a `## <name>` plan-audit
section in PLANS.md.

r17 VERDICT item 2: the r16/r17 round-close claims were each checked
against ONE clock (the builder's flat-box run) and falsified by the
driver's artifact. This script takes EVERY bench artifact you have —
builder runs, the driver's BENCH_results.json, anything in Bench's
output format — and unions the >threshold sets, so a claim checked at
close holds against all of them.

Effective time per query = isolated median where the artifact carries
one (the artifact's own contention adjudication), else the MIN across
passes (the most charitable non-isolated clock: if even the min is hot,
the query is genuinely hot). Failed queries (-1 sentinel) are skipped —
they are the correctness gate's problem, not the plan ratchet's.

Usage: python3 tools/plans_ratchet.py PLANS.md artifact.json [more.json ...]
Exit 0 = every hot query has a section; 1 = missing sections (listed).
"""
import json, re, sys

THRESHOLD_SEC = 1.0


def hot_set(path):
    d = json.load(open(path))
    iso = d.get("queries_isolated", {}) or {}
    qmin = d.get("queries_min", {}) or {}
    out = {}
    for name, med in (d.get("queries", {}) or {}).items():
        if med is None or med < 0:
            continue
        eff = iso.get(name, qmin.get(name, med))
        if eff is None or eff < 0:
            eff = med
        if eff > THRESHOLD_SEC:
            out[name] = eff
    return out


def main(plans_path, artifact_paths):
    sections = set(re.findall(r"^## (q\S+)", open(plans_path).read(), re.M))
    hot = {p: hot_set(p) for p in artifact_paths}  # parse each artifact once
    missing = {}
    for p in artifact_paths:
        for name, eff in hot[p].items():
            if name not in sections:
                missing.setdefault(name, []).append((p, round(eff, 2)))
    for name in sorted(missing):
        where = ", ".join(f"{p}={v}s" for p, v in missing[name])
        print(f"  MISSING section: {name} ({where})")
    n_hot = len({k for p in artifact_paths for k in hot[p]})
    verdict = "FAIL" if missing else "PASS"
    print(f"{verdict}: {len(missing)} missing / {n_hot} hot queries "
          f"(> {THRESHOLD_SEC}s effective) across {len(artifact_paths)} artifact(s); "
          f"{len(sections)} sections in {plans_path}")
    return 1 if missing else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
