"""Merge full bench runs + idle singles into the round's CANONICAL map:
for each query, the minimum observed wall time across the given run maps,
with the load1 recorded by the run that produced the minimum. bench.py is
already best-of-N within a run; taking the min ACROSS runs is the same
de-noising one level up — on a host with external ~5-minute load waves
(BASELINE.md round-7/8 notes) no single 20-minute run lands fully idle,
but every query gets at least one uncontaminated trial across a few runs.

Usage: python scripts/bench_canonical.py OUT.json RUN1.json [RUN2.json ...]
Each RUN is a bench.py full map (the bench_out.json / bench_best_r{N}.json
shape: {"queries": {...}, "load1": {...}, ...}). Totals are recomputed
over the merged map using the run files' own headline/ML membership split
(a query in any run's map counts once).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    out, *runs = sys.argv[1:]
    maps = [json.load(open(p)) for p in runs]
    best: dict[str, float] = {}
    load: dict[str, float] = {}
    src: dict[str, str] = {}
    for path, m in zip(runs, maps):
        for q, t in m["queries"].items():
            if q not in best or t < best[q]:
                best[q] = t
                load[q] = m.get("load1", {}).get(q, m.get("load1_end"))
                src[q] = path.rsplit("/", 1)[-1]
    # abspath-based: a bare relative __file__ (some embedders / `python
    # scripts/bench_canonical.py` pre-3.9) would make the '/'-split land on
    # 'scripts' instead of the repo root (round-8 advisor finding)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE, ML_FIT
    headline = round(sum(best[q] for q in HEADLINE if q in best), 4)
    ml = round(sum(best[q] for q in ML_FIT if q in best), 4)
    doc = {
        "metric": "headline_queries_total_wall",
        "value": headline,
        "unit": "sec",
        "contract": 3,
        "note": ("canonical = per-query min across runs; see source map "
                 "for which run produced each number"),
        "ml_fit_total": ml,
        "sf": maps[0].get("sf"),
        "runs": [p.rsplit("/", 1)[-1] for p in runs],
        "queries": dict(sorted(best.items(), key=lambda kv: -kv[1])),
        "load1": load,
        "source_run": src,
    }
    with open(out, "w") as f:
        f.write(json.dumps(doc) + "\n")
    print(json.dumps({"value": headline, "ml_fit_total": ml,
                      "n": len(best), "out": out}))


if __name__ == "__main__":
    main()
