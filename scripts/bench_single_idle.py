"""Idle-verified single-query bench: the protocol for settling any
disputed per-query number on this wave-noisy host (BASELINE.md round-8
note: external load arrives in ~5-minute bursts, load1 observed up to
14.3 with zero user processes; a contaminated trial reads 4-16x).

Loop: park until ambient is genuinely idle (load1 < --start-load AND
load5 < --start-load5 — the 5-minute average catches a draining burst
that the 1-minute average has already forgiven), run
``SPARK_GRAFT_BENCH_ONLY=<query> bench.py`` (full contract-3 semantics:
fresh session, warmup, best-of-N, per-trial cache release), and ACCEPT
only if the load1 bench recorded for the query stayed <= --accept-load.
Accepted maps are copied to --out (default bench_single_<query>.json).

Usage:
  python scripts/bench_single_idle.py QUERY [--attempts N]
      [--start-load 1.0] [--start-load5 2.5] [--accept-load 3.0]
      [--out PATH]

Note on heavy parallel queries (the ML/graph NOISY set): bench itself on
local[32] contributes ~1-2 to the post-trial load1, so --accept-load 3.0
is the floor of what a multi-trial ML query can record even at zero
ambient; use ~4.0-4.5 for those and read the number against the
fresh-session history in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--attempts", type=int, default=10)
    ap.add_argument("--start-load", type=float, default=1.0)
    ap.add_argument("--start-load5", type=float, default=2.5)
    ap.add_argument("--accept-load", type=float, default=3.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-park-s", type=float, default=1800.0)
    args = ap.parse_args()
    out = args.out or os.path.join(HERE, f"bench_single_{args.query}.json")

    for attempt in range(1, args.attempts + 1):
        parked = 0.0
        while parked < args.max_park_s:
            l1, l5, _ = os.getloadavg()
            if l1 < args.start_load and l5 < args.start_load5:
                break
            time.sleep(20)
            parked += 20
        env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=args.query)
        # Remove any stale map BEFORE the attempt: if bench.py crashes we
        # must not re-read a previous session's numbers and "accept" them
        # as idle-verified (round-8 advisor finding).
        out_json = os.path.join(HERE, "bench_out.json")
        if os.path.exists(out_json):
            os.remove(out_json)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            env=env, cwd=HERE, capture_output=True, timeout=600)
        if proc.returncode != 0 or not os.path.exists(out_json):
            tail = proc.stderr.decode(errors="replace")[-500:]
            print(f"attempt {attempt}: bench.py failed "
                  f"(rc={proc.returncode}) -> retry\n{tail}", flush=True)
            continue
        with open(out_json) as f:
            d = json.load(f)
        t = d["queries"].get(args.query)
        l = d["load1"].get(args.query)
        ok = t is not None and l is not None and l <= args.accept_load
        print(f"attempt {attempt}: {args.query} = {t}s at load1 {l}"
              f" -> {'ACCEPT' if ok else 'retry'}", flush=True)
        if ok:
            shutil.copy(out_json, out)
            print(f"wrote {out}")
            return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
