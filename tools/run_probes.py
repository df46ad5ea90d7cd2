"""Scale-probe rotation runner (VERDICT r8 item 7): re-run each older
probe's smallest configuration against the CURRENT code, one command —
a guard against silent plan regressions the value oracles cannot see
(an operator can stay bit-exact while its plan degrades to a global
sort or an all-pairs join; the probes measure the SHAPE).

Quick configs are the ONLY mode (ADVICE r9): every probe runs at a
size ~1/10 of its recorded BASELINE.md row — big enough that the
measured regime (shuffle shape, bucketing, banding) is the real one,
small enough that the full rotation finishes in minutes.  ``--quick``
is accepted for compatibility and is a no-op; any other flag is
rejected.  For a full-size run, invoke the probe script directly with
its BASELINE.md argv.

The registry covers the r1-r3 vintage (flagship melt, rank, dedup
banding, fanout, ANN ladder, connected components, skew, quantile
narrowing, incremental dedup, heavy hitters — rotated in r9) and the
r4-r5 vintage (span-dedup/BM25/novelty/token-shards, SNM/PSI/tfidf/
entropy, bigram-LM/containment/reconcile/MAD, Gopher/DSIR/fuzzy-
decontam/Matryoshka, dominant-PC/bloom/TextRank/basket-lift, pagerank
hub, curation battery — rotated in r10).  Each probe runs in its OWN
subprocess (own SparkSession, own JVM) so a hang or crash in one
cannot poison the rest, and the runner's verdict is per-probe.

Output: one JSON line per probe — {"probe", "ok", "wall_sec", "tail"}
(tail = the probe's last stdout line, which for JSON-emitting probes is
their measurement record) — then a summary line.  Nonzero exit if any
probe failed.

Usage: python tools/run_probes.py                  # all probes
       python tools/run_probes.py rank dedup       # subset by name
       python tools/run_probes.py r4 r4b pagerank  # the r10 rotation
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))

# name -> (script, quick argv).  Sizes are ~1/10 of each probe's recorded
# BASELINE.md row — big enough that the measured regime (shuffle shape,
# bucketing, banding) is the real one, small enough to finish fast.
QUICK = {
    "flagship": ("scale_probe.py", ["150000", "20", "4"]),
    "rank": ("scale_probe_rank.py", ["2000000", "2"]),
    "dedup": ("scale_probe_dedup.py", ["5000", "60"]),
    "fanout": ("scale_probe_fanout.py", ["2000000", "5"]),
    "ann": ("scale_probe_ann.py", ["20000", "100"]),
    "components": ("scale_probe_components.py", ["10000", "1000"]),
    "skew": ("scale_probe_skew.py", ["2000000", "1000"]),
    "quantile": ("scale_probe_quantile.py", ["5000000", "0.5"]),
    "incremental": ("scale_probe_incremental.py", ["5000", "20000", "80000"]),
    "heavy_hitters": ("scale_probe_heavy_hitters.py", ["100000", "0.001"]),
    # --- r4-r5 vintage (round-10 rotation: VERDICT r9 item 6) ---
    "r4": ("scale_probe_r4.py", ["100000"]),
    "r4b": ("scale_probe_r4b.py", ["100000", "2000000"]),
    "r4c": ("scale_probe_r4c.py", ["100000", "2000000"]),
    "r5": ("scale_probe_r5.py", ["200000", "50000"]),
    "r5b": ("scale_probe_r5b.py", ["100000", "20000"]),
    "pagerank": ("scale_probe_pagerank.py", ["100000", "10000", "10000"]),
    "curation": ("scale_probe_curation.py", ["100000"]),
    # --- r10 vintage (retrieval: batch BM25 query scaling + RRF fuse) ---
    "retrieval": ("scale_probe_retrieval.py", ["20480", "8"]),
    # --- r6-r7 vintage (round-11 rotation: VERDICT r10 item 6) ---
    "pq_trained": ("scale_probe_pq_trained.py", ["40000"]),
    "kcore": ("scale_probe_kcore.py", ["200000"]),
    "cache": ("scale_probe_cache.py", ["8"]),
    "graph": ("scale_probe_graph.py", ["100000", "10000", "5000"]),
    "semdedup": ("scale_probe_semdedup.py", ["10000", "0.3", "200"]),
    # --- r11 vintage (batch dense ANN + incremental BM25) ---
    "batch_ann": ("scale_probe_batch_ann.py", ["20000", "4"]),
    "bm25_incr": ("scale_probe_bm25_incr.py", ["10000", "8"]),
    "phrase": ("scale_probe_phrase.py", ["20000", "8"]),
}


def main() -> int:
    flags = [a for a in sys.argv[1:] if a.startswith("-")]
    if any(f != "--quick" for f in flags):
        print(
            f"unknown flags: {[f for f in flags if f != '--quick']}; "
            "quick configs are the only mode (--quick is an accepted "
            "no-op; run a probe script directly for full size)"
        )
        return 2
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    names = argv or list(QUICK)
    unknown = [n for n in names if n not in QUICK]
    if unknown:
        print(f"unknown probes: {unknown}; known: {sorted(QUICK)}")
        return 2
    failures = 0
    for name in names:
        script, args = QUICK[name]
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(TOOLS, script), *args],
                capture_output=True,
                text=True,
                timeout=900,
            )
            ok = proc.returncode == 0
            lines = [
                ln for ln in proc.stdout.strip().splitlines() if ln.strip()
            ]
            tail = lines[-1] if lines else ""
            if not ok:
                tail = (proc.stderr.strip().splitlines() or [tail])[-1]
        except subprocess.TimeoutExpired:
            # a hung probe is a FINDING (the runner exists to catch plan
            # regressions), not a runner crash — record and keep going
            ok, tail = False, "TIMEOUT after 900s"
        wall = round(time.time() - t0, 1)
        if not ok:
            failures += 1
        print(
            json.dumps(
                {"probe": name, "ok": ok, "wall_sec": wall, "tail": tail[:400]}
            ),
            flush=True,
        )
    print(f"PROBE FAILURES: {failures}/{len(names)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
