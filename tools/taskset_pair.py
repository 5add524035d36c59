"""Affinity-pinned scaling pair (round 5, verdict #7).

The 8->32 efficiency number is capped by this box's all-core DVFS cliff
(clocks drop ~35% once >~8 cores are busy — measured by the
pure-multiprocessing control in tools/mp_control.py, ceiling 0.632).  To
show the PLAN scales when the hardware isn't the limiter, this tool runs
the same lo->hi extraction-throughput pair as bench.py but with the whole
process tree (JVM + python workers) pinned to a fixed CPU set via
``taskset``, so the hi run never lights up more cores than the pin and the
DVFS state is comparable between the pair members.  Default pair: 8 -> 16
pinned to cores 0-15.

Protocol matches bench.py: interleaved (lo, hi) sessions, paired ratios,
lower-median of 3 reps, min/max range reported.

Usage:
  python tools/taskset_pair.py                 # orchestrate (3 reps, 8->16)
  python tools/taskset_pair.py --measure DIR N # one pinned measurement
                                               # (internal; run via taskset)
Prints one JSON line in orchestrator mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIN = os.environ.get("SPARK_GRAFT_PIN", "0-15")
LO = int(os.environ.get("SPARK_GRAFT_PAIR_LO", "8"))
HI = int(os.environ.get("SPARK_GRAFT_PAIR_HI", "16"))
REPS = int(os.environ.get("SPARK_GRAFT_PAIR_REPS", "3"))


def _measure(corpus_dir: str, cores: int) -> None:
    from bench import _run_extraction_throughput

    dt, n = _run_extraction_throughput(cores, corpus_dir)
    print(json.dumps({"sec": dt, "docs": n}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        _measure(sys.argv[2], int(sys.argv[3]))
        return

    from bench import _prepare_scaling_corpus

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus_dir = _prepare_scaling_corpus(sf_dir)

    def run(cores: int) -> tuple[float, int]:
        out = subprocess.run(
            [
                "taskset", "-c", PIN, sys.executable, os.path.abspath(__file__),
                "--measure", corpus_dir, str(cores),
            ],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        return r["sec"], r["docs"]

    try:
        samples = []
        docs = 0
        for _ in range(REPS):
            t_lo, docs = run(LO)
            t_hi, _ = run(HI)
            samples.append((t_lo, t_hi, (t_lo / t_hi) / (HI / LO)))
        samples.sort(key=lambda s: s[2])
        t_lo, t_hi, eff = samples[(len(samples) - 1) // 2]
        print(
            json.dumps(
                {
                    "metric": "pinned_scaling_pair",
                    "pin": PIN,
                    "cores_lo": LO,
                    "cores_hi": HI,
                    "sec_lo": round(t_lo, 2),
                    "sec_hi": round(t_hi, 2),
                    "docs": docs,
                    "docs_per_sec_lo": round(docs / t_lo, 2),
                    "docs_per_sec_hi": round(docs / t_hi, 2),
                    "efficiency": round(eff, 3),
                    "efficiency_range": [
                        round(samples[0][2], 3),
                        round(samples[-1][2], 3),
                    ],
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
