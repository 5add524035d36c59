"""Pure-multiprocessing scaling control for the N->4N evidence (BENCH.md).

Runs the EXACT per-image kernel (``media_payload_text``) over the derived
sf0.1 media payloads with ``multiprocessing.Pool`` — no Spark, no shuffle,
no Arrow — at each requested process count. Whatever efficiency THIS
achieves from 8 -> 32 procs is this box's hardware ceiling (all-core DVFS /
shared cache), because the work is embarrassingly parallel with zero
framework overhead. Spark's 8->32 efficiency is then judged against the
control's, not against the ideal 1.0.

Re-run whenever the kernels change speed (CLAUDE.md): faster kernels push
clock/bandwidth limits harder and the ceiling MOVES (r1: 0.71, r2: 0.68).

Usage: python tools/mp_control.py [replicas=4] [procs...=2 8 32]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, ".")


def _work(payload: bytes) -> int:
    from mindocr_spark.kernels.system import media_payload_text

    return len(media_payload_text(payload))


def main() -> None:
    import pandas as pd

    from mindocr_spark.data.derive_corpus import derive_corpus_pandas

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    procs = [int(a) for a in sys.argv[2:]] or [2, 8, 32]

    docs = pd.read_parquet("/root/testdata/sf0.1/documents.parquet")[
        ["doc_id", "text"]
    ]
    _, media = derive_corpus_pandas(docs)
    payloads = list(media["image"]) * replicas
    out: dict[str, dict] = {}
    for n in procs:
        with mp.Pool(n) as pool:
            pool.map(_work, payloads[: 32 * n])  # warm the workers
            best = None
            reps = 3 if n >= 8 else 1
            for _ in range(reps):
                t0 = time.time()
                pool.map(_work, payloads, chunksize=32)
                best = min(best or 9e9, time.time() - t0)
        out[str(n)] = {
            "sec": round(best, 2),
            "items_per_sec": round(len(payloads) / best, 1),
        }
    pairs = {}
    for lo, hi in zip(procs, procs[1:]):
        eff = (out[str(lo)]["sec"] / out[str(hi)]["sec"]) / (hi / lo)
        pairs[f"{lo}->{hi}"] = round(eff, 3)
    print(
        json.dumps(
            {"items": len(payloads), "points": out, "efficiency": pairs}
        )
    )


if __name__ == "__main__":
    main()
