"""Dump formatted physical plans of the flagship queries to PLANS.md —
plan-quality evidence (pushdown, pruning, broadcast, codegen spans)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    import __spark_entry__ as entrymod
    from mindocr_spark.session import get_spark

    sf = "/root/testdata/sf0.01"
    names = [
        "extract_interleaved",
        "pricing_summary",
        "order_revenue_topn",
        "cosine_topk",
        "minhash_lsh_pairs",
        "sessionize_events",
        "ngram_jaccard_filtered",
        "simhash_near_dup_banded",
        "embedding_near_dup_lsh",
    ]
    spark = get_spark(cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = ["# PLANS — formatted physical plans (sf0.01, round 3)\n"]
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
    spark.stop()
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
