"""Physical-plan audit helper: summarize the metrics PLANS.md tracks —
join strategies, exchanges, aggregates, Python stages, scan schemas and
pushed/partition filters — for one or more registry queries, straight
from `.explain("formatted")` on the live plan.

Rounds so far collected these numbers by hand per query; this prints
them in the PLANS.md shape so an entry (or a re-audit of an old one) is
one command:

    python tools/plan_audit.py ann_srp ann_ivfpq        # named queries
    python tools/plan_audit.py --top 5                  # 5 most
                                                        # expensive per
                                                        # BENCH_DETAIL
    python tools/plan_audit.py --sf /root/testdata/sf0.1 pricing_summary
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(spark, name: str, sf_dir: str) -> dict:
    from mysense_spark.queries import spark_queries

    df = spark_queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return {
        "query": name,
        "broadcast_hash_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "broadcast_nested_loop_joins": len(
            re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
        ),
        "cartesian_products": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
        "shuffle_exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "broadcast_exchanges": len(re.findall(r"\(\d+\) BroadcastExchange", plan)),
        "hash_aggregates": len(re.findall(r"\(\d+\) HashAggregate", plan)),
        "windows": len(re.findall(r"\(\d+\) Window", plan)),
        "arrow_python_stages": len(
            re.findall(
                r"\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
                r"FlatMapCoGroupsInPandas)",
                plan,
            )
        ),
        "row_python_stages": len(re.findall(r"\(\d+\) BatchEvalPython", plan)),
        "pushed_filters": [
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()
        ],
        "partition_filters": [
            m
            for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
            if m.strip()
        ],
        "read_schemas": sorted(set(re.findall(r"ReadSchema: (\S+)", plan))),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
        args = [a for a in args if a != sf_dir]
    names = args
    if "--top" in sys.argv:
        n = int(sys.argv[sys.argv.index("--top") + 1])
        names = [a for a in names if a != str(n)]
        detail = json.load(
            open(os.path.join(os.path.dirname(os.path.dirname(__file__)), "BENCH_DETAIL.json"))
        )["queries"]
        names += [k for k, _ in sorted(detail.items(), key=lambda kv: -kv[1])[:n]]
    if not names:
        print(__doc__)
        return

    from mysense_spark.session import get_spark

    spark = get_spark("plan-audit")
    for name in names:
        row = audit(spark, name, sf_dir)
        print(json.dumps(row, indent=1), flush=True)


if __name__ == "__main__":
    main()
