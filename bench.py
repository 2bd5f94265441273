"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect) with a warm session;
the first query pays JVM/codegen warmup, so a trivial warmup query
runs first and is not counted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from examples_scala_spark.queries import REGISTRY  # noqa: E402
from examples_scala_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customer",
    "w_avg_temp",
    "rolling_max_by",
    "alert_temp_delta",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ann_topk_bruteforce",
    "token_count",
    "media_meta",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer + codegen paths
    REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        # collect (not count) so column pruning can't skip the computed
        # columns we're benchmarking
        n = len(REGISTRY[name].fn(spark, sf_dir).collect())
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
