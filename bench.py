"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully executed (count of the materialized result) but not
collected to the driver — we time the distributed work, not result
transfer. A warmup run of the flagship query amortizes JVM/codegen start.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Headline set: scan-agg, star join, window, top-k, set-op + the LLM ops
# once they land. Keep this list in sync with the registry's best coverage.
HEADLINE = [
    "q1_pricing_summary",
    "join_revenue_by_nation",
    "join_lineitem_part_supplier",
    "window_top3_orders_per_customer",
    "top10_orders_by_price",
    "set_intersect_active_custkeys",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "sim_topk_bruteforce",
    "text_term_frequencies",
    "sess_session_window_30m",
    "sess_asof_last_signup",
    "sim_ivf_topk",
    "mm_frame_sample_hashes",
    "percentile_quantity_by_flag",
    "groupingsets_order_revenue",
    "join_left_customer_order_stats",
]


def main() -> None:
    from poormans_kube_etl_spark.queries import all_queries
    from poormans_kube_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pke-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    # also include any query tagged for bench via naming convention later

    # Warmup: JVM, codegen, parquet footer reads.
    qs["q1_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
