"""Extra measurement harness for optimization round 7 (guide §1).

NOT the driver bench — bench.py is frozen. This file isolates each
headline query: times the computation alone through the noop sink
(guide §1.4), times the driver-contract ``collect()`` separately, and
dumps ``explain('formatted')`` for plan-shape evidence.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
PLAN_DIR = os.environ.get("BENCH_EXTRA_PLAN_DIR", "")

HEADLINE = [
    "pricing_summary",
    "top_customers",
    "order_rank_window",
    "user_running_value",
    "producer_wordcount",
    "codec_roundtrip_sha",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_knn",
    "text_quality",
    "multimodal_features",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from parquet_producers_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    qs = entrymod.queries()
    # warm-up exactly like bench.py
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    qs["text_quality"](spark, SF_DIR).limit(10).collect()
    out = {}
    for name in names:
        fn = qs[name]
        if PLAN_DIR:
            os.makedirs(PLAN_DIR, exist_ok=True)
            with open(os.path.join(PLAN_DIR, f"{name}.txt"), "w") as f:
                f.write(fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        noop_runs, collect_runs, nrows = [], [], 0
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noop_runs.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name}: collect")
            t0 = time.monotonic()
            rows = fn(spark, SF_DIR).collect()
            collect_runs.append(round(time.monotonic() - t0, 3))
            nrows = len(rows)
        out[name] = {
            "noop_best_s": min(noop_runs),
            "collect_best_s": min(collect_runs),
            "noop_runs": noop_runs,
            "collect_runs": collect_runs,
            "rows": nrows,
        }
        print(json.dumps({name: out[name]}), flush=True)
    total = round(sum(v["collect_best_s"] for v in out.values()), 3)
    print(json.dumps({"total_collect_best_s": total, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
