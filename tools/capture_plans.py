"""Capture .explain("formatted") for every bench entry (registered
headline queries + bench-only probes) into plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt (default r15).

Usage: python tools/capture_plans.py <tag> [name ...]
  tag     -- suffix for the output files (before / after)
  name... -- optional subset of entry names; default = all

Same data path as bench.py (ensure_lake mirror for non-layout entries,
original fixture dir for the prepared-layout probes) so the captured
plans are exactly what the bench times. Eager operators (graph
triangles, cow probes) execute real work when called; the capture
records the returned frame's plan, which for those is the bounded
post-materialization scan -- their pipeline shape lives in the
registry's plan_probes, captured here too when present.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bigdata_storage_and_proccess_job_data_spark.plans import (  # noqa: E402
    bench_probes,
    registry,
)
from bigdata_storage_and_proccess_job_data_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    orig_sf_dir = sf_dir
    lake_dir = bench_probes.ensure_lake(spark, sf_dir)
    bench_probes.ensure_layouts(spark, orig_sf_dir)
    bench_probes.ensure_versioned_table(spark, orig_sf_dir)
    bench_probes.ensure_ivm_state(spark, orig_sf_dir)

    _LAYOUT_PROBES = {
        "point_lookup_lineitem",
        "version_prune_orders",
        "version_bloom_lookup",
        "incr_agg_refresh",
        "full_agg_recompute",
    }

    entries: dict = {}
    for name, qd in registry.headline_queries().items():
        entries[name] = (qd.fn, qd.plan_probes)
    for name, fn in bench_probes.bench_probes().items():
        entries[name] = (fn, ())

    for name, (fn, probes) in entries.items():
        if only and name not in only:
            continue
        d = orig_sf_dir if name in _LAYOUT_PROBES else lake_dir
        spark.sparkContext.setJobDescription(f"capture: {name}")
        try:
            df = fn(spark, d)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # keep going; record the failure
            txt = f"CAPTURE FAILED: {type(exc).__name__}: {exc}"
        parts = [txt]
        for i, probe in enumerate(probes):
            try:
                pdf = probe(spark, d)
                ptxt = pdf._sc._jvm.PythonSQLUtils.explainString(
                    pdf._jdf.queryExecution(), "formatted"
                )
            except Exception as exc:
                ptxt = f"PROBE {i} FAILED: {type(exc).__name__}: {exc}"
            parts.append(f"\n===== plan_probe[{i}] =====\n{ptxt}")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write("\n".join(parts))
        print(f"captured {name}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
