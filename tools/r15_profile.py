"""r14 optimization-round profiler.

For each headline query (or an explicit list), measures on a warm session:
  - t_construct: time spent in queries[name](spark, sf_dir) — for the
    fixture-building interop queries this is where the commits happen;
  - t_write: the noop-write materialization (the bench's timed action);
  - n_jobs: Spark jobs launched per phase (statusTracker job-group count)
    — the scheduling-floor multiplier at sf0.1.
Optionally dumps .explain("formatted") to plans/r14/<q>_<tag>.txt.

Usage: python tools/r14_profile.py [--sf DIR] [--plans TAG] [--reps N] [q ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kinesis2elastic_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    plans_tag = None
    reps = 1
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    import bench

    if not names:
        names = list(bench.HEADLINE)

    spark = get_spark("r15-profile")
    queries = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    # warm like bench.py does
    spark.range(1000).count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:
        try:
            queries[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:  # noqa: BLE001
            print(f"WARM-FAIL {name}: {e}")

    rows = []
    for name in names:
        best = None
        for _ in range(reps):
            g1 = f"construct-{name}"
            sc.setJobGroup(g1, g1)
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t_construct = time.time() - t0
            n_jobs_c = len(tracker.getJobIdsForGroup(g1))
            if plans_tag:
                try:
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                    with open(
                        os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
                    ) as f:
                        f.write(plan)
                except Exception as e:  # noqa: BLE001
                    print(f"PLAN-FAIL {name}: {e}")
            g2 = f"write-{name}"
            sc.setJobGroup(g2, g2)
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t_write = time.time() - t0
            n_jobs_w = len(tracker.getJobIdsForGroup(g2))
            sc.setJobGroup("idle", "idle")
            cur = (t_construct + t_write, t_construct, t_write, n_jobs_c, n_jobs_w)
            if best is None or cur[0] < best[0]:
                best = cur
        total, t_construct, t_write, n_jobs_c, n_jobs_w = best
        rows.append((name, total, t_construct, t_write, n_jobs_c, n_jobs_w))
        print(
            f"{name:32s} total={total:7.3f}  construct={t_construct:7.3f} "
            f"(jobs={n_jobs_c:3d})  write={t_write:7.3f} (jobs={n_jobs_w:3d})",
            flush=True,
        )

    print("\n== slowest first ==")
    for name, total, tc, tw, jc, jw in sorted(rows, key=lambda r: -r[1]):
        print(
            f"{name:32s} total={total:7.3f}  construct={tc:7.3f}/{jc}j "
            f"write={tw:7.3f}/{jw}j"
        )
    print(f"TOTAL {sum(r[1] for r in rows):.3f}s over {len(rows)} queries")


if __name__ == "__main__":
    main()
