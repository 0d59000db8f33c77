"""Interleaved headline A/B between two repo trees (guide §1).

The host's ambient speed swings 1.3-2.3x between measurement windows
(attempt walls and the in-run DuckDB control both show it), so raw
bench totals from different windows are not comparable — the r13->r14
delta cannot be read off two separate bench runs.  This harness
alternates timing invocations of the TWO TREES inside one window
(A, B, A, B, ...), so both arms sample the same ambient distribution,
and merges per-query minima per arm — the drift-immune pairwise
comparison the round's per-change A/Bs used, applied tree-vs-tree.

Methodology per invocation (a fresh process pinned to one tree):
same timed action as bench.py — one noop-write per headline query with
the production-detail overrides — after a full sf0.001 warm pass
(JIT/first-touch, like bench.py's warm); K timed passes per invocation
so JVM warmth amortizes; minima merged across invocations per arm.

Usage:
  python tools/r14_headline_ab.py A_DIR B_DIR [--sf DIR] [--rounds N]
      [--passes K]
  python tools/r14_headline_ab.py --one-pass ARM_DIR SF_DIR K OUT_JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

PROD_OVERRIDE = {
    "q_minhash_near_dup": ("llmops", "minhash_near_dup_detail"),
    "q_dedup_clusters": ("llmops", "dedup_clusters_detail"),
    "q_ann_pq": ("llmops", "ann_pq_detail"),
    "q_decontam": ("corpus", "decontam_probe_detail"),
    "q_bloom_decontam": ("corpus", "bloom_decontam_probe_detail"),
}


def one_pass(arm_dir: str, sf_dir: str, k: int, out_json: str) -> None:
    sys.path.insert(0, arm_dir)
    os.chdir(arm_dir)
    import bench  # noqa: F401  (the arm's own headline list)
    import __spark_entry__ as entrymod
    from kinesis2elastic_spark.session import get_spark
    from kinesis2elastic_spark.operators import corpus, llmops

    spark = get_spark("r14-headline-ab")
    queries = entrymod.queries()
    mods = {"corpus": corpus, "llmops": llmops}

    def fn_for(name):
        ov = PROD_OVERRIDE.get(name)
        if ov and hasattr(mods[ov[0]], ov[1]):
            return getattr(mods[ov[0]], ov[1])
        return queries[name]

    names = list(bench.HEADLINE)
    spark.range(1000).count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:  # warm: JIT + schema/page first-touch
        try:
            fn_for(name)(spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:  # noqa: BLE001
            print(f"WARM-FAIL {name}: {e}", file=sys.stderr)

    passes = []
    for _ in range(k):
        import gc

        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        t: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.time()
            fn_for(name)(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            t[name] = round(time.time() - t0, 3)
        passes.append(t)
    with open(out_json, "w") as f:
        json.dump({"arm": arm_dir, "passes": passes}, f)


def main() -> None:
    if sys.argv[1] == "--one-pass":
        one_pass(sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5])
        return
    a_dir, b_dir = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    sf_dir = "/root/testdata/sf0.1"
    rounds, k = 2, 2
    args = sys.argv[3:]
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--rounds":
            rounds = int(args[i + 1]); i += 2
        elif args[i] == "--passes":
            k = int(args[i + 1]); i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    mins: dict[str, dict[str, float]] = {a_dir: {}, b_dir: {}}
    walls: dict[str, list[float]] = {a_dir: [], b_dir: []}
    me = os.path.abspath(__file__)
    for r in range(rounds):
        for arm in (a_dir, b_dir):
            out = tempfile.mktemp(suffix=".json")
            t0 = time.time()
            subprocess.run(
                [sys.executable, me, "--one-pass", arm, sf_dir, str(k), out],
                check=True,
                cwd=arm,
            )
            wall = time.time() - t0
            with open(out) as f:
                res = json.load(f)
            os.unlink(out)
            for t in res["passes"]:
                walls[arm].append(round(sum(t.values()), 2))
                for q, s in t.items():
                    mins[arm][q] = min(mins[arm].get(q, float("inf")), s)
            print(
                f"[round {r} arm {os.path.basename(arm)}] invocation "
                f"{wall:.0f}s, pass totals {walls[arm][-k:]}",
                flush=True,
            )

    qa, qb = mins[a_dir], mins[b_dir]
    shared = sorted(set(qa) & set(qb))
    print(f"\n== merged-min per arm over {rounds}x{k} interleaved passes ==")
    print(f"A={a_dir}\nB={b_dir}")
    print(f"A total {sum(qa[q] for q in shared):8.2f}s over {len(shared)} shared")
    print(f"B total {sum(qb[q] for q in shared):8.2f}s")
    print(f"A pass walls {walls[a_dir]}\nB pass walls {walls[b_dir]}")
    print(f"\n{'query':34s} {'A':>8s} {'B':>8s} {'B/A':>6s}")
    for q in sorted(shared, key=lambda q: qb[q] - qa[q]):
        r = qb[q] / qa[q] if qa[q] > 0 else float("inf")
        print(f"{q:34s} {qa[q]:8.3f} {qb[q]:8.3f} {r:6.2f}")


if __name__ == "__main__":
    main()
