"""Per-action driver-floor probe — decomposes sequential query latency.

The north-rule scaling measurement (tools/scaling.py) shows the
sequential query suite scaling below the build (0.75 vs 0.94): each
``top_k().collect()`` pays a fixed driver-side cost — Catalyst analysis/
optimization of the (large) decode plan, py4j round-trips, job/stage
scheduling — that does NOT parallelize with executor cores, exactly like
a real cluster's driver. This tool MEASURES that floor at two
parallelism levels so BASELINE.md can report the decomposition instead
of asserting it:

  seq_query_sec(level) ~= floor_sec + compute_sec(level_lo) * lo/level

Method: the same query suite as scaling.py, but over a tiny index
(default 2,000 docs) where the distributed compute is negligible — the
measured per-query wall IS the floor. A bare ``spark.range(1).count()``
lane separates Spark's raw job-submission floor from the plan-analysis
part. Workers run in fresh pinned JVMs, mirroring scaling.py.

Output: one JSON line + FLOOR.json {level: {bare_action_sec,
per_query_floor_sec, per_query: {...}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(cpus: int, n_docs: int) -> None:
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import Index, build_index
    from lucene_spark.search import BoolQ, PhraseQ, Searcher, TermQ
    from lucene_spark.session import get_spark

    spark = get_spark(f"lucene_spark_floor_{cpus}", cpus=cpus)
    idx_dir = os.path.join(REPO, ".cache", f"floor_idx_{n_docs}_{cpus}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    pdf = make_corpus(n_docs, seed=7)
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["repo", "path", "lang"],
        num_buckets=16,
        salt_rows=1 << 14,
        resume=False,
    )
    searcher = Searcher(Index(spark, idx_dir))

    # bare job floor: no plan to speak of, one empty-ish stage
    for _ in range(3):  # warm the JVM / codegen caches first
        spark.range(1).count()
    t0 = time.time()
    bare_n = 10
    for _ in range(bare_n):
        spark.range(1).count()
    bare = (time.time() - t0) / bare_n

    # the scaling suite's query shapes: on a tiny index the distributed
    # compute is negligible, so per-query wall ~= the driver floor for
    # that plan shape (analysis + optimization + scheduling)
    suite = [
        ("term", TermQ("license"), 100),
        ("term_mid", TermQ("var_17"), 10),
        ("bool_must", BoolQ(must=(TermQ("public"), TermQ("class"))), 20),
        ("bool_should", BoolQ(should=(TermQ("import"), TermQ("return"), TermQ("func"))), 20),
        ("phrase", PhraseQ(("apache", "license")), 20),
    ]
    per_query = {}
    rounds = 3
    # one untimed warm-up round: the FIRST execution of each plan shape
    # pays one-off codegen/metadata costs a serving process never repays
    for _name, q, k in suite:
        searcher.top_k(q, k).collect()
    for name, q, k in suite:
        tq = time.time()
        for _ in range(rounds):
            searcher.top_k(q, k).collect()
        per_query[name] = round((time.time() - tq) / rounds, 3)
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "bare_action_sec": round(bare, 4),
                "per_query_floor_sec": round(
                    sum(per_query.values()) / len(per_query), 3
                ),
                "per_query": per_query,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--pin", action="store_true", default=True)
    ap.add_argument("--no-pin", dest="pin", action="store_false")
    ap.add_argument("rest", nargs="*")
    args = ap.parse_args()
    if args.worker is not None:
        _worker(args.worker, args.docs)
        return
    levels = sorted(int(x) for x in args.levels.split(","))
    out = {}
    for cpus in levels:
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--worker", str(cpus),
            "--docs", str(args.docs),
        ]
        if args.pin and shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        if proc.returncode != 0:
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"floor worker at local[{cpus}] failed")
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        out[str(cpus)] = json.loads(line)
        print(f"[floor] local[{cpus}]: {line}", file=sys.stderr)
    with open(os.path.join(REPO, "FLOOR.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
