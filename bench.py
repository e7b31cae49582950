"""Benchmark harness: HTML→text extraction throughput + per-query timings.

Headline workload: synthesize bench pages from the sf documents table
(replicated with filler paragraphs to realistic web-page sizes), run the
full extraction kernel, and force materialization with an aggregate.
Run at two parallelism levels (N and 4N local cores) on the SAME input to
evidence the north rule's cluster-size scaling efficiency; correctness of
the scaled run is pinned by the order-independent corpus checksum.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec at 4N>, "unit": "sec",
   "queries": {...}, "sf": ..., "docs_per_sec": ..., "mb_per_sec": ...,
   "scaling": {"n_cores": ..., "eff": ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "32"))
FILLER = int(os.environ.get("BENCH_FILLER", "10"))


def bench_pages(spark):
    """Bench corpus: documents × REPLICATE, each wrapped in a shell with
    FILLER extra paragraphs (FIXTURES.md §4 recipe: fixture inside
    boilerplate, urls over many hosts)."""
    from swiftsoup_spark.spark.pages import load_documents
    load_documents(spark, SF_DIR)
    return spark.sql(f"""
        SELECT 'https://host' || (doc_id % 1000) || '.test/p' || doc_id || '_' || r AS url,
               '<html><head><meta charset="utf-8"><title>Doc ' || doc_id ||
               '</title></head><body><div id="main" class="content"><h1>Doc ' || doc_id || '</h1>' ||
               repeat('<p class="filler">' || text || '</p>', {FILLER}) ||
               '<p class="core">' || text || ' &amp; more</p>' ||
               '</div><div class="footer"><a href="/l/' || doc_id || '">next</a></div></body></html>'
               AS html
        FROM documents
        CROSS JOIN (SELECT explode(sequence(1, {REPLICATE})) AS r)
    """)


def run_headline(n_cores: int):
    """Run the extraction workload on a fresh local[n] session.
    Returns (seconds, n_docs, total_mb, checksum)."""
    from swiftsoup_spark.spark.session import get_spark
    spark = get_spark(master=f"local[{n_cores}]", app=f"bench{n_cores}",
                      shuffle_partitions=n_cores)
    try:
        pages = bench_pages(spark)
        pages = pages.persist()
        stats = pages.agg(F.count("*").alias("n"),
                          F.sum(F.length("html")).alias("b")).collect()[0]
        n_docs, n_bytes = stats.n, stats.b
        from swiftsoup_spark.spark.extract import extract_pages
        t0 = time.time()
        ex = extract_pages(pages)
        row = ex.agg(F.count("*").alias("n"),
                     F.sum(F.length("text")).alias("tb"),
                     F.expr('bit_xor(xxhash64(concat_ws("\\u0000", url, text)))')
                      .alias("checksum")).collect()[0]
        dt = time.time() - t0
        pages.unpersist()
        return dt, n_docs, n_bytes / 1e6, row.checksum
    finally:
        spark.stop()


def run_query_timings():
    import __spark_entry__ as E
    from swiftsoup_spark.spark.session import get_spark
    spark = get_spark(master=f"local[{CPUS}]", app="bench-queries",
                      shuffle_partitions=CPUS)
    timings = {}
    try:
        for name, fn in E.queries().items():
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return timings


def _headline_subprocess(n_cores: int):
    """Fresh JVM per parallelism level (in-process session reuse was shown
    to distort timings)."""
    import subprocess
    code = (
        "import sys, json; sys.path.insert(0, %r); import bench; "
        "t, n, mb, c = bench.run_headline(int(sys.argv[1])); "
        "print('BENCHROW ' + json.dumps([t, n, mb, c]))"
        % os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code, str(n_cores)],
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    for line in r.stdout.splitlines():
        if line.startswith("BENCHROW "):
            return json.loads(line[len("BENCHROW "):])
    raise RuntimeError("no BENCHROW in output")


def main():
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    levels_env = os.environ.get("BENCH_LEVELS", f"{max(CPUS // 16, 2)},{CPUS // 4},{CPUS}")
    levels = sorted({int(x) for x in levels_env.split(",") if x.strip()})
    runs = {}
    for n in levels:
        t, n_docs, mb, cks = _headline_subprocess(n)
        runs[n] = {"sec": round(t, 3), "mb_per_sec": round(mb / t, 1),
                   "docs_per_sec": round(n_docs / t, 1), "checksum": cks}
    n_docs_total = n_docs
    big = levels[-1]
    checksums = {r["checksum"] for r in runs.values()}
    pairs = {}
    for a in levels:
        b4 = a * 4
        if b4 in runs:
            pairs[f"{a}to{b4}"] = round(
                runs[b4]["mb_per_sec"] / runs[a]["mb_per_sec"] / 4, 3)
    queries = run_query_timings()
    out = {
        "metric": f"html_to_text_extraction_sf{sf}",
        "value": runs[big]["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": int(n_docs_total),
        "input_mb": round(mb, 1),
        "docs_per_sec": runs[big]["docs_per_sec"],
        "mb_per_sec": runs[big]["mb_per_sec"],
        "scaling": {
            "levels": {str(k): v for k, v in runs.items()},
            "efficiency_n_to_4n": pairs,
            "checksum_match": len(checksums) == 1,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
