"""Config sweep for the PageRank loop at bench scale: heap x cores x AQE.
Sequential fresh-JVM subprocesses; prints a table. Idle machine required.
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import os
os.environ["SPARK_DRIVER_MEMORY"] = {heap!r}
from scalemine_spark.session import get_spark
from pyspark.sql import functions as F
from scalemine_spark.algorithms import pagerank

cores = {cores}
extra = {{}}
if not {aqe}:
    extra["spark.sql.adaptive.enabled"] = "false"
spark = get_spark("sweep", cores=cores, shuffle_partitions=2 * cores, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet({edges!r}).repartition(2 * cores, "src").persist()
n = edges.count()
t0 = time.monotonic()
ranks, info = pagerank(edges, fixed_iters=5)
ranks.agg(F.sum("rank")).collect()
dt = time.monotonic() - t0
print("RESULT " + json.dumps({{"eps": n * 5 / dt, "t": dt}}))
spark.stop()
"""


def main():
    edges = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench_cache/synth_edges_60M.parquet")
    rows = []
    for heap, cores, aqe in itertools.product(["8g"], [8, 32], [False]):
        code = CODE.format(repo=REPO, heap=heap, cores=cores, aqe=aqe, edges=edges)
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=1500)
        res = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[7:])
        if res is None:
            print(f"heap={heap} cores={cores} aqe={aqe}: FAILED\n{r.stderr[-500:]}")
            continue
        rows.append((heap, cores, aqe, res["eps"], res["t"]))
        print(f"heap={heap} cores={cores:2d} aqe={int(aqe)}: {res['eps']:12.0f} eps  {res['t']:6.1f}s", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
