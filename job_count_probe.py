#!/usr/bin/env python
"""Count Spark jobs/stages/tasks per query (noise-free structural
metrics). Usage: python job_count_probe.py q1 q2 ...  (or --all)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_PORTABLE_HASH", "0")

import __spark_entry__ as entry_mod
from moz_datapipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="job_count_probe")
spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
sc = spark.sparkContext
qs = entry_mod.queries()

names = sys.argv[1:]
if names == ["--all"]:
    names = sorted(qs)

jsc = sc._jsc.sc()


def snap():
    t = jsc.statusTracker()
    jobs = t.getJobIdsForGroup(None)
    return max(list(jobs) + [-1])


out = {}
for name in names:
    fn = qs[name]
    spark.catalog.clearCache()
    for rdd in sc._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)
    j0 = snap()
    try:
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        j1 = snap()
        njobs = j1 - j0
        out[name] = njobs
        print(f"{name}\tjobs={njobs}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}\tERR {e}", flush=True)
print(json.dumps(out))
