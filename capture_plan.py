#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/r12/.

Usage: python capture_plan.py <suffix> <query> [query...]
Writes plans/r12/<query>_<suffix>.txt (relative to $SPARK_GRAFT_PLAN_DIR
or this file's directory).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())
os.environ.setdefault("SPARK_GRAFT_PORTABLE_HASH", "0")

import __spark_entry__ as entry_mod
from moz_datapipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLAN_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r12"),
)

suffix = sys.argv[1]
names = sys.argv[2:]
# show the REAL computation plan, not a scan of severed checkpoint
# blocks (header below records this)
os.environ["SPARK_GRAFT_SEVER_PASSTHROUGH"] = "1"
HEADER = (
    "-- captured with SPARK_GRAFT_SEVER_PASSTHROUGH=1: checkpoint_sever\n"
    "-- patched to identity so the plan shows the computation that the\n"
    "-- sever would otherwise hide behind a severed-blocks scan.\n"
)
spark = get_spark(app_name="capture_plan")
qs = entry_mod.queries()
os.makedirs(OUT_DIR, exist_ok=True)
for name in names:
    df = qs[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(HEADER)
        f.write(buf.getvalue())
    print(path, len(buf.getvalue()), "chars")
