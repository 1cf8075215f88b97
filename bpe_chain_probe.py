#!/usr/bin/env python
"""Measure the bpe_segment merge-chain cost at several merge-table
sizes (VERDICT r12 item 4): apply synthetic merge tables of size N to
the sf documents corpus via (a) the production F.replace expression
chain and (b) an Arrow mapInPandas kernel applying the same compiled
merge list, and report wall times.  Synthetic merges (aa+aa, ab+ba, …)
exercise the chain mechanics; results establish where the codegen
chain stops being viable, independent of the learned-table content.
Usage: python bpe_chain_probe.py [sizes...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_PORTABLE_HASH", "0")

from pyspark.sql import functions as F

from moz_datapipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sizes = [int(a) for a in sys.argv[1:]] or [6, 64, 256, 1024]

spark = get_spark(app_name="bpe_chain_probe")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
    "doc_id", F.coalesce("text", F.lit("")).alias("text")
)
docs.count()

import itertools
import string


def synth_merges(n):
    """Deterministic synthetic merge list: successively longer
    left/right symbol pairs over a small alphabet."""
    out = []
    syms = [
        "".join(p)
        for k in (1, 2, 3, 4)
        for p in itertools.product(string.ascii_lowercase[:6], repeat=k)
    ]
    for i in range(n):
        a, b = syms[i % len(syms)], syms[(i * 7 + 1) % len(syms)]
        out.append((i, a, b, 2))
    return out


def run_chain(merges):
    from moz_datapipeline_spark.operators.bpe import bpe_segment

    seg = bpe_segment(docs, merges)
    out = seg.select(
        "doc_id",
        F.size("bpe_tokens").alias("n"),
        F.md5(F.concat_ws("\x1f", "bpe_tokens")).alias("h"),
    )
    t = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t


def run_pandas(merges):
    import pandas as pd

    table = [(f"|{a}||{b}|", f"|{a}{b}|") for _, a, b, _ in merges]

    def kernel(batches):
        import re as _re

        word_re = _re.compile(r"\S+")
        for pdf in batches:
            ids, ns, hs = [], [], []
            import hashlib

            for i, t in zip(pdf["doc_id"], pdf["text"]):
                toks = []
                for w in word_re.findall(t or ""):
                    sym = "||" + "||".join(w) + "||"
                    for pat, rep in table:
                        sym = sym.replace(pat, rep)
                    toks.extend(x for x in sym.split("||") if x)
                ids.append(i)
                ns.append(len(toks))
                hs.append(
                    hashlib.md5("\x1f".join(toks).encode()).hexdigest()
                )
            yield pd.DataFrame({"doc_id": ids, "n": ns, "h": hs})

    out = docs.mapInPandas(kernel, "doc_id long, n int, h string")
    t = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t


print("size\tchain_s(2 runs)\tpandas_s(2 runs)", flush=True)
for n in sizes:
    m = synth_merges(n)
    c = [round(run_chain(m), 2) for _ in range(2)]
    p = [round(run_pandas(m), 2) for _ in range(2)]
    print(f"{n}\t{c}\t{p}", flush=True)
