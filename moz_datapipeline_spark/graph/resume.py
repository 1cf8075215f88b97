"""Cross-run resume for the scenario fan-out engines (G8 parity).

The reference's EAUL runner restarts from per-way results already in
S3 (script-eaul/README.md:63-97 — results upload per way; a rerun
skips ways whose output object exists).  The Spark-native equivalent:
scenario results append to a parquet checkpoint directory, and a rerun
anti-joins the scenario list against the keys already present, so only
unfinished scenarios recompute.

Atomicity note: a parquet append commits through Spark's staging
(`_temporary`) protocol — a run killed mid-write publishes nothing,
so the directory only ever contains complete scenario rows from fully
committed batches.  Resume granularity is therefore the invocation,
matching the reference's per-upload granularity when callers shard
long fan-outs into multiple calls.

The caller owns the directory lifecycle: results are keyed only by the
scenario columns, so reusing a checkpoint across different input
graphs/traffic would serve stale rows — delete the directory when
inputs change.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def resumable_apply(
    spark: SparkSession,
    scenarios: DataFrame,
    keys: Sequence[str],
    compute: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str | None,
) -> DataFrame:
    """Run ``compute`` over ``scenarios``, skipping rows whose ``keys``
    already have results in ``checkpoint_dir``; return ALL results.

    With ``checkpoint_dir=None`` this is just ``compute(scenarios)``.
    """
    if checkpoint_dir is None:
        return compute(scenarios)
    from pyspark.errors import AnalysisException

    existing = None
    try:
        existing = spark.read.parquet(checkpoint_dir)
        todo = scenarios.join(
            existing.select(*keys).distinct(), list(keys), "left_anti"
        )
    except AnalysisException:  # first run: no checkpoint directory yet
        todo = scenarios
    result = compute(todo)
    if existing is not None:
        # a drifted checkpoint must fail HERE, deterministically —
        # otherwise parquet schema inference picks whichever file it
        # lists first and the mismatch surfaces (or not) at random.
        # Compare (name, type) pairs, not just names: a same-named
        # column written as a different type creates a mixed-schema
        # directory whose read-back fails nondeterministically too.
        have = sorted((f.name, f.dataType.simpleString()) for f in existing.schema)
        want = sorted((f.name, f.dataType.simpleString()) for f in result.schema)
        if have != want:
            raise ValueError(
                f"checkpoint {checkpoint_dir} schema {have} does not match "
                f"result schema {want}; delete the directory or fix the "
                "writer that produced it"
            )
    prior_files = set(existing.inputFiles()) if existing is not None else set()
    result.write.mode("append").parquet(checkpoint_dir)
    if existing is None:
        # cold start: the directory holds exactly this run's rows
        return spark.read.parquet(checkpoint_dir)
    # warm resume: existing ∪ just-appended files only — a directory
    # LISTING (metadata) finds the new part files, but the data rescan
    # is O(new rows) instead of O(all results) per resume cycle.
    # ``existing``'s FileIndex was fixed at its read, so re-executing it
    # never double-counts the appended files.
    new_files = [
        f
        for f in spark.read.parquet(checkpoint_dir).inputFiles()
        if f not in prior_files
    ]
    if not new_files:
        return existing
    fresh = spark.read.schema(existing.schema).parquet(*new_files)
    return existing.unionByName(fresh)
