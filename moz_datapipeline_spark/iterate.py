"""Iteration hygiene for loops that re-join their own output.

``localCheckpoint(eager=True)`` truncates logical lineage AND RDD
lineage, but Spark's ``LogicalRDD`` PRESERVES the checkpointed plan's
estimated ``Statistics`` (``originStats``).  Size-only estimation
multiplies children's ``sizeInBytes`` at joins, so an iterative loop
whose round joins TWO frames derived from the previous round's
checkpoint SQUARES the estimate every round: the BigInt's bit length
doubles per round, and from ~15 rounds on the driver burns its time in
``BigInteger.multiply`` inside stats estimation — measured 2.5× wall
growth per round on 3-row frames, 0.5 s rounds becoming 120 s by round
19, with constant plans, constant RDD lineage, and an idle DAG
scheduler.

``checkpoint_sever`` is the loop-safe checkpoint: materialize eagerly,
then rebuild the frame from the checkpointed internal RDD WITHOUT the
origin statistics.  Planner-time stats fall back to the default size
(AQE still sees true runtime sizes at each exchange, so runtime join
strategy is unaffected); driver CPU per round becomes flat.

The fast path uses ``SparkSession.internalCreateDataFrame`` (Scala
``private[sql]``, public in bytecode — stable across the pinned Spark
line, zero-copy, no Python round-trip).  If that internal surface ever
moves, the fallback routes rows through ``createDataFrame(df.rdd,
schema)`` — same semantics, one Python serialization pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_sever(df: DataFrame) -> DataFrame:
    """Eager local checkpoint with origin-statistics severing — use
    instead of ``localCheckpoint(eager=True)`` inside iterative loops
    that JOIN frames derived from the previous round's checkpoint."""
    cp = df.localCheckpoint(eager=True)
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        jdf = cp._jdf
        jrdd = jdf.queryExecution().toRdd()
        spark = cp.sparkSession
        jds = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return _CDF(jds, spark)
    except Exception:
        # internal API moved: public rebuild (adds a Python pass)
        return cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
