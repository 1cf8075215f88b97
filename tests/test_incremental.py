"""Incremental dedup against the persistent MinHash signature store."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.incremental import incremental_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines here"
)
THIRD = (
    "a third unrelated passage mentioning mountains rivers forests and "
    "the slow geological processes that shaped them over millions of years"
)


@pytest.fixture()
def store(tmp_path):
    d = str(tmp_path / "sigstore")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestWithinBatch:
    def test_duplicate_group_keeps_smallest_id(self, spark):
        batch = _docs(
            spark,
            [(1, BASE), (2, BASE), (7, BASE + " extra"), (5, OTHER)],
        )
        out = incremental_dedup(spark, batch, None, threshold=0.5)
        assert sorted(r.doc_id for r in out.collect()) == [1, 5]

    def test_disjoint_docs_all_survive(self, spark):
        batch = _docs(spark, [(1, BASE), (2, OTHER), (3, THIRD)])
        out = incremental_dedup(spark, batch, None, threshold=0.5)
        assert out.count() == 3

    def test_empty_text_survives(self, spark):
        batch = _docs(spark, [(1, BASE), (2, "")])
        out = incremental_dedup(spark, batch, None, threshold=0.5)
        assert sorted(r.doc_id for r in out.collect()) == [1, 2]


class TestStore:
    def test_cross_batch_duplicates_dropped(self, spark, store):
        b1 = _docs(spark, [(1, BASE), (2, OTHER)])
        s1 = incremental_dedup(spark, b1, store, threshold=0.5)
        assert s1.count() == 2
        # batch 2: near-dup of stored doc 1, plus fresh content
        b2 = _docs(spark, [(10, BASE + " tail"), (11, THIRD)])
        s2 = incremental_dedup(spark, b2, store, threshold=0.5)
        assert sorted(r.doc_id for r in s2.collect()) == [11]

    def test_reingest_is_idempotent(self, spark, store):
        b1 = _docs(spark, [(1, BASE), (2, OTHER)])
        incremental_dedup(spark, b1, store, threshold=0.5).count()
        again = incremental_dedup(spark, b1, store, threshold=0.5)
        assert again.count() == 0  # every doc matches its own stored sig

    def test_only_survivor_signatures_are_stored(self, spark, store):
        b1 = _docs(spark, [(1, BASE), (2, BASE)])
        incremental_dedup(spark, b1, store, threshold=0.5).count()
        stored_ids = [
            r.doc_id
            for r in spark.read.parquet(store + "/sigs")
            .select("doc_id")
            .collect()
        ]
        assert stored_ids == [1]

    def test_parameter_drift_raises(self, spark, store):
        b1 = _docs(spark, [(1, BASE)])
        incremental_dedup(spark, b1, store, num_hashes=32, bands=8).count()
        with pytest.raises(ValueError, match="parameters"):
            incremental_dedup(
                spark, _docs(spark, [(2, OTHER)]), store,
                num_hashes=16, bands=4,
            ).count()

    @pytest.mark.deep
    def test_portable_and_fast_hash_agree_on_survivors(self, spark, tmp_path):
        rows = [(1, BASE), (2, BASE + " x"), (3, OTHER), (4, THIRD)]
        outs = []
        for mode in (True, False):
            d = str(tmp_path / f"store_{mode}")
            incremental_dedup(
                spark, _docs(spark, rows[:2]), d,
                threshold=0.5, portable_hash=mode,
            ).count()
            s = incremental_dedup(
                spark, _docs(spark, rows[2:]), d,
                threshold=0.5, portable_hash=mode,
            )
            outs.append(sorted(r.doc_id for r in s.collect()))
        assert outs[0] == outs[1] == [3, 4]


class TestStoreLayout:
    """The partitioned store: ingest prunes its scans, appends stay
    small-file-bounded, compaction merges the debris — the three
    properties that make batch cost independent of store size."""

    def test_ingest_prunes_store_scans(self, spark, store):
        from moz_datapipeline_spark.operators.incremental import (
            incremental_dedup as incr,
        )

        incr(
            spark, _docs(spark, [(1, BASE), (2, OTHER)]), store, threshold=0.5
        ).count()
        dbg = {}
        out = incr(
            spark,
            _docs(spark, [(10, BASE + " tail"), (11, THIRD)]),
            store,
            threshold=0.5,
            debug_scans=dbg,
        )
        assert sorted(r.doc_id for r in out.collect()) == [11]

        # bands scan: partition pruning on bb + literal band-hash pushdown
        plan = (
            dbg["bands_scan"]._jdf.queryExecution().executedPlan().toString()
        )
        pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        assert "bb" in pf and ("IN" in pf.upper() or "=" in pf)
        pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
        assert "band_hash" in pushed

        # sigs scan: pruned to the candidate old-ids' buckets
        plan2 = (
            dbg["sigs_scan"]._jdf.queryExecution().executedPlan().toString()
        )
        pf2 = plan2.split("PartitionFilters", 1)[1].split("]", 1)[0]
        assert "sb" in pf2 and ("IN" in pf2.upper() or "=" in pf2)

    def test_append_bound_then_compaction_merges(self, spark, store):
        from moz_datapipeline_spark.operators.incremental import (
            compact_signature_store,
            incremental_dedup as incr,
            signature_store_file_count,
        )

        kw = dict(threshold=0.5, band_buckets=8, sig_buckets=4)
        batches = [
            _docs(
                spark,
                [
                    (
                        100 * i + j,
                        " ".join(f"w{i}x{j}tok{t}" for t in range(12)),
                    )
                    for j in range(2)
                ],
            )
            for i in range(4)
        ]
        for b in batches:
            incr(spark, b, store, **kw).count()
        pre = signature_store_file_count(spark, store)
        # single-task appends: at most one file per touched partition
        # value per batch (2 docs x 8 bands = <=16 band files, <=2 sig
        # files each)
        assert pre["bands_files"] <= 4 * 16
        assert pre["sigs_files"] <= 4 * 2
        post = compact_signature_store(spark, store)
        # one file per surviving partition value
        assert post["bands_files"] <= 8
        assert post["sigs_files"] <= 4
        assert post["bands_files"] <= pre["bands_files"]
        # the compacted store still serves ingest: replay batch 0
        # (idempotent: zero survivors), then a fresh near-dup batch
        assert incr(spark, batches[0], store, **kw).count() == 0
        dup_of_b1 = _docs(
            spark,
            [(999, " ".join(f"w1x0tok{t}" for t in range(12)) + " pad")],
        )
        assert incr(spark, dup_of_b1, store, **kw).count() == 0


class TestPrune:
    def test_pruned_doc_no_longer_blocks_admission(self, spark, store):
        from moz_datapipeline_spark.operators.incremental import (
            incremental_dedup as incr,
            prune_signature_store,
        )

        incr(
            spark, _docs(spark, [(1, BASE), (2, OTHER)]), store, threshold=0.5
        ).count()
        # near-dup of stored doc 1 is dropped while 1 is remembered
        dup = _docs(spark, [(10, BASE + " tail")])
        assert incr(spark, dup, store, threshold=0.5).count() == 0
        out = prune_signature_store(
            spark, store, spark.createDataFrame([(1,)], "doc_id long")
        )
        assert out["removed"] == 1
        stored = spark.read.parquet(store + "/sigs")
        assert sorted(r.doc_id for r in stored.collect()) == [2]
        # the forgotten document's near-dups are admitted again
        dup2 = _docs(spark, [(11, BASE + " tail two")])
        assert incr(spark, dup2, store, threshold=0.5).count() == 1

    def test_prune_everything_refused(self, spark, store):
        from moz_datapipeline_spark.operators.incremental import (
            incremental_dedup as incr,
            prune_signature_store,
        )

        incr(spark, _docs(spark, [(1, BASE)]), store, threshold=0.5).count()
        with pytest.raises(ValueError, match="re-bootstrap"):
            prune_signature_store(
                spark, store, spark.createDataFrame([(1,)], "doc_id long")
            )


class TestStreamingIngest:
    def test_stream_batches_dedup_against_store_and_replay_is_idempotent(
        self, spark, tmp_path
    ):
        """Two JSON micro-batch files stream through ingest_dedup_stream;
        cross-batch near-dups are dropped, and re-running the stream
        with a FRESH checkpoint (a full replay) adds zero new rows to
        the sink because every doc matches its own stored signature."""
        import json as _json

        from moz_datapipeline_spark.streaming.stateful import (
            ingest_dedup_stream,
        )

        src = tmp_path / "src"
        src.mkdir()
        store = str(tmp_path / "store")
        out = str(tmp_path / "out")
        (src / "b1.json").write_text(
            "\n".join(
                _json.dumps(d)
                for d in [
                    {"doc_id": 1, "text": BASE},
                    {"doc_id": 2, "text": OTHER},
                ]
            )
        )
        (src / "b2.json").write_text(
            "\n".join(
                _json.dumps(d)
                for d in [
                    {"doc_id": 10, "text": BASE + " tail"},  # dup of 1
                    {"doc_id": 11, "text": THIRD},
                ]
            )
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)  # one micro-batch per file
            .json(str(src))
        )
        q = ingest_dedup_stream(
            stream, store, out, str(tmp_path / "chk"), threshold=0.5
        )
        q.awaitTermination(120)
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert got == [1, 2, 11]  # 10 dropped against stored 1

        # full replay (fresh checkpoint): nothing new reaches the sink
        stream2 = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q2 = ingest_dedup_stream(
            stream2, store, out, str(tmp_path / "chk2"), threshold=0.5
        )
        q2.awaitTermination(120)
        again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert again == [1, 2, 11]

    def test_quality_gate_filters_before_admission(self, spark, tmp_path):
        """A gated batch never costs signatures: rejected docs neither
        reach the sink nor enter the signature store."""
        import json as _json

        from pyspark.sql import functions as F

        from moz_datapipeline_spark.streaming.stateful import (
            ingest_dedup_stream,
        )

        src = tmp_path / "src"
        src.mkdir()
        store = str(tmp_path / "store")
        out = str(tmp_path / "out")
        (src / "b1.json").write_text(
            "\n".join(
                _json.dumps(d)
                for d in [
                    {"doc_id": 1, "text": BASE},
                    {"doc_id": 2, "text": "low " + OTHER},  # gated out
                ]
            )
        )
        (src / "b2.json").write_text(
            _json.dumps({"doc_id": 20, "text": "low " + OTHER + " x"})
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = ingest_dedup_stream(
            stream,
            store,
            out,
            str(tmp_path / "chk"),
            threshold=0.5,
            quality_gate=lambda df: df.filter(
                ~F.col("text").startswith("low ")
            ),
        )
        q.awaitTermination(120)
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        # 2 and 20 are both gated out; 20 is NOT dropped as a dup of 2
        # because 2 never entered the store
        assert got == [1]
        stored = spark.read.parquet(store + "/sigs")
        assert sorted(r.doc_id for r in stored.collect()) == [1]
