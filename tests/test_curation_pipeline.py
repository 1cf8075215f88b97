"""End-to-end corpus curation plan: stage semantics, determinism,
checkpoint + resume."""

from pyspark.sql import functions as F

from moz_datapipeline_spark.plans.corpus_pipeline import curate_corpus


def _corpus(spark):
    # 300 docs: doc 0..99 unique long en texts, 100..149 exact dups of
    # 0..49, 150..199 short (fail length), 200..249 wrong lang,
    # 250..299 copies of the benchmark doc-0 text (contaminated)
    rows = []
    long_text = lambda i: " ".join(f"w{i}t{j}" for j in range(40))
    for i in range(100):
        rows.append((i, long_text(i), "en", f"d{i % 4}"))
    for i in range(100, 150):
        rows.append((i, long_text(i - 100), "en", f"d{i % 4}"))
    for i in range(150, 200):
        rows.append((i, "too short", "en", f"d{i % 4}"))
    for i in range(200, 250):
        rows.append((i, long_text(i), "pt", f"d{i % 4}"))
    for i in range(250, 300):
        # shares all 8-grams with doc 0 (benchmark: 0 % 97 == 0)
        rows.append((i, long_text(0) + f" tail{i}", "en", f"d{i % 4}"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_curate_corpus_stages(spark):
    out = curate_corpus(spark, _corpus(spark), max_per_domain=100).collect()
    ids = {r.doc_id for r in out}
    # benchmark doc 0 (and 97·k ids) excluded; survivors of 1..99 kept
    assert 0 not in ids and 97 not in ids
    assert set(range(1, 97)) | {98, 99} == ids
    # exact dups (100..149) lost to min-id survivors; short, wrong-lang
    # and contaminated slices all dropped
    assert not ids & set(range(100, 300))
    # shards dense-ranked per shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(len(ranks)))


def test_curate_corpus_domain_cap_and_determinism(spark):
    df = _corpus(spark)
    out1 = curate_corpus(spark, df, max_per_domain=10)
    assert out1.groupBy("source").count().agg(
        F.max("count")
    ).first()[0] <= 10
    a = sorted(map(tuple, out1.collect()))
    b = sorted(
        map(tuple, curate_corpus(spark, df.repartition(7),
                                 max_per_domain=10).collect())
    )
    assert a == b


def test_curate_corpus_checkpoint_resume(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    df = _corpus(spark)
    first = sorted(
        map(tuple, curate_corpus(
            spark, df, max_per_domain=10, checkpoint_dir=ckpt
        ).collect())
    )
    # resume run must read the materialized shard stage, not recompute:
    # feed it an EMPTY frame — identical output proves the parquet
    # checkpoint, not the input, produced it
    empty = df.limit(0)
    resumed = sorted(
        map(tuple, curate_corpus(
            spark, empty, max_per_domain=10,
            checkpoint_dir=ckpt, resume=True,
        ).collect())
    )
    assert resumed == first
