"""Full reference-flow integration: every stage the reference's three
shell scripts run, composed as one engine flow on the fixture network.

preparation.sh → indicators.sh → criticality → EAUL → merge-eaul,
ending in the single enriched way table the reference publishes
(README.md:57-66).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_moz_pipeline import NODE_COORDS, WAYS, _ways_df


def test_reference_flow_end_to_end(spark):
    import pandas as pd

    from moz_datapipeline_spark.graph.criticality import criticality_scores
    from moz_datapipeline_spark.graph.eaul import eaul_scores
    from moz_datapipeline_spark.operators.indicators import merge_indicators
    from moz_datapipeline_spark.plans.moz_pipeline import (
        indicators,
        merge_eaul,
        preparation,
    )

    ways = _ways_df(spark)
    bridges_raw = spark.createDataFrame(
        [(1, "R000101:0001.0", "BRG", "96.4", 0.004, 0.0001)],
        "bridge_id int, Link_ID string, Des_Type string, Over_Length string, lon double, lat double",
    )
    provinces = spark.createDataFrame([("Gaza", "MZ-G")], "name string, iso string")
    flood_stats = spark.createDataFrame(
        [("2", 500, 20.0, 50.0), ("2", 1000, 20.0, 100.0),
         ("3", 500, 20.0, 50.0), ("3", 1000, 20.0, 100.0),
         ("5", 1000, 20.0, 100.0)],
        "way_id string, return_period int, max_depth_m double, pct_flooded double",
    )
    traffic_wide = spark.createDataFrame(
        [(1, 0, 100, 100), (2, 100, 0, 100), (3, 100, 100, 0)],
        "`from` int, `1` int, `2` int, `3` int",
    )

    # E1: preparation
    prep = preparation(ways, bridges_raw, provinces, flood_stats, traffic_wide)

    # E2: property/area indicators
    merged = indicators(spark, prep["network"], flood_stats)

    # E2 step 5: criticality from the prepared network's own node chains
    edges = pd.DataFrame(
        {
            "way_id": [w[0] for w in WAYS],
            "src": [w[1] for w in WAYS],
            "dst": [w[2] for w in WAYS],
            "weight": [w[3] * 1.0 for w in WAYS],  # RUC × length(1km fixture rows)
        }
    )
    # lengths per fixture table (ways 5,8 are 2 km; way 10 is 0.5 km)
    lengths = {"5": 2.0, "8": 2.0, "10": 0.5}
    edges["weight"] = [
        ruc * lengths.get(name, 1.0) for name, _, _, ruc in WAYS
    ]
    crit = criticality_scores(spark, edges, ["2", "7", "19"])
    crit_ind = crit.select(
        F.col("way_id"), F.col("score"), F.lit(None).cast("double").alias("value")
    )
    merged = merge_indicators(merged, {"criticality": crit_ind}, network_key="NAME")

    # E3: EAUL + merge-eaul
    edges_eaul = edges.copy()
    edges_eaul["len_part"] = [lengths.get(n, 1.0) for n, *_ in WAYS]
    edges_eaul["ruc"] = [w[3] for w in WAYS]
    way_props = pd.DataFrame(
        {
            "way_id": [w[0] for w in WAYS],
            "length_km": [lengths.get(w[0], 1.0) for w in WAYS],
            "surface": ["unpaved"] * len(WAYS),
            "depths": [
                [0.0] * 8 + [20.0, 20.0] if w[0] in ("2", "3")
                else ([0.0] * 9 + [20.0] if w[0] == "5" else [0.0] * 10)
                for w in WAYS
            ],
            "lengths": [
                [0.0] * 8 + [50.0, 100.0] if w[0] in ("2", "3")
                else ([0.0] * 9 + [100.0] if w[0] == "5" else [0.0] * 10)
                for w in WAYS
            ],
        }
    )
    traffic = {(0, 1): 73000.0, (0, 2): 73000.0, (1, 2): 73000.0}
    eaul = eaul_scores(spark, edges_eaul, way_props, ["2", "7", "19"], traffic)
    final = merge_eaul(merged, eaul)

    out = final.toPandas().set_index("NAME")
    # the published table carries everything: base fields, enrichment,
    # indicator scores, criticality, per-upgrade EAUL
    assert out.loc["1", "provinceIso"] == "MZ-G"
    assert out.loc["2", "floodEadScore"] == pytest.approx(100.0)
    assert out.loc["1", "criticalityScore"] == pytest.approx(60.0)
    assert out.loc["2", "criticalityScore"] == pytest.approx(40.0)
    assert out.loc["4", "criticalityScore"] == pytest.approx(0.0)
    # EAUL columns: upgrading 8 collapses EAUL to 0; baseline rows joined null
    assert out.loc["8", "eaul-upgrade-rehab-asphalt"] == pytest.approx(0.0)
    assert out.loc["2", "eaul-upgrade-rehab-asphalt"] > 14000  # above baseline
    # every way made it through the whole flow
    assert len(out) == 10


def test_llm_corpus_flow_end_to_end(spark, tmp_path):
    """The LLM-pipeline analogue of the reference flow: raw docs →
    curation (quality/dedup/decontam/cap/shards) → per-shard WARC
    archives → CDX index → random-access fetch reproduces every
    curated document byte-for-byte."""
    from moz_datapipeline_spark.plans.corpus_pipeline import curate_corpus
    from moz_datapipeline_spark.sources.warc import (
        cdx_index,
        fetch_warc_record,
        http_response_body,
        write_warc,
    )

    long_text = lambda i: " ".join(f"w{i}t{j}" for j in range(40))
    docs = spark.createDataFrame(
        [(i, long_text(i), "en", f"d{i % 3}") for i in range(1, 60)],
        "doc_id long, text string, lang string, source string",
    )
    curated = curate_corpus(spark, docs, max_per_domain=100, n_shards=2)
    kept = {r.doc_id: r.shard for r in curated.collect()}
    assert kept  # something survived

    # shard-partitioned archive: one WARC file per shard partition
    payload = (
        curated.join(docs, "doc_id")
        .select(
            F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("uri"),
            F.col("text").alias("payload"),
            "shard",
        )
        .repartition(2, "shard")
    )
    out = str(tmp_path / "archive")
    manifest = write_warc(payload, out, http_envelope=True).collect()
    assert sum(m.n_records for m in manifest) == len(kept)

    idx = cdx_index(spark, out + "/*.warc.gz").collect()
    assert len(idx) == len(kept)
    # random-access spot check: fetch three records by byte span
    for row in idx[:3]:
        _, raw = fetch_warc_record(row.path, row.offset, row.length)
        doc_id = int(row.target_uri.rsplit(":", 1)[1])
        assert http_response_body(raw).decode() == long_text(doc_id)
