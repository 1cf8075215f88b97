"""Text-operator unit tests incl. winnowing vs a pure-Python reference."""

from __future__ import annotations

import hashlib

import pytest


def _py_winnow(text: str, k: int = 3, w: int = 4) -> set[str]:
    toks = " ".join(text.lower().split()).split(" ")
    kgrams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    fps = [hashlib.md5(g.encode()).hexdigest() for g in kgrams]
    return {min(fps[i : i + w]) for i in range(len(fps) - w + 1)}


def test_winnowing_matches_python_reference(spark):
    from moz_datapipeline_spark.operators.text import winnow_fingerprints

    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again today"),
        (1, "pack my box with five dozen liquor jugs and more words to fill space"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = winnow_fingerprints(df).toPandas()
    for doc_id, text in texts:
        expect = _py_winnow(text)
        have = set(got[got.doc_id == doc_id]["fingerprint"])
        assert have == expect, doc_id


def test_winnowing_detects_local_overlap(spark):
    """Documents sharing a run of tokens share fingerprints; disjoint
    documents share none — the property whole-doc hashing lacks."""
    from moz_datapipeline_spark.operators.text import winnow_fingerprints

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    edited = "PREFIX words here " + base + " SUFFIX tail tokens"
    other = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(0, base), (1, edited), (2, other)], "doc_id long, text string"
    )
    fp = winnow_fingerprints(df).toPandas()
    s0 = set(fp[fp.doc_id == 0]["fingerprint"])
    s1 = set(fp[fp.doc_id == 1]["fingerprint"])
    s2 = set(fp[fp.doc_id == 2]["fingerprint"])
    assert s0 & s1, "edited copy must share fingerprints with the original"
    assert not (s0 & s2), "unrelated docs must not collide"


def test_bpe_ish_tokens_split_punct_and_digits(spark):
    from moz_datapipeline_spark.operators.text import bpe_ish_token_count
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "hello world"), (1, "it's 2024, really!"), (2, "a1b2")],
        "id long, text string",
    )
    out = {r["id"]: r["n"] for r in df.select(
        "id", bpe_ish_token_count("text").alias("n")
    ).collect()}
    assert out[0] == 2            # hello, world
    assert out[1] == 6            # it, 's, 2024, ',', really, !
    assert out[2] == 4            # a, 1, b, 2


def test_lang_id_script_tier(spark):
    """Non-Latin scripts decide the language without marker words;
    kana presence separates Japanese from Chinese."""
    from moz_datapipeline_spark.operators.text import lang_id

    rows = [
        (0, "Это пример русского текста для проверки"),          # ru
        (1, "这是一个中文文本的例子没有假名"),                      # zh: Han only
        (2, "これは日本語のテキストです漢字も含む"),                # ja: kana + Han
        (3, "한국어 텍스트 예시입니다"),                           # ko
        (4, "هذا مثال على نص عربي للاختبار"),                     # ar
        (5, "זוהי דוגמה לטקסט בעברית"),                           # he
        (6, "यह हिंदी पाठ का एक उदाहरण है"),                       # hi
        (7, "Αυτό είναι ένα παράδειγμα ελληνικού κειμένου"),      # el
        (8, "นี่คือตัวอย่างข้อความภาษาไทย"),                        # th
        (9, "the cat and the dog of a to"),                       # en via markers
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {
        0: "ru", 1: "zh", 2: "ja", 3: "ko", 4: "ar",
        5: "he", 6: "hi", 7: "el", 8: "th", 9: "en",
    }


def test_lang_id_ascii_unchanged_by_script_tier(spark):
    """Pure-ASCII text must take the marker tier exactly as before."""
    from moz_datapipeline_spark.operators.text import lang_id

    rows = [
        (0, "el perro y la casa de que"),
        (1, "der hund und die katze ist"),
        (2, "le chien et les chats des"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got[0] == "es" and got[1] == "de" and got[2] == "fr"
    # empty text: deterministic tiebreak, first language code wins
    assert got[3] == "de"


def test_redact_pii(spark):
    from moz_datapipeline_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail bob@example.com call 555-123-4567 or +1 (212) 555-0199 ip 10.0.0.1"),
            (1, "clean text no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 2 and out[0]["n_ipv4"] == 1
    assert out[0]["redacted_text"] == "mail [EMAIL] call [PHONE] or [PHONE] ip [IP]"
    assert out[1]["redacted_text"] == "clean text no pii here"


def test_chunk_documents_windows(spark):
    from moz_datapipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))), (1, ""), (2, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, max_tokens=4, stride=3).toPandas()
    d0 = out[out.doc_id == 0].sort_values("chunk_idx")
    # starts 0,3,6,9 → sizes 4,4,4,1; stride<max_tokens → 1-token overlap
    assert list(d0["n_tokens"]) == [4, 4, 4, 1]
    assert d0.iloc[0]["chunk_text"] == "w0 w1 w2 w3"
    assert d0.iloc[1]["chunk_text"] == "w3 w4 w5 w6"
    assert (out.doc_id != 1).all()          # empty doc yields no chunks
    assert list(out[out.doc_id == 2]["chunk_text"]) == ["solo"]


def test_pack_documents_tiles_the_stream(spark):
    from moz_datapipeline_spark.operators.text import pack_documents

    rows = [(i, " ".join(f"t{j}" for j in range(7 + (i * 13) % 40)))
            for i in range(50)] + [(50, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_documents(df, max_tokens=64).toPandas()
    # empty docs contribute no spans
    assert (out.doc_id != 50).all()
    # per-document: spans cover [0, n_tokens) without gaps or overlap
    for did, g in out.groupby("doc_id"):
        g = g.sort_values("bin")
        assert g.iloc[0]["bin_start"] == 0
        assert g.iloc[-1]["bin_end"] == g.iloc[0]["n_tokens"]
        for a, b in zip(g["bin_end"], g["bin_start"].iloc[1:]):
            assert a == b
    # per-bin: total tokens == 64 for every bin except possibly the last
    sizes = (out.groupby("bin")
                .apply(lambda g: (g.bin_end - g.bin_start).sum(),
                       include_groups=False)
                .sort_index())
    assert (sizes.iloc[:-1] == 64).all()
    total = sum(7 + (i * 13) % 40 for i in range(50))
    assert sizes.sum() == total


def test_chunk_concat_reconstructs_text(spark):
    """Non-overlapping chunks concatenated in order == normalized text."""
    from moz_datapipeline_spark.operators.text import chunk_documents

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 23)))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=5).toPandas()
    rebuilt = (
        out.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")["chunk_text"]
        .apply(" ".join)
    )
    for i, text in rows:
        assert rebuilt[i] == text


def test_quantize_embeddings_fidelity(spark):
    from moz_datapipeline_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[0]["quantized"] == [127, -64, 32, 0]
    assert abs(out[0]["scale"] - 1.0 / 127.0) < 1e-12
    assert out[0]["dequant_cosine"] > 0.9999
    # zero vector: zero codes, no cosine
    assert out[1]["quantized"] == [0, 0, 0, 0]
    assert out[1]["dequant_cosine"] is None


def test_group_sample_exact_k_and_deterministic(spark):
    from moz_datapipeline_spark.operators.text import group_sample

    rows = [(f"d{i}", "big") for i in range(50)] + [
        ("s1", "small"), ("s2", "small")
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out1 = group_sample(df, "lang", 5, "doc_id").collect()
    out2 = group_sample(
        df.repartition(7), "lang", 5, "doc_id"
    ).collect()
    ids1 = sorted((r.lang, r.doc_id) for r in out1)
    ids2 = sorted((r.lang, r.doc_id) for r in out2)
    assert ids1 == ids2  # partition-layout independent
    by_lang = {}
    for lang, d in ids1:
        by_lang.setdefault(lang, []).append(d)
    assert len(by_lang["big"]) == 5
    assert sorted(by_lang["small"]) == ["s1", "s2"]  # kept whole

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 1"):
        group_sample(df, "lang", 0, "doc_id")
