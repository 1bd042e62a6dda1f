"""Decontamination, repetition metrics, and train/val/test split tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bergloom_spark.functions.text import dup_ngram_frac, top_ngram_frac
from bergloom_spark.operators.dedup import decontaminate_flags
from bergloom_spark.operators.sampling import split_assign


def test_decontaminate_flags_exact_copy_and_clean_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # copy of probe
            (3, "totally unrelated words about ships and anchors"),
            (4, "delta epsilon zeta eta theta iota"),  # 4-gram overlap? no
        ],
        "doc_id long, text string",
    )
    probes = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    out = {
        r.doc_id: r
        for r in decontaminate_flags(
            corpus, probes, "text", "doc_id", shingle_n=4
        ).collect()
    }
    assert set(out) == {2, 3, 4}
    assert out[2].contaminated and out[2].n_matched == 3  # 6 tokens → 3 4-grams
    assert not out[3].contaminated and out[3].n_matched == 0
    # doc 4 shares the tokens "delta epsilon zeta" (a 3-run) but no
    # 4-token window, so 4-gram decontamination must NOT flag it
    assert not out[4].contaminated


def test_decontaminate_every_corpus_row_reported(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    probes = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    rows = decontaminate_flags(corpus, probes, "text", "doc_id").collect()
    # short/empty docs have no shingles at all but still get a row
    assert {r.doc_id for r in rows} == {2, 3}
    assert all(r.n_matched == 0 for r in rows)


def test_repetition_metrics_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # 3 identical 2-grams
            (2, "all four tokens differ"),  # all 2-grams distinct
            (3, ""),  # no shingles at all
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            top_ngram_frac("text", 2).alias("top2"),
            dup_ngram_frac("text", 2).alias("dup2"),
        ).collect()
    }
    assert out[1].top2 == 1.0  # "spam spam" is every 2-gram
    assert abs(out[1].dup2 - (1 - 1 / 3)) < 1e-6
    assert out[2].top2 == round(1 / 3, 6) and out[2].dup2 == 0.0
    assert out[3].top2 == 0.0 and out[3].dup2 == 0.0


def test_split_assign_deterministic_partition_and_growth_stable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {
        r.doc_id: r.split
        for r in split_assign(docs, "doc_id", splits).collect()
    }
    assert set(full.values()) <= {"train", "val", "test"}  # fractions sum to 1
    n = len(full)
    share = sum(1 for s in full.values() if s == "train") / n
    assert 0.7 < share < 0.9
    # growth stability: assignments computed on a subset are identical
    subset = {
        r.doc_id: r.split
        for r in split_assign(
            docs.filter(F.col("doc_id") % 3 == 0), "doc_id", splits
        ).collect()
    }
    assert all(full[k] == v for k, v in subset.items())
    # layout independence: a different partitioning gives the same map
    reparted = {
        r.doc_id: r.split
        for r in split_assign(docs.repartition(7), "doc_id", splits).collect()
    }
    assert reparted == full


def test_pack_sequences_budget_and_determinism(spark):
    from bergloom_spark.operators.packing import pack_sequences

    rows = [(i, (i * 37) % 300 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", max_tokens=512, n_buckets=4)
    pdf = out.toPandas()
    # every doc exactly once
    assert sorted(pdf.doc_id) == [r[0] for r in rows]
    # budget respected (no doc here exceeds it alone)
    sums = pdf.groupby("pack_id").n_tokens.sum()
    assert (sums <= 512).all()
    # packs never span buckets
    assert (pdf.pack_id // (1 << 40) == pdf.bucket).all()
    # layout-independent: same assignment from a different partitioning
    again = (
        pack_sequences(
            df.repartition(13), "doc_id", "n_tokens", 512, n_buckets=4
        )
        .toPandas()
        .set_index("doc_id")
        .pack_id.to_dict()
    )
    assert again == pdf.set_index("doc_id").pack_id.to_dict()


def test_pack_sequences_oversized_doc_gets_own_pack(spark):
    from bergloom_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, 9000), (3, 100)], "doc_id long, n_tokens long"
    )
    pdf = pack_sequences(
        df, "doc_id", "n_tokens", max_tokens=512, n_buckets=1
    ).toPandas()
    big = pdf[pdf.doc_id == 2].pack_id.iloc[0]
    # the oversized doc shares its pack with nobody
    assert (pdf[pdf.pack_id == big].doc_id == 2).all()


def test_chunk_documents_cover_and_overlap(spark):
    import pytest

    from bergloom_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a" * 950), (2, "b" * 10), (3, "")], "doc_id long, text string"
    )
    pdf = chunk_documents(
        df, "text", "doc_id", chunk_chars=400, overlap=100
    ).toPandas()
    d1 = pdf[pdf.doc_id == 1].sort_values("chunk_id")
    # ceil((950-100)/300) = 3 chunks; windows start every 300 chars
    assert list(d1.chunk_id) == [0, 1, 2]
    assert list(d1.chunk_len) == [400, 400, 350]
    # reassembly: stripping the 100-char overlap re-covers the doc
    joined = d1.chunk_text.iloc[0] + "".join(
        t[100:] for t in d1.chunk_text.iloc[1:]
    )
    assert joined == "a" * 950
    # short and empty docs produce exactly one chunk
    assert len(pdf[pdf.doc_id == 2]) == 1 and len(pdf[pdf.doc_id == 3]) == 1
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_chars=100, overlap=100)


def test_redact_pii_planted_cases(spark):
    """Redaction hits emails/IPs/phones, leaves lookalikes alone, and
    Spark output equals the DuckDB twin on the same strings (regex
    dialect parity — the whole point of the restricted pattern set)."""
    import duckdb

    from bergloom_spark.functions.text import (
        pii_count,
        pii_count_sql,
        redact_pii,
        redact_pii_sql,
    )

    cases = [
        (0, "mail a.b+tag@x-corp.example.co now"),
        (1, "server at 192.168.001.1 port 8080"),
        (2, "call 555-123-4567 or 555 1234 5678"),
        (3, "semver 1.2.3 is not an ip, v10.0.0.1b neither"),
        (4, "two mails a@b.io c@d.org one ip 8.8.8.8"),
        (5, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(cases, ["id", "t"])
    got = {
        r["id"]: (r["red"], r["ne"], r["ni"], r["np"])
        for r in df.select(
            "id",
            redact_pii("t").alias("red"),
            pii_count("t", "email").alias("ne"),
            pii_count("t", "ipv4").alias("ni"),
            pii_count("t", "phone").alias("np"),
        ).collect()
    }
    assert got[0][0] == "mail <EMAIL> now" and got[0][1] == 1
    assert got[1][0] == "server at <IP> port 8080" and got[1][2] == 1
    assert got[2] == ("call <PHONE> or <PHONE>", 0, 0, 2)
    # 1.2.3 has three octets; v10.0.0.1b breaks both \b boundaries —
    # ...but '10.0.0.1' inside 'v10...1b' still word-bounds at v|1 and
    # 1|b? No: \b requires a \w/\W transition; 'v1' and '1b' are \w\w,
    # so no boundary — no match.
    assert got[3] == ("semver 1.2.3 is not an ip, v10.0.0.1b neither", 0, 0, 0)
    assert got[4][1] == 2 and got[4][2] == 1
    assert got[5] == ("clean text with no pii at all", 0, 0, 0)

    con = duckdb.connect()
    for i, t in cases:
        lit = "'" + t.replace("'", "''") + "'"
        row = con.execute(
            "SELECT " + redact_pii_sql(lit) + ", "
            + pii_count_sql(lit, "email") + ", "
            + pii_count_sql(lit, "ipv4") + ", "
            + pii_count_sql(lit, "phone")
        ).fetchone()
        assert (row[0], row[1], row[2], row[3]) == got[i], (i, row, got[i])


# ---------------------------------------------------------------------------
# readability (round 2)
# ---------------------------------------------------------------------------
def test_flesch_readability_semantics(spark):
    import pyspark.sql.functions as F

    from bergloom_spark.functions import text as TX

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "Incomprehensibility notwithstanding, "
                "antidisestablishmentarianism perseveres."),
            (3, ""),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            TX.sentence_count("text").alias("ns"),
            TX.syllable_count("text").alias("sy"),
            TX.flesch_reading_ease("text").alias("f"),
        ).collect()
    }
    assert out[1]["ns"] == 2
    # "The cat sat." = 3 syllables; "The dog ran!" = 3
    assert out[1]["sy"] == 6
    # simple short sentences read easier than sesquipedalian prose
    assert out[1]["f"] > out[2]["f"]
    assert out[3]["ns"] == 1 and out[3]["sy"] == 0


def test_canonical_text_collapses_reencodings(spark):
    from bergloom_spark.functions import text as TX
    from bergloom_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO ... WORLD"),
            (4, "goodbye world"),
        ],
        "doc_id: long, text: string",
    )
    d = docs.withColumn("__c", TX.canonical_text("text"))
    vals = {r["doc_id"]: r["__c"] for r in d.collect()}
    assert vals[1] == vals[2] == vals[3] == "hello world"
    kept = exact_dedup(d, ["__c"], "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]


def test_char_entropy_known_values(spark):
    """Hand-computable distributions: uniform over k chars = log2 k
    bits; single-char runs = 0; empty = 0 by convention."""
    import math

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # 0 bits
            (2, "abab"),          # 1 bit
            (3, "abcdabcd"),      # 2 bits
            (4, ""),              # empty -> 0
            (5, "aab"),           # H = log2(3) - (2*log2(2))/3
        ],
        "doc_id long, text string",
    )
    import pyspark.sql.functions as F

    from bergloom_spark.functions.text import char_entropy

    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", char_entropy(F.col("text")).alias("h")
        ).collect()
    }
    assert got[1] == 0.0
    assert got[2] == 1.0
    assert got[3] == 2.0
    assert got[4] == 0.0
    expected5 = round(math.log2(3) - 2 * math.log2(2) / 3, 6)
    assert abs(got[5] - expected5) < 1e-6


def test_strip_markup_known_cases(spark):
    """Script/style/comment content dropped, tags stripped, entities
    decoded in the right order (&amp; last, so &amp;lt; -> &lt;),
    whitespace collapsed — and the DuckDB twin agrees byte-for-byte."""
    import duckdb
    import pyspark.sql.functions as F

    from bergloom_spark.functions.text import strip_markup, strip_markup_sql

    samples = [
        "<style>b{c:red}</style><p>Hello &amp;amp; <b>world</b></p>",
        "<script>if (a &lt; b) { x > 1 }</script>kept",
        "It&#39;s &quot;ok&quot;&nbsp;here",
        "<!-- multi\nline -->text",
        "",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, t string"
    )
    got = {
        r.i: r.s
        for r in df.select("i", strip_markup(F.col("t")).alias("s")).collect()
    }
    assert got[0] == "Hello &amp; world"
    assert got[1] == "kept"
    assert got[2] == "It's \"ok\" here"
    assert got[3] == "text"
    assert got[4] == ""
    con = duckdb.connect()
    for i, s in enumerate(samples):
        want = con.execute(
            f"SELECT {strip_markup_sql('t')} FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)
