"""Email/MIME kernel + Spark-seam tests (round 10). The stdlib
``email`` package is the interop oracle: our writer's output must
parse identically under both parsers, and stdlib-composed messages
must parse under ours."""

from __future__ import annotations

import email
import email.mime.multipart
import email.mime.text
import email.policy

import pytest

from bergloom_spark.operators.mime import (
    decode_encoded_words,
    make_eml,
    make_mbox,
    mbox_messages,
    parse_eml,
    parse_mbox,
)


def test_singlepart_7bit():
    m = parse_eml(make_eml("Hello", "plain body\nline 2"))
    assert m["subject"] == "Hello"
    assert m["from_addr"] == "sender@example.org"
    assert m["to_addrs"] == ["rcpt@example.org"]
    assert m["text"] == "plain body\nline 2"
    assert m["html"] is None
    assert m["n_parts"] == 1
    assert m["content_type"] == "text/plain"


@pytest.mark.parametrize("cte", ["quoted-printable", "base64"])
def test_transfer_encodings_roundtrip(cte):
    body = "naïve café — üñïçødé ✓\nsecond line = equals"
    m = parse_eml(make_eml("s", body, cte=cte))
    assert m["text"] == body


def test_multipart_alternative():
    m = parse_eml(
        make_eml("s", "plain version", html="<p>html version</p>",
                 cte="quoted-printable")
    )
    assert m["n_parts"] == 2
    assert m["content_type"] == "multipart/alternative"
    assert m["text"] == "plain version"
    assert m["html"] == "<p>html version</p>"


def test_encoded_word_subject():
    subj = "Résumé — 審査結果"
    m = parse_eml(make_eml(subj, "b", encode_subject=True))
    assert m["subject"] == subj


def test_encoded_words_q_and_adjacent_fold():
    assert decode_encoded_words(
        "=?utf-8?Q?caf=C3=A9_menu?="
    ) == "café menu"
    # adjacent encoded words: separating whitespace disappears
    assert decode_encoded_words(
        "=?utf-8?B?5pel5pys?=  =?utf-8?B?6Kqe?="
    ) == "日本語"
    assert decode_encoded_words("plain stays") == "plain stays"


def test_bad_encoded_word_rejected():
    with pytest.raises(ValueError, match="B-encoded"):
        decode_encoded_words("=?utf-8?B?!!!notbase64!!!?=")
    with pytest.raises(ValueError, match="charset"):
        decode_encoded_words("=?klingon?B?YWJj?=")


def test_stdlib_parses_our_writer():
    raw = make_eml("subject here", "body text",
                   html="<i>x</i>", cte="base64",
                   encode_subject=True)
    msg = email.message_from_bytes(raw, policy=email.policy.default)
    assert msg["Subject"] == "subject here"
    assert msg.get_body(("plain",)).get_content() == "body text"
    assert msg.get_body(("html",)).get_content() == "<i>x</i>"


def test_we_parse_stdlib_writer():
    mp = email.mime.multipart.MIMEMultipart("alternative")
    mp["From"] = "a@b.example"
    mp["To"] = "c@d.example, e@f.example"
    mp["Subject"] = "interop"
    mp.attach(email.mime.text.MIMEText("stdlib plain", "plain"))
    mp.attach(email.mime.text.MIMEText("<b>stdlib</b>", "html"))
    m = parse_eml(mp.as_bytes())
    assert m["subject"] == "interop"
    assert m["to_addrs"] == ["c@d.example", "e@f.example"]
    assert m["text"].rstrip("\n") == "stdlib plain"
    assert m["html"].rstrip("\n") == "<b>stdlib</b>"


def test_header_folding():
    raw = make_eml("s", "b").replace(
        b"Subject: s\r\n", b"Subject: s\r\n folded tail\r\n"
    )
    assert parse_eml(raw)["subject"] == "s folded tail"


def test_nested_multipart():
    inner_boundary = "inner-b"
    outer_boundary = "outer-b"
    inner = (
        f'Content-Type: multipart/alternative; boundary="{inner_boundary}"'
        f"\r\n\r\n--{inner_boundary}\r\n"
        "Content-Type: text/plain\r\n\r\ninner plain\r\n"
        f"--{inner_boundary}--\r\n"
    )
    raw = (
        "From: x@y.example\r\nSubject: nest\r\n"
        f'Content-Type: multipart/mixed; boundary="{outer_boundary}"'
        f"\r\n\r\n--{outer_boundary}\r\n" + inner +
        f"--{outer_boundary}--\r\n"
    ).encode()
    m = parse_eml(raw)
    assert m["n_parts"] == 1
    assert m["text"] == "inner plain"


def test_unclosed_multipart_rejected():
    raw = make_eml("s", "p", html="<i>h</i>")
    broken = raw[: raw.rfind(b"--=-bergloom")]
    with pytest.raises(ValueError, match="never closes"):
        parse_eml(broken)


def test_missing_boundary_rejected():
    raw = make_eml("s", "p", html="h").replace(
        b'; boundary="=-bergloom-fixture-boundary"', b""
    )
    with pytest.raises(ValueError, match="boundary"):
        parse_eml(raw)


def test_unknown_cte_rejected():
    raw = make_eml("s", "p").replace(
        b"Content-Transfer-Encoding: 7bit",
        b"Content-Transfer-Encoding: uuencode",
    )
    with pytest.raises(ValueError, match="Content-Transfer-Encoding"):
        parse_eml(raw)


def test_mbox_roundtrip_with_from_stuffing():
    msgs = [
        make_eml("first", "From the start of a line\nok"),
        make_eml("second", "body two"),
        make_eml("third", "body three", cte="base64"),
    ]
    payload = make_mbox(msgs)
    out = parse_mbox(payload)
    assert [m["subject"] for m in out] == ["first", "second", "third"]
    assert out[0]["text"] == "From the start of a line\nok"
    assert all(m["envelope_from"] == "sender@example.org" for m in out)


def test_mbox_must_start_with_from():
    with pytest.raises(ValueError, match="From "):
        parse_mbox(b"not an mbox")


def test_mbox_messages_spark_seam(spark, sf_dir):
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(30).collect()
    ]
    rows = []
    for doc_id in ids:
        i = int(doc_id)
        msgs = [
            make_eml(
                f"msg {i}/{j}",
                f"body {i} {j} " + "z" * ((i + j) % 31),
                cte=("7bit", "quoted-printable", "base64")[j % 3],
                message_id=f"<m-{i}-{j}@example.org>",
            )
            for j in range(1 + i % 3)
        ]
        rows.append((i, make_mbox(msgs)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = mbox_messages(df.repartition(8)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {int(i) for i in ids}
    for i, recs in by_doc.items():
        recs.sort(key=lambda r: r.msg_index)
        assert len(recs) == 1 + i % 3
        for j, r in enumerate(recs):
            assert r.subject == f"msg {i}/{j}"
            assert r.text == f"body {i} {j} " + "z" * ((i + j) % 31)
            assert r.message_id == f"<m-{i}-{j}@example.org>"
            assert r.n_parts == 1
