"""Archive triage/extraction kernel + Spark-seam tests (round 10)."""

from __future__ import annotations

import io
import struct
import tarfile
import zipfile
import zlib

import pytest

from bergloom_spark.operators.archive import (
    archive_entries,
    archive_meta,
    gzip_meta,
    make_gzip,
    make_tar,
    make_zip,
    tar_entries,
    tar_meta,
    zip_entries,
    zip_extract,
    zip_meta,
)


def _entries(n=4):
    return [
        (f"dir{i}/" if i == 0 else f"dir0/file{i}.txt",
         b"" if i == 0 else bytes(range(i * 10)) * (i + 3))
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("method", [0, 8])
def test_zip_roundtrip(method):
    entries = _entries()
    payload = make_zip(entries, method=method)
    assert zip_extract(payload) == entries
    meta = zip_meta(payload)
    assert meta["n_entries"] == len(entries)
    assert meta["total_uncompressed"] == sum(
        len(d) for _, d in entries
    )
    assert (meta["n_deflate"], meta["n_store"]) == (
        (0, 4) if method == 0 else (4, 0)
    )


def test_zip_interoperates_with_stdlib():
    """Our writer's output opens in ``zipfile`` and vice versa —
    spec conformance, not self-consistency."""
    entries = _entries()
    with zipfile.ZipFile(io.BytesIO(make_zip(entries, method=8))) as z:
        assert [i.filename for i in z.infolist()] == [
            n for n, _ in entries
        ]
        for name, data in entries:
            assert z.read(name) == data
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in entries:
            z.writestr(name, data)
    assert zip_extract(buf.getvalue()) == entries


def test_zip_eocd_with_comment():
    payload = make_zip(_entries(2))
    commented = payload[:-2] + struct.pack("<H", 5) + b"hello"
    assert zip_meta(commented)["n_entries"] == 2


def test_zip_crc_mismatch_rejected():
    payload = bytearray(make_zip([("a.txt", b"payload bytes")]))
    payload[30 + 5] ^= 0xFF  # flip a stored data byte
    with pytest.raises(ValueError, match="CRC"):
        zip_extract(bytes(payload))


def test_zip_declared_bomb_rejected_before_inflate():
    big = b"\x00" * (1 << 20)
    payload = make_zip([("bomb.bin", big)], method=8)
    with pytest.raises(ValueError, match="budget"):
        zip_extract(payload, max_output=1 << 16)


def test_zip_lying_zero_size_rejected():
    """An entry whose central directory declares size 0 over a real
    deflate stream must fail closed, not inflate unbounded
    (zlib's max_length=0 means unlimited — the exact trap)."""
    payload = bytearray(make_zip([("z.bin", b"q" * 4096)], method=8))
    # central directory usize field: offset = eocd.cd_off + 24
    cd_off = struct.unpack_from("<I", payload, len(payload) - 6)[0]
    struct.pack_into("<I", payload, cd_off + 24, 0)
    with pytest.raises(ValueError, match="declared size|mismatch"):
        zip_extract(bytes(payload))


def test_zip_truncated_cd_rejected():
    payload = make_zip(_entries(3))
    with pytest.raises(ValueError):
        zip_entries(payload[:40] + payload[-22:])


def test_zip64_sentinel_without_extra_rejected():
    """A sentinel field whose zip64 extended-info extra is missing
    must fail closed, not be misread as a 4 GiB offset."""
    payload = bytearray(make_zip([("a", b"x")]))
    cd_off = struct.unpack_from("<I", payload, len(payload) - 6)[0]
    struct.pack_into("<I", payload, cd_off + 42, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="zip64"):
        zip_entries(bytes(payload))


@pytest.mark.parametrize("method", [0, 8])
def test_zip64_roundtrip(method):
    """Round 10: zip64 format (EOCD64 + locator + 0x0001 extras) —
    the layout every >4 GiB archive uses, exercised on small
    fixtures."""
    entries = _entries()
    payload = make_zip(entries, method=method, zip64=True)
    walked = zip_entries(payload)
    assert [e["name"] for e in walked] == [n for n, _ in entries]
    assert [e["uncompressed_size"] for e in walked] == [
        len(d) for _, d in entries
    ]
    assert zip_extract(payload) == entries
    meta = zip_meta(payload)
    assert meta["n_entries"] == len(entries)


def test_zip64_stdlib_interop_both_directions():
    entries = [("big/a.bin", b"payload-a" * 40), ("b.txt", b"tiny")]
    # ours -> stdlib
    with zipfile.ZipFile(
        io.BytesIO(make_zip(entries, method=8, zip64=True))
    ) as z:
        for name, data in entries:
            assert z.read(name) == data
    # stdlib (forced zip64) -> ours
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in entries:
            with z.open(name, "w", force_zip64=True) as fh:
                fh.write(data)
    assert zip_extract(buf.getvalue()) == entries


def test_zip64_truncated_locator_rejected():
    payload = make_zip(_entries(2), zip64=True)
    # chop the locator out: EOCD alone with sentinel fields
    broken = payload[:-42] + payload[-22:]
    with pytest.raises(ValueError, match="locator|zip64"):
        zip_entries(broken)


# ---------------------------------------------------------------------------
# TAR
# ---------------------------------------------------------------------------
def test_tar_roundtrip_and_meta():
    entries = _entries()
    payload = make_tar(entries)
    walked = tar_entries(payload)
    assert [e["name"] for e in walked] == [n for n, _ in entries]
    assert [e["size"] for e in walked] == [
        len(d) for _, d in entries
    ]
    meta = tar_meta(payload)
    assert meta == {
        "n_entries": 4, "n_files": 3, "n_dirs": 1,
        "total_size": sum(len(d) for _, d in entries),
    }


def test_tar_interoperates_with_stdlib():
    entries = _entries()
    with tarfile.open(fileobj=io.BytesIO(make_tar(entries))) as t:
        names = t.getnames()
        assert names == [n.rstrip("/") for n, _ in entries]
        for name, data in entries[1:]:
            assert t.extractfile(name).read() == data
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for name, data in entries[1:]:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            t.addfile(ti, io.BytesIO(data))
    walked = tar_entries(buf.getvalue())
    assert [e["name"] for e in walked] == [n for n, _ in entries[1:]]


def test_tar_checksum_mismatch_rejected():
    payload = bytearray(make_tar(_entries(2)))
    payload[0] ^= 0x01  # corrupt the name, keep the stored checksum
    with pytest.raises(ValueError, match="checksum"):
        tar_entries(bytes(payload))


def test_tar_size_past_end_rejected():
    payload = make_tar([("a.txt", b"abc")])
    hdr = bytearray(payload[:512])
    hdr[124:136] = b"77777777777\0"
    hdr[148:156] = b" " * 8
    chk = sum(hdr)
    hdr[148:156] = ("%06o" % chk).encode() + b"\0 "
    with pytest.raises(ValueError, match="exceeds"):
        tar_entries(bytes(hdr) + payload[512:])


# ---------------------------------------------------------------------------
# gzip
# ---------------------------------------------------------------------------
def test_gzip_meta_fields():
    payload = make_gzip(b"hello world" * 10, name="corpus.txt")
    m = gzip_meta(payload)
    assert m["n_members"] == 1
    assert m["name"] == "corpus.txt"
    assert m["mtime"] == 1735689600
    assert m["total_uncompressed"] == 110


def test_gzip_multi_member_count():
    payload = make_gzip(b"a" * 100) + make_gzip(b"b" * 50, name="x")
    m = gzip_meta(payload)
    assert m["n_members"] == 2
    assert m["total_uncompressed"] == 150
    assert m["name"] is None  # first member has no FNAME


def test_gzip_stdlib_interop():
    import gzip as gz

    assert gz.decompress(make_gzip(b"payload", name="n")) == b"payload"


def test_gzip_reserved_flags_rejected():
    payload = bytearray(make_gzip(b"x"))
    payload[3] |= 0x80
    with pytest.raises(ValueError, match="reserved"):
        gzip_meta(bytes(payload))


def test_gzip_budget_rejected():
    payload = make_gzip(b"\x00" * (1 << 20))
    with pytest.raises(ValueError, match="budget"):
        gzip_meta(payload, max_output=1 << 10)


# ---------------------------------------------------------------------------
# dispatch + Spark seam
# ---------------------------------------------------------------------------
def test_archive_meta_dispatch():
    entries = _entries(3)
    total = sum(len(d) for _, d in entries)
    assert archive_meta(make_zip(entries)) == {
        "container": "zip", "n_entries": 3,
        "total_uncompressed": total,
    }
    assert archive_meta(make_tar(entries)) == {
        "container": "tar", "n_entries": 3,
        "total_uncompressed": total,
    }
    assert archive_meta(make_gzip(b"q" * 77)) == {
        "container": "gzip", "n_entries": 1,
        "total_uncompressed": 77,
    }
    with pytest.raises(ValueError, match="magic"):
        archive_meta(b"\x89PNG\r\n\x1a\n")


def test_archive_entries_spark_seam(spark, sf_dir):
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(40).collect()
    ]
    rows = []
    for doc_id in ids:
        i = int(doc_id)
        entries = [
            (f"f{i}_{j}.txt", bytes([j % 256]) * ((i + j) % 97))
            for j in range(1 + i % 4)
        ]
        payload = (
            make_zip(entries, method=8) if i % 2 else make_tar(entries)
        )
        rows.append((i, payload))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = archive_entries(df.repartition(8)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {int(i) for i in ids}
    for i, recs in by_doc.items():
        recs.sort(key=lambda r: r.entry_index)
        assert len(recs) == 1 + i % 4
        for j, r in enumerate(recs):
            assert r.container == ("zip" if i % 2 else "tar")
            assert r.name == f"f{i}_{j}.txt"
            assert r.size == (i + j) % 97
            assert r.is_dir is False


def test_zip_store_vs_deflate_sizes():
    data = b"compressible " * 200
    stored = zip_meta(make_zip([("a", data)], method=0))
    deflated = zip_meta(make_zip([("a", data)], method=8))
    assert stored["total_compressed"] == len(data)
    assert deflated["total_compressed"] < len(data) // 10
    assert (
        stored["total_uncompressed"]
        == deflated["total_uncompressed"]
        == len(data)
    )


def test_zip_utf8_flagged_names():
    """Flag bit 11 switches the name codec to UTF-8 (APPNOTE D.1);
    stdlib sets it when writing non-ASCII names."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("héllo→.txt", b"x")
    assert zip_entries(buf.getvalue())[0]["name"] == "héllo→.txt"


# ---------------------------------------------------------------------------
# zstd (RFC 8878)
# ---------------------------------------------------------------------------
def test_zstd_basic_frame():
    from bergloom_spark.operators.archive import make_zstd_frame, zstd_meta

    m = zstd_meta(make_zstd_frame(5000, n_blocks=3))
    assert m["n_frames"] == 1
    assert m["total_content_size"] == 5000
    assert m["has_checksum"] is False
    assert m["dict_id"] == 0
    assert m["window_log"] == 10


def test_zstd_fcs_encodings():
    from bergloom_spark.operators.archive import make_zstd_frame, zstd_meta

    # flag 0 + single_segment (<256), flag 1 (2-byte, size-256),
    # flag 2 (4-byte)
    for size in (0, 17, 255, 256, 300, 65_791, 65_792, 1 << 20):
        m = zstd_meta(make_zstd_frame(size))
        assert m["total_content_size"] == size, size
    # single_segment frames carry no window descriptor
    assert zstd_meta(make_zstd_frame(100))["window_log"] is None


def test_zstd_multi_frame_and_skippable():
    from bergloom_spark.operators.archive import make_zstd_frame, zstd_meta

    skippable = (0x184D2A53).to_bytes(4, "little") + (8).to_bytes(
        4, "little"
    ) + b"metadata"
    payload = (
        make_zstd_frame(1000, checksum=True)
        + skippable
        + make_zstd_frame(2000, dict_id=77)
    )
    m = zstd_meta(payload)
    assert m["n_frames"] == 2
    assert m["n_skippable"] == 1
    assert m["total_content_size"] == 3000
    assert m["has_checksum"] is True
    assert m["dict_id"] == 77


def test_zstd_unknown_content_size_is_none():
    from bergloom_spark.operators.archive import make_zstd_frame, zstd_meta

    payload = make_zstd_frame(1000) + make_zstd_frame(None)
    assert zstd_meta(payload)["total_content_size"] is None


def test_zstd_interop_with_real_compressor():
    """If a zstd binding happens to exist, our sniff must read real
    frames; otherwise the test skips (the container has no zstd)."""
    try:
        import zstandard  # noqa: F401
    except ImportError:
        pytest.skip("no zstd binding in this environment")
    import zstandard as zstd

    raw = b"interop payload " * 100
    frame = zstd.ZstdCompressor(write_checksum=True,
                                write_content_size=True).compress(raw)
    from bergloom_spark.operators.archive import zstd_meta

    m = zstd_meta(frame)
    assert m["n_frames"] == 1
    assert m["total_content_size"] == len(raw)
    assert m["has_checksum"] is True


def test_zstd_truncation_and_reserved_rejected():
    from bergloom_spark.operators.archive import make_zstd_frame, zstd_meta

    p = make_zstd_frame(1000)
    with pytest.raises(ValueError):
        zstd_meta(p[:-3])
    broken = bytearray(p)
    broken[4] |= 1 << 3  # reserved FHD bit
    with pytest.raises(ValueError, match="reserved"):
        zstd_meta(bytes(broken))
    with pytest.raises(ValueError, match="zstd"):
        zstd_meta(b"\x00\x01\x02\x03rest")


def test_archive_meta_routes_zstd():
    from bergloom_spark.operators.archive import (
        archive_meta,
        make_zstd_frame,
    )

    m = archive_meta(make_zstd_frame(4096) + make_zstd_frame(1))
    assert m == {
        "container": "zstd", "n_entries": 2,
        "total_uncompressed": 4097,
    }


def test_gzip_isize_hint_advisory():
    from bergloom_spark.operators.archive import gzip_isize_hint

    assert gzip_isize_hint(make_gzip(b"q" * 12345)) == 12345
    # concatenated members: last member's ISIZE only — advisory
    two = make_gzip(b"a" * 100) + make_gzip(b"b" * 7)
    assert gzip_isize_hint(two) == 7
    with pytest.raises(ValueError):
        gzip_isize_hint(b"nope")


def test_gzip_isize_hint_minimum_length():
    from bergloom_spark.operators.archive import gzip_isize_hint

    with pytest.raises(ValueError):
        gzip_isize_hint(b"\x1f\x8b" + b"\x00" * 16)  # 18 bytes


# ---------------------------------------------------------------------------
# TAR long names / big sizes (round 10)
# ---------------------------------------------------------------------------
LONG = "deeply/" * 20 + "very_long_file_name_beyond_100_chars.txt"


@pytest.mark.parametrize("mech", ["gnu", "pax"])
def test_tar_long_names_roundtrip(mech):
    entries = [("short.txt", b"a"), (LONG, b"long content")]
    payload = make_tar(entries, longnames=mech)
    walked = tar_entries(payload)
    assert [e["name"] for e in walked] == ["short.txt", LONG]
    assert walked[1]["size"] == len(b"long content")
    meta = tar_meta(payload)
    assert meta["n_entries"] == 2  # L/x headers are not entries


@pytest.mark.parametrize("mech", ["gnu", "pax"])
def test_tar_long_names_stdlib_reads_ours(mech):
    payload = make_tar([(LONG, b"data")], longnames=mech)
    with tarfile.open(fileobj=io.BytesIO(payload)) as t:
        assert t.getnames() == [LONG]
        assert t.extractfile(LONG).read() == b"data"


@pytest.mark.parametrize(
    "fmt", [tarfile.GNU_FORMAT, tarfile.PAX_FORMAT]
)
def test_tar_long_names_we_read_stdlib(fmt):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as t:
        ti = tarfile.TarInfo(LONG)
        data = b"stdlib long"
        ti.size = len(data)
        t.addfile(ti, io.BytesIO(data))
    walked = tar_entries(buf.getvalue())
    assert [e["name"] for e in walked] == [LONG]
    assert walked[0]["size"] == len(b"stdlib long")


def test_tar_ustar_prefix_field():
    buf = io.BytesIO()
    name = "p" * 120 + "/leaf.txt"  # fits prefix+name, not name
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        ti = tarfile.TarInfo(name)
        ti.size = 2
        t.addfile(ti, io.BytesIO(b"ok"))
    walked = tar_entries(buf.getvalue())
    assert walked[0]["name"] == name


def test_tar_base256_size():
    """GNU base-256 size field (octal caps at 8 GiB): header-only
    walk reads the size without materializing the data — build the
    block layout by hand with a small actual payload and a base-256
    field matching it."""
    from bergloom_spark.operators.archive import _tar_header

    hdr = bytearray(_tar_header(b"big.bin", 0, b"0"))
    hdr[124] = 0x80
    hdr[125:136] = (3000).to_bytes(11, "big")
    hdr[148:156] = b" " * 8
    chk = sum(hdr)
    hdr[148:156] = ("%06o" % chk).encode() + b"\0 "
    payload = bytes(hdr) + b"\0" * 3072 + b"\0" * 1024
    walked = tar_entries(payload)
    assert walked[0]["size"] == 3000


def test_tar_multibyte_truncated_name_field(tmp_path):
    """Review r10 pass 4: when a long-name mechanism overrides the
    100-byte field, a byte-truncated multibyte name there must not
    be strict-decoded."""
    name = "x" + "é" * 60  # 121 UTF-8 bytes; nb[:100] splits an é
    for mech in ("gnu", "pax"):
        payload = make_tar([(name, b"data")], longnames=mech)
        walked = tar_entries(payload)
        assert [e["name"] for e in walked] == [name], mech
        assert walked[0]["size"] == 4


def test_tar_gnu_long_linkname_not_an_entry():
    """Review r10 pass 4: typeflag-K metadata must not leak as a
    phantom entry."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.GNU_FORMAT) as t:
        ti = tarfile.TarInfo("link")
        ti.type = tarfile.SYMTYPE
        ti.linkname = "t/" * 70 + "target"
        t.addfile(ti)
    walked = tar_entries(buf.getvalue())
    assert [e["name"] for e in walked] == ["link"]
    assert walked[0]["typeflag"] == "2"
    assert tar_meta(buf.getvalue())["n_entries"] == 1


def test_tar_gnu_L_then_K_keeps_long_name():
    """L-then-K ordering: the K header must not reset the pending
    long name."""
    long_name = "n/" * 60 + "leaf"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.GNU_FORMAT) as t:
        ti = tarfile.TarInfo(long_name)
        ti.type = tarfile.SYMTYPE
        ti.linkname = "t/" * 70 + "target"
        t.addfile(ti)
    walked = tar_entries(buf.getvalue())
    assert [e["name"] for e in walked] == [long_name]


def test_zip64_int64_overflow_rejected():
    """Review r10 pass 4: a 2^64-1 declared size fails closed with
    ValueError, never an Arrow cast crash."""
    payload = bytearray(make_zip([("a", b"xy")], zip64=True))
    # the CD zip64 extra: find its 0x0001 header after the name 'a'
    idx = payload.rfind(struct.pack("<HH", 1, 24))
    struct.pack_into("<Q", payload, idx + 4, 0xFFFFFFFFFFFFFFFF)
    with pytest.raises(ValueError, match="int64"):
        zip_entries(bytes(payload))
