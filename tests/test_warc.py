"""WARC source (ISO 28500) — parse, gzip members, HTTP decode, and the
byte-identity invariant through the WARC ingest path."""

from __future__ import annotations

import zlib

import pyspark.sql.functions as F
from datetime import datetime, timezone

import pytest

from docling_eval_spark.datagen.pages import gen_page, pages_dataframe
from docling_eval_spark.extraction.stage import extract_text_stage
from docling_eval_spark.sources.warc import (
    encode_warc,
    parse_http_payload,
    parse_warc_records,
    read_warc,
    warc_file_to_pages,
    warc_to_pages,
)

_TS = datetime(2017, 3, 22, 17, 43, 4, tzinfo=timezone.utc)


def _fixture_pages(n=6, seed=7):
    return [
        {
            "url": p["url"],
            "warc_ts": _TS,
            "html": p["html"],
        }
        for p in (gen_page(i, seed=seed) for i in range(n))
    ]


def test_warc_roundtrip_plain_and_gzip():
    pages = _fixture_pages()
    for gz in (False, True):
        data = encode_warc(pages, gzip_members=gz)
        rows = warc_file_to_pages(data, path="mem")
        assert [r["warc_status"] for r in rows] == ["SUCCESS"] * len(pages)
        assert [r["url"] for r in rows] == [p["url"] for p in pages]
        assert [bytes(r["html"]) for r in rows] == [p["html"] for p in pages]
        assert all(r["warc_ts"] == _TS for r in rows)


def test_warc_chunked_transfer_decode():
    pages = _fixture_pages(3)
    data = encode_warc(pages, gzip_members=True, chunked=True)
    rows = warc_file_to_pages(data)
    assert [bytes(r["html"]) for r in rows] == [p["html"] for p in pages]


def test_warc_content_encoding_gzip_body():
    body = b"<html><body><p>compressed payload</p></body></html>"
    gz = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    wire = gz.compress(body) + gz.flush()
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\nContent-Length: %d\r\n\r\n" % len(wire)
    ) + wire
    assert parse_http_payload(block) == body


def test_warc_non_response_records_skipped():
    pages = _fixture_pages(2)
    data = encode_warc(pages, gzip_members=False)
    # warcinfo record is present in the stream but not in the rows
    recs = list(parse_warc_records(data))
    assert recs[0]["type"] == "warcinfo"
    rows = warc_file_to_pages(data)
    assert len(rows) == 2


def test_warc_corrupt_member_resyncs():
    from docling_eval_spark.sources.warc import _gzip_member, warc_record_bytes

    pages = _fixture_pages(4)
    members = [
        _gzip_member(
            warc_record_bytes(
                "response",
                p["html"],
                {
                    "WARC-Target-URI": p["url"],
                    "WARC-Date": "2017-03-22T17:43:04Z",
                    "Content-Type": "text/html",
                },
            )
        )
        for p in pages
    ]
    # destroy member 1's deflate stream body (keep the gzip header)
    bad = bytearray(members[1])
    bad[12:20] = b"\x00" * 8
    stream = members[0] + bytes(bad) + members[2] + members[3]
    rows = warc_file_to_pages(stream)
    ok = [r for r in rows if r["warc_status"] == "SUCCESS"]
    # the wrecked member contributes no SUCCESS row but does not take
    # down its neighbours — the parser resyncs at the next gzip magic
    assert [r["url"] for r in ok] == [pages[i]["url"] for i in (0, 2, 3)]
    # ... and the loss is ACCOUNTED: the corrupt member surfaces as a
    # FAILURE row (doc/ok counts in the manifest reflect it)
    bad = [r for r in rows if r["warc_status"] == "FAILURE"]
    assert len(bad) == 1 and "corrupt gzip member" in bad[0]["error"]


def test_warc_malformed_status_line_sentinel(spark):
    from docling_eval_spark.sources.warc import (
        WARC_PAGES_SCHEMA,
        parse_http_response,
        warc_to_pages,
    )

    # not HTTP-wrapped at all → NULL status (raw payload passes 2xx gate)
    _, _, s_raw = parse_http_response(b"just raw bytes")
    assert s_raw is None
    # HTTP-claiming but unparseable status line → -1 sentinel
    _, _, s_bad = parse_http_response(b"HTTP/1.1 OOPS\r\nA: b\r\n\r\nx")
    assert s_bad == -1
    _, _, s_nosep = parse_http_response(b"HTTP/1.1 200 OK\r\nno-terminator")
    assert s_nosep == -1
    # the 2xx gate drops the sentinel but keeps genuine NULLs
    rows = [
        {"url": f"http://a/{i}", "warc_ts": None, "html": b"x", "text": None,
         "lang": None, "http_status": st, "http_charset": None,
         "warc_path": "p", "record_no": i, "warc_status": "SUCCESS",
         "error": ""}
        for i, st in enumerate([200, None, -1, 404])
    ]
    df = spark.createDataFrame(rows, WARC_PAGES_SCHEMA)
    kept = sorted(
        r["record_no"]
        for r in warc_to_pages(df).join(
            df.select("url", "record_no"), "url"
        ).collect()
    )
    # record 0 (200) and record 1 (NULL=raw) pass; -1 and 404 drop
    assert kept == [0, 1]


def test_warc_truncated_record_failure_row():
    pages = _fixture_pages(1)
    data = encode_warc(pages, gzip_members=False)
    rows = warc_file_to_pages(data[: len(data) - 30])
    assert rows and rows[-1]["warc_status"] == "FAILURE"
    assert "truncated" in rows[-1]["error"]


@pytest.mark.spark
def test_read_warc_byte_identity_vs_parquet_path(spark, tmp_path):
    """North-rule invariant: extracted text through the WARC ingest
    path is byte-identical per url to the direct pages path."""
    n = 24
    pages = _fixture_pages(n, seed=11)
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    # spread across 3 files to exercise per-file parallelism
    for f in range(3):
        chunk = pages[f * 8 : (f + 1) * 8]
        (warc_dir / f"crawl-{f:02d}.warc.gz").write_bytes(
            encode_warc(chunk, gzip_members=True, chunked=(f == 1))
        )

    warc_df = read_warc(spark, str(warc_dir))
    got = {
        r["url"]: (bytes(r["html"]), r["warc_ts"])
        for r in warc_df.collect()
        if r["warc_status"] == "SUCCESS"
    }
    assert len(got) == n
    for p in pages:
        html, ts = got[p["url"]]
        assert html == p["html"]
        assert ts == _TS.replace(tzinfo=None) or ts == _TS

    direct = pages_dataframe(spark, n, seed=11)
    via_warc = warc_to_pages(warc_df)
    t1 = {
        r["url"]: r["extracted_text"]
        for r in extract_text_stage(direct).collect()
    }
    t2 = {
        r["url"]: r["extracted_text"]
        for r in extract_text_stage(via_warc).collect()
    }
    assert set(t1) == set(t2)
    assert all(t1[u] == t2[u] for u in t1)


def test_warc_http_status_filtering():
    pages = [
        {"url": "http://ok.example/", "warc_ts": _TS,
         "html": b"<p>real content page here</p>", "status": 200},
        {"url": "http://moved.example/", "warc_ts": _TS,
         "html": b"<p>Moved Permanently</p>", "status": 301},
        {"url": "http://gone.example/", "warc_ts": _TS,
         "html": b"<p>Not Found</p>", "status": 404},
    ]
    rows = warc_file_to_pages(encode_warc(pages))
    by_url = {r["url"]: r for r in rows}
    assert by_url["http://ok.example/"]["http_status"] == 200
    assert by_url["http://moved.example/"]["http_status"] == 301
    assert by_url["http://gone.example/"]["http_status"] == 404
    # all parse as SUCCESS (the record is valid) — filtering is explicit
    assert all(r["warc_status"] == "SUCCESS" for r in rows)


@pytest.mark.spark
def test_warc_to_pages_drops_non_2xx(spark, tmp_path):
    pages = [
        {"url": "http://ok.example/", "warc_ts": _TS,
         "html": b"<p>real</p>", "status": 200},
        {"url": "http://moved.example/", "warc_ts": _TS,
         "html": b"<p>redirect</p>", "status": 301},
    ]
    (tmp_path / "s.warc.gz").write_bytes(encode_warc(pages))
    wdf = read_warc(spark, str(tmp_path))
    kept = [r["url"] for r in warc_to_pages(wdf).collect()]
    assert kept == ["http://ok.example/"]
    all_rows = [r["url"] for r in warc_to_pages(wdf, require_2xx=False).collect()]
    assert sorted(all_rows) == ["http://moved.example/", "http://ok.example/"]


@pytest.mark.spark
def test_wet_roundtrip_and_quality_flow(spark, tmp_path):
    from docling_eval_spark.operators.quality_rules import gopher_flags
    from docling_eval_spark.sources.warc import encode_wet, read_wet

    texts = [
        ("http://a.example/", "the quick brown fox jumps over the lazy dog " * 12),
        ("http://b.example/", "short"),
        ("http://c.example/", "ünïcødé text wïth nön-àscii survives utf-8 " * 8),
    ]
    pages = [{"url": u, "warc_ts": _TS, "text": t} for u, t in texts]
    (tmp_path / "x.warc.wet.gz").write_bytes(encode_wet(pages))
    wet = read_wet(spark, str(tmp_path))
    rows = {r["url"]: r for r in wet.collect()}
    assert len(rows) == 3
    for u, t in texts:
        assert rows[u]["text"] == t and rows[u]["html"] is None
        assert rows[u]["warc_status"] == "SUCCESS"
    # text-only rows flow straight into quality stages (no extraction)
    flags = gopher_flags(
        wet.selectExpr("url AS doc_id", "text")
    ).collect()
    assert len(flags) == 3


@pytest.mark.spark
def test_warc_resumable_ingest_kill_restart(spark, tmp_path):
    from docling_eval_spark.sources.warc import (
        WARC_MANIFEST_SCHEMA,
        ingest_warc_resumable,
    )

    n_files, per_file = 6, 5
    pages = _fixture_pages(n_files * per_file, seed=3)
    warc_dir = tmp_path / "in"
    warc_dir.mkdir()
    for f in range(n_files):
        chunk = pages[f * per_file : (f + 1) * per_file]
        (warc_dir / f"c-{f}.warc.gz").write_bytes(encode_warc(chunk))
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")

    # first run dies after 1 group (2 files per group → 2 files done)
    with pytest.raises(RuntimeError, match="injected"):
        ingest_warc_resumable(
            spark, str(warc_dir), out, man,
            files_per_job=2, fail_after_groups=1,
        )
    lin = spark.read.schema(WARC_MANIFEST_SCHEMA).parquet(man)
    assert lin.filter("status = 'SUCCESS'").count() == 2

    # restart completes WITHOUT re-processing finished files
    done2 = ingest_warc_resumable(
        spark, str(warc_dir), out, man, files_per_job=2,
    )
    assert len(done2) == 4  # only the remaining files
    lin = spark.read.schema(WARC_MANIFEST_SCHEMA).parquet(man)
    rows = lin.filter("status = 'SUCCESS'").collect()
    assert len(rows) == n_files
    # every file exactly once, with correct per-file counts — expected
    # paths come from the same binaryFile listing the ingest uses, so
    # the URI scheme can never silently diverge from the assertion
    listed = sorted(
        r["path"]
        for r in spark.read.format("binaryFile")
        .load(str(warc_dir)).select("path").collect()
    )
    assert sorted(r["warc_path"] for r in rows) == listed
    assert all(r["doc_count"] == per_file == r["ok_count"] for r in rows)

    # output is complete and duplicate-free
    got = spark.read.parquet(out)
    urls = [r["url"] for r in got.filter("warc_status = 'SUCCESS'").collect()]
    assert sorted(urls) == sorted(p["url"] for p in pages)

    # idempotent: nothing pending on a third call
    assert ingest_warc_resumable(
        spark, str(warc_dir), out, man, files_per_job=2
    ) == []


@pytest.mark.spark
def test_warc_ingest_orphan_part_cleanup(spark, tmp_path):
    """A group that died mid-parquet-write leaves an unmanifested part
    dir; the next ingest must remove it so raw out_dir scans never
    double-count, and read_ingested must never have seen it."""
    from docling_eval_spark.sources.warc import (
        clean_orphan_parts,
        ingest_warc_resumable,
        read_ingested,
    )

    pages = _fixture_pages(8, seed=9)
    warc_dir = tmp_path / "in"
    warc_dir.mkdir()
    for f in range(4):
        (warc_dir / f"c-{f}.warc.gz").write_bytes(
            encode_warc(pages[f * 2 : (f + 1) * 2])
        )
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")

    # fabricate a crashed group: partial rows in an unmanifested part
    stray = spark.createDataFrame(
        [(pages[0]["url"], None, None, None, None, None, None,
          "stray", 1, "SUCCESS", "")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, http_status int, http_charset string, "
        "warc_path string, record_no int, warc_status string, error string",
    )
    stray.write.parquet(f"{out}/part=deadbeefdeadbeef")

    # snapshot reader with an empty manifest sees nothing
    assert read_ingested(spark, out, man).count() == 0

    done = ingest_warc_resumable(
        spark, str(warc_dir), out, man, files_per_job=2
    )
    assert len(done) == 4
    # the orphan is gone from disk; raw scan equals snapshot read
    import os

    assert not os.path.exists(f"{out}/part=deadbeefdeadbeef")
    raw_urls = sorted(
        r["url"] for r in spark.read.parquet(out)
        .filter("warc_status = 'SUCCESS'").collect()
    )
    snap_urls = sorted(
        r["url"] for r in read_ingested(spark, out, man)
        .filter("warc_status = 'SUCCESS'").collect()
    )
    assert raw_urls == snap_urls == sorted(p["url"] for p in pages)
    # idempotent cleanup on a healthy tree removes nothing
    assert clean_orphan_parts(spark, out, man) == []


@pytest.mark.spark
def test_wet_missing_uri_failure_row(spark, tmp_path):
    from docling_eval_spark.sources.warc import (
        _gzip_member,
        read_wet,
        warc_record_bytes,
    )

    good = warc_record_bytes(
        "conversion", b"good text here",
        {"WARC-Target-URI": "http://a.example/", "WARC-Date": "2017-01-01T00:00:00Z"},
    )
    no_uri = warc_record_bytes(
        "conversion", b"orphan text",
        {"WARC-Date": "2017-01-01T00:00:00Z"},
    )
    (tmp_path / "w.warc.wet.gz").write_bytes(
        _gzip_member(good) + _gzip_member(no_uri)
    )
    rows = read_wet(spark, str(tmp_path)).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["warc_status"], []).append(r)
    assert len(by_status["SUCCESS"]) == 1
    assert by_status["SUCCESS"][0]["text"] == "good text here"
    assert len(by_status["FAILURE"]) == 1
    assert "WARC-Target-URI" in by_status["FAILURE"][0]["error"]


@pytest.mark.spark
def test_cdx_index_point_fetch(spark, tmp_path):
    """CDXJ index → targeted byte-range fetch: reads exactly the gzip
    members the index names, never whole files."""
    from docling_eval_spark.sources.warc import (
        encode_warc_with_cdx,
        fetch_warc_records,
        read_cdxj,
    )

    pages = _fixture_pages(12, seed=17)
    wdir = tmp_path / "warc"
    wdir.mkdir()
    cdx_lines = []
    for f in range(3):
        chunk = pages[f * 4 : (f + 1) * 4]
        fname = f"crawl-{f}.warc.gz"
        data, lines = encode_warc_with_cdx(chunk, fname)
        (wdir / fname).write_bytes(data)
        cdx_lines.extend(lines)
    (tmp_path / "index.cdxj").write_text("\n".join(cdx_lines) + "\n")

    cdx = read_cdxj(spark, str(tmp_path / "index.cdxj"))
    assert cdx.count() == 12
    rows = cdx.collect()
    assert all(r["status"] == 200 and r["offset"] > 0 for r in rows)

    # selective fetch: 5 of the 12 urls
    wanted = sorted(p["url"] for p in pages)[:5]
    sel = cdx.filter(F.col("url").isin(wanted))
    got = fetch_warc_records(spark, sel, str(wdir)).collect()
    assert sorted(r["url"] for r in got) == wanted
    by_url = {p["url"]: p["html"] for p in pages}
    for r in got:
        assert r["warc_status"] == "SUCCESS"
        assert bytes(r["html"]) == by_url[r["url"]]

    # a bogus range yields a FAILURE row, not a task failure
    bad = spark.createDataFrame(
        [("http://x.example/", "crawl-0.warc.gz", 999999, 100)],
        "url string, filename string, offset long, length long",
    )
    frow = fetch_warc_records(spark, bad, str(wdir)).collect()[0]
    assert frow["warc_status"] == "FAILURE" and frow["url"] == "http://x.example/"


def test_warc_truncated_gzip_member_failure_row():
    """A .warc.gz cut off mid-member (no zlib error — truncation does
    not raise) must still surface as a FAILURE row, not vanish."""
    from docling_eval_spark.sources.warc import _gzip_member, warc_record_bytes

    pages = _fixture_pages(2)
    members = [
        _gzip_member(
            warc_record_bytes(
                "response",
                p["html"],
                {
                    "WARC-Target-URI": p["url"],
                    "WARC-Date": "2017-03-22T17:43:04Z",
                },
            )
        )
        for p in pages
    ]
    stream = members[0] + members[1][: len(members[1]) // 2]  # cut mid-member
    rows = warc_file_to_pages(stream)
    ok = [r for r in rows if r["warc_status"] == "SUCCESS"]
    bad = [r for r in rows if r["warc_status"] == "FAILURE"]
    assert [r["url"] for r in ok] == [pages[0]["url"]]
    assert any("truncated gzip member" in r["error"] for r in bad)


def test_write_wet_shards_roundtrip(spark, tmp_path):
    import datetime as dt
    import hashlib

    from docling_eval_spark.sources.warc import read_wet, write_wet_shards

    rows = [
        (
            f"https://example.org/p{i}",
            dt.datetime(2017, 3, 22, 17, 43, i % 60),
            f"page {i} body é中文",
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    out1 = str(tmp_path / "wet1")
    manifest = write_wet_shards(df, out1, num_shards=4)
    m = manifest.collect()
    assert sum(r["n_records"] for r in m) == 100
    assert all(r["n_bytes"] > 0 for r in m)
    # the sink is eager: files exist before any action on the manifest
    back = read_wet(spark, out1 + "/*.warc.wet.gz")
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == {(u, t) for (u, _, t) in rows}
    assert back.filter("warc_status != 'SUCCESS'").count() == 0
    # byte-determinism: same input -> byte-identical shard files
    # (hash-partitioned on url + per-shard url sort)
    out2 = str(tmp_path / "wet2")
    write_wet_shards(df.repartition(13), out2, num_shards=4)

    def _hashes(d):
        import os

        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if f.endswith(".warc.wet.gz")
        }

    assert _hashes(out1) == _hashes(out2)


def test_write_wet_shards_null_text_and_ts(spark, tmp_path):
    from docling_eval_spark.sources.warc import read_wet, write_wet_shards

    df = spark.createDataFrame(
        [("https://a.example/x", None, None)],
        "url string, warc_ts timestamp, text string",
    )
    out = str(tmp_path / "wet")
    m = write_wet_shards(df, out, num_shards=1).collect()
    assert sum(r["n_records"] for r in m) == 1
    r = read_wet(spark, out + "/*.warc.wet.gz").collect()[0]
    assert r["url"] == "https://a.example/x"
    assert r["text"] == ""  # null text -> empty conversion block
