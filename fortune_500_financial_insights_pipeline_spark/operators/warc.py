"""Real WARC (ISO 28500) container parsing — the format web-crawl data
actually ships in (Common Crawl's WARC/WET/WAT files are per-record gzip
members of this layout). Completes the web-pipeline front door: the
round-6 trio starts from raw URLs and HTML strings; production corpora
start one stage earlier, at crawl archives.

Framing (pure public spec): a record is a version line ``WARC/1.0\\r\\n``,
``Name: value\\r\\n`` header lines, one blank line, exactly
``Content-Length`` bytes of block, then a ``\\r\\n\\r\\n`` terminator.
A ``.warc.gz`` is a concatenation of independently-gzipped records (the
member boundary IS the record boundary, which is what makes the format
splittable for distributed readers — each worker can start at any member
boundary). Both forms parse through the one entry point; gzip members
are walked with stdlib zlib via ``unused_data``.

Corrupt-payload discipline matches the codec family (mp4_index /
media_codec): every malformed shape raises ValueError — bad magic,
header without a colon, missing/non-integer Content-Length, a length
that overruns the payload, a missing record terminator — never an
IndexError/struct.error/KeyError escaping mid-walk (fuzz-gated by
tests/test_fuzz_codecs.py).

Spark surface: ``warc_records`` explodes archive blobs into one row per
record via mapInPandas — map-only, zero shuffle, the same 100 TB shape
as the other binary decoders (SCALE.md codec rows are its scaling
evidence).

Reference scope note: /root/reference has no crawl ingestion at all
(code/airflow/dags/* pulls tabular/JSON market data); this module is
part of the LLM-training-data extension surface the build brief
requires.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def warc_build_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/octet-stream",
) -> bytes:
    """One WARC/1.0 record, spec-framed (version line, headers, blank
    line, Content-Length bytes, record terminator)."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    if target_uri is not None:
        headers.insert(1, ("WARC-Target-URI", target_uri))
    head = b"WARC/1.0" + _CRLF + b"".join(
        f"{k}: {v}".encode() + _CRLF for k, v in headers
    )
    return head + _CRLF + payload + _CRLF + _CRLF


def http_response_payload(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """An HTTP/1.1 response block for a ``response`` record — status
    line, minimal headers, blank line, body (what a crawler stores)."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Status"
    )
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def warc_build(records: "list[bytes]", gzip_members: bool = False) -> bytes:
    """Concatenate framed records into an archive; ``gzip_members=True``
    compresses each record as its own gzip member (the Common Crawl
    convention — member boundaries = record boundaries, splittable)."""
    if not gzip_members:
        return b"".join(records)
    out = []
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out.append(co.compress(rec) + co.flush())
    return b"".join(out)


def _gzip_members(data: bytes) -> Iterator[bytes]:
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("corrupt WARC: gzip member without magic")
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = do.decompress(data[pos:])
        except zlib.error as exc:
            raise ValueError(f"corrupt WARC: bad gzip member ({exc})") from exc
        if not do.eof:
            raise ValueError("corrupt WARC: truncated gzip member")
        yield chunk
        consumed = len(data) - pos - len(do.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt WARC: empty gzip member")
        pos += consumed


def _parse_framed(data: bytes) -> "list[dict]":
    """Walk spec-framed records in an uncompressed buffer."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError("corrupt WARC: record without WARC/ version line")
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("corrupt WARC: unterminated header block")
        head_lines = data[pos:head_end].split(_CRLF)
        version = head_lines[0].decode("ascii", "replace")
        if not version.startswith("WARC/1."):
            raise ValueError(f"corrupt WARC: unsupported version {version!r}")
        headers: dict[str, str] = {}
        for line in head_lines[1:]:
            if b":" not in line:
                raise ValueError("corrupt WARC: header line without colon")
            k, v = line.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("corrupt WARC: record missing Content-Length") from None
        except ValueError:
            raise ValueError("corrupt WARC: non-integer Content-Length") from None
        if length < 0 or length > n:
            raise ValueError("corrupt WARC: Content-Length exceeds payload")
        block_start = head_end + 4
        block_end = block_start + length
        if block_end + 4 > n:
            raise ValueError("corrupt WARC: truncated record block")
        if data[block_end : block_end + 4] != _CRLF + _CRLF:
            raise ValueError("corrupt WARC: missing record terminator")
        out.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "block": data[block_start:block_end],
            }
        )
        pos = block_end + 4
    return out


def http_split(block: bytes) -> "tuple[int | None, bytes]":
    """(status, body) from an HTTP response block; (None, block) when
    the block is not HTTP."""
    status, _headers, body = http_split_headers(block)
    return status, body


def http_split_headers(
    block: bytes,
) -> "tuple[int | None, dict[str, str], bytes]":
    """(status, headers, body) from an HTTP response block — the full
    split: header names lowercased, values stripped (crawl analytics
    need at least Content-Type's charset parameter to decode the body
    correctly; blind UTF-8 mangles latin-1 crawl payloads). (None, {},
    block) when the block is not HTTP; the same corrupt-payload
    ValueError discipline as the framing walk."""
    if not block.startswith(b"HTTP/"):
        return None, {}, block
    sep = block.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("corrupt WARC: HTTP block without header terminator")
    head_lines = block[:sep].split(_CRLF)
    status_line = head_lines[0].split(b" ")
    if len(status_line) < 2 or not status_line[1].isdigit():
        raise ValueError("corrupt WARC: malformed HTTP status line")
    headers: dict[str, str] = {}
    last_key: "str | None" = None
    for line in head_lines[1:]:
        if line[:1] in (b" ", b"\t"):
            # RFC 7230 obs-fold continuation: append to the previous
            # header value (single-space joined, per the RFC's unfold).
            if last_key is not None:
                cont = line.decode("utf-8", "replace").strip()
                if cont:
                    headers[last_key] = (headers[last_key] + " " + cont).strip()
            continue
        if b":" not in line:
            # Malformed-server junk is common in real crawl data; one bad
            # header line must not kill the ingest job — skip it (the
            # per-row "count, never fail" discipline used elsewhere).
            continue
        k, v = line.split(b":", 1)
        last_key = k.decode("ascii", "replace").strip().lower()
        headers[last_key] = v.decode("utf-8", "replace").strip()
    return int(status_line[1]), headers, block[sep + 4 :]


def warc_parse(data: bytes) -> "list[dict]":
    """All records of a WARC archive (plain or per-record-gzip — detected
    by magic), each as {warc_type, target_uri, date, content_type,
    http_status, body}; response records get their HTTP head split off."""
    if len(data) == 0:
        raise ValueError("corrupt WARC: empty payload")
    if data[:2] == b"\x1f\x8b":
        framed: list[dict] = []
        for member in _gzip_members(data):
            framed.extend(_parse_framed(member))
    else:
        framed = _parse_framed(data)
    out = []
    for rec in framed:
        status, http_headers, body = http_split_headers(rec["block"])
        out.append(
            {
                "warc_type": rec["warc_type"],
                "target_uri": rec["target_uri"],
                "date": rec["date"],
                "content_type": rec["content_type"],
                "http_status": status,
                "http_content_type": http_headers.get("content-type"),
                "body": body,
            }
        )
    return out


def warc_records(
    archives: DataFrame, id_col: str = "doc_id", payload_col: str = "warc"
) -> DataFrame:
    """Explode WARC archive blobs into one row per record — the crawl
    ingestion data-plane: (id, rec_idx, warc_type, target_uri,
    content_type, http_status, body). mapInPandas, map-only, zero
    shuffle; a corrupt archive fails the task closed (ValueError)."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "rec_idx": [], "warc_type": [],
                "target_uri": [], "content_type": [], "http_status": [],
                "http_content_type": [], "body": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["__warc"]):
                for i, rec in enumerate(warc_parse(bytes(payload))):
                    out["doc_id"].append(doc_id)
                    out["rec_idx"].append(i)
                    out["warc_type"].append(rec["warc_type"])
                    out["target_uri"].append(rec["target_uri"])
                    out["content_type"].append(rec["content_type"])
                    out["http_status"].append(rec["http_status"])
                    out["http_content_type"].append(rec["http_content_type"])
                    out["body"].append(rec["body"])
            yield pd.DataFrame(out)

    return archives.select(
        archives[id_col].alias("doc_id"), archives[payload_col].alias("__warc")
    ).mapInPandas(
        parse,
        schema="doc_id long, rec_idx int, warc_type string, "
        "target_uri string, content_type string, http_status int, "
        "http_content_type string, body binary",
    )


def _local_path(path: str) -> str:
    """Filesystem path from a Spark file URI (``file:/x``, ``file:///x``
    or a bare path). Other schemes are rejected loudly — on a real
    cluster this seam is where an object-store ranged-read client plugs
    in."""
    if path.startswith("file:"):
        rest = path[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    if "://" in path:
        raise ValueError(f"unsupported path scheme for ranged read: {path!r}")
    return path


def iter_gzip_member_spans(read, chunk_size: int = 1 << 20):
    """Yield (start, end) byte spans of each gzip member from a
    ``read(n)`` callable — STREAMING: decompressed output is discarded
    as it is produced, so peak memory is O(chunk), never O(archive) or
    O(member). This is the index half of splittable WARC ingestion: the
    member boundary is the record boundary (Common Crawl convention),
    so the spans are independently fetchable units."""
    pos = 0  # absolute offset of the current member's first byte
    buf = read(chunk_size)
    while buf:
        # A read-chunk boundary can leave a 1-byte tail after a member
        # ends; top up before the magic check so a valid archive is not
        # misread as corrupt.  EOF with a 1-byte remainder IS corruption.
        while len(buf) < 2:
            more = read(chunk_size)
            if not more:
                raise ValueError("corrupt WARC: gzip member without magic")
            buf += more
        if buf[:2] != b"\x1f\x8b":
            raise ValueError("corrupt WARC: gzip member without magic")
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        fed = 0
        while True:
            try:
                do.decompress(buf)  # output discarded — spans only
            except zlib.error as exc:
                raise ValueError(f"corrupt WARC: bad gzip member ({exc})") from exc
            fed += len(buf)
            if do.eof:
                tail = do.unused_data
                end = pos + fed - len(tail)
                yield pos, end
                pos = end
                buf = tail if tail else read(chunk_size)
                break
            buf = read(chunk_size)
            if not buf:
                raise ValueError("corrupt WARC: truncated gzip member")


def warc_member_index(files: DataFrame, path_col: str = "path") -> DataFrame:
    """(path, member_idx, start, end) for every gzip member of every
    archive in a FILE-LISTING frame (no content column — pair with
    ``binaryFile`` + ``select("path")`` so column pruning keeps the
    bytes out of the scan). mapInPandas over the listing; each worker
    streams its files with O(chunk) memory. The index is tiny (rows ~
    member count) and is what lets one large archive fan out across
    tasks in ``warc_records_split``."""

    def index(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "path": [], "member_idx": [], "start": [], "end": [],
            }
            for path in pdf["__p"]:
                with open(_local_path(str(path)), "rb") as fh:
                    for i, (s, e) in enumerate(iter_gzip_member_spans(fh.read)):
                        out["path"].append(path)
                        out["member_idx"].append(i)
                        out["start"].append(s)
                        out["end"].append(e)
            yield pd.DataFrame(out)

    return files.select(files[path_col].alias("__p")).mapInPandas(
        index, schema="path string, member_idx int, start long, end long"
    )


def warc_records_split(
    spark,
    path: str,
    glob: str = "*.warc.gz",
    target_split_bytes: int = 64 << 20,
) -> DataFrame:
    """Splittable WARC ingestion: records of every ``.warc.gz`` under
    ``path``, WITHOUT ever materializing a whole archive in one row
    (the r7 whole-content reader's per-archive memory/straggler risk at
    100 TB). Three map-shaped stages:

    1. list files (``binaryFile`` pruned to path only — no bytes read),
    2. index gzip-member spans per file (streaming, O(chunk) memory),
    3. bucket adjacent members into ~``target_split_bytes`` ranges,
       hash-repartition on (path, bucket) so ONE skewed archive fans
       out across tasks, then seek+read EACH member's span and parse it
       — peak memory per task is the largest single member, not the
       archive.

    Output: (archive_path, doc_id, member_idx, rec_in_member,
    warc_type, target_uri, content_type, http_status, body); doc_id is
    ``abs(xxhash64(archive_path))`` — the same keying as the streaming
    ingest, so split-batch == stream is checkable row-for-row. The only
    shuffle is the tiny index frame (rows = member count)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path")
    )
    return split_records_from_listing(files, target_split_bytes)


def split_records_from_listing(
    files: DataFrame,
    target_split_bytes: int = 64 << 20,
) -> DataFrame:
    """The split-read core shared by the batch (`warc_records_split`)
    and streaming (`streaming/warc_ingest.warc_split_record_stream`)
    forms: a (path) listing frame — batch or streaming — goes through
    the member-span index, the range bucketing, and the per-member
    ranged reads. Every stage is a narrow/map transformation except the
    tiny index repartition, so the SAME lineage is legal under
    Structured Streaming (no stream-side state)."""
    idx = warc_member_index(files).withColumn(
        "bucket", F.floor(F.col("start") / F.lit(int(target_split_bytes)))
    )
    idx = idx.repartition("path", "bucket")

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "archive_path": [], "member_idx": [], "rec_in_member": [],
                "warc_type": [], "target_uri": [], "content_type": [],
                "http_status": [], "http_content_type": [], "body": [],
            }
            pdf = pdf.sort_values(["path", "start"])
            open_path, fh = None, None
            try:
                for p, mi, s, e in zip(
                    pdf["path"], pdf["member_idx"], pdf["start"], pdf["end"]
                ):
                    if p != open_path:
                        if fh is not None:
                            fh.close()
                        fh = open(_local_path(str(p)), "rb")
                        open_path = p
                    fh.seek(int(s))
                    member = fh.read(int(e) - int(s))
                    for j, rec in enumerate(warc_parse(member)):
                        out["archive_path"].append(p)
                        out["member_idx"].append(int(mi))
                        out["rec_in_member"].append(j)
                        out["warc_type"].append(rec["warc_type"])
                        out["target_uri"].append(rec["target_uri"])
                        out["content_type"].append(rec["content_type"])
                        out["http_status"].append(rec["http_status"])
                        out["http_content_type"].append(
                            rec["http_content_type"]
                        )
                        out["body"].append(rec["body"])
            finally:
                if fh is not None:
                    fh.close()
            yield pd.DataFrame(out)

    recs = idx.select("path", "member_idx", "start", "end").mapInPandas(
        fetch,
        schema="archive_path string, member_idx int, rec_in_member int, "
        "warc_type string, target_uri string, content_type string, "
        "http_status int, http_content_type string, body binary",
    )
    return recs.select(
        "archive_path",
        F.abs(F.xxhash64("archive_path")).alias("doc_id"),
        "member_idx", "rec_in_member", "warc_type", "target_uri",
        "content_type", "http_status", "http_content_type", "body",
    )


# charsets the decode expression handles natively (JVM decoder names);
# everything else quarantines to NULL text + decode_ok=false — at crawl
# scale an exotic charset is a per-row data condition, not a job error
_KNOWN_CHARSETS = {
    "utf-8": "UTF-8",
    "utf8": "UTF-8",
    "us-ascii": "US-ASCII",
    "ascii": "US-ASCII",
    "iso-8859-1": "ISO-8859-1",
    "latin-1": "ISO-8859-1",
    "latin1": "ISO-8859-1",
    "utf-16": "UTF-16",
    "utf-16le": "UTF-16LE",
    "utf-16be": "UTF-16BE",
}


def decoded_text(
    body_col: str = "body",
    http_content_type_col: str = "http_content_type",
    default_charset: str = "UTF-8",
):
    """(text, charset, decode_ok) struct column: decode an HTTP response
    body per its Content-Type ``charset`` parameter — the correctness
    gap of blind-UTF-8 ingestion (0xE9 is 'é' in the latin-1 half of
    the web, mojibake under UTF-8). Pure column expressions: the
    charset parameter is one regexp_extract; the decode is a when-chain
    over the known charset table (``F.decode`` takes literal charset
    names, and the table is the realistic crawl set), so the whole
    thing rides codegen with zero UDFs. Unknown charsets produce
    (NULL, charset, false) — the per-row quarantine discipline
    (count them; never fail the job). Missing Content-Type or a
    parameterless one falls back to ``default_charset``."""
    cs_raw = F.lower(
        F.regexp_extract(
            F.coalesce(F.col(http_content_type_col), F.lit("")),
            r"charset=\"?([A-Za-z0-9_.:\-]+)\"?",
            1,
        )
    )
    cs = F.when(cs_raw == "", F.lit(default_charset.lower())).otherwise(cs_raw)
    text = F.lit(None).cast("string")
    for alias, jvm in sorted(set(_KNOWN_CHARSETS.items())):
        text = F.when(cs == alias, F.decode(F.col(body_col), jvm)).otherwise(
            text
        )
    ok = cs.isin(*sorted(_KNOWN_CHARSETS))
    return F.struct(
        text.alias("text"), cs.alias("charset"), ok.alias("decode_ok")
    )
