"""CDXJ capture index for WARC archives — the crawl-stack sidecar.

Every serious web archive pairs its WARCs with a capture index so
replay and analytics can reach one record without scanning the
archive: the OpenWayback/pywb **CDXJ** line format,

    <SURT> <14-digit timestamp> <JSON fields>

sorted lexicographically.  This module builds that index from archive
bytes and serves the complementary random-access read:

* **SURT** (Sort-friendly URI Reordering Transform): scheme dropped,
  host lowercased + reversed on dots with commas, default port
  stripped, ``)`` then the lowercased path, query params sorted.
  Conventions follow pywb's canonicalizer except that ``www.`` is NOT
  stripped (identity-preserving — the URL-dedup layers in
  ``extensions/urls`` own aliasing decisions; documented divergence).
* **Member offsets**: for plain archives the record's byte span; for
  ``.warc.gz`` the gzip MEMBER's compressed span (one record per
  member, the Common Crawl layout) — exactly what
  ``fetch_warc_record`` needs to decompress one record without
  touching its neighbors.  ``.warc.zst`` archives index with NULL
  offsets (zstd frame boundaries need the seekable-format skip table;
  documented boundary — the digest/status/mime fields still index).
* **Digest**: ``sha1:<base32>`` of the record payload as stored
  (pywb's convention — before transport decode, so the digest is
  verifiable against archive bytes alone).

Scale shape: ``warc_cdx_index`` is one narrow Arrow pass (archive
bytes never leave the executor, one row out per response record); the
index rows then sort/partition with plain DataFrame ops — at 100 TB
the index is itself a table, bucketed by SURT prefix for pruned
lookups.

Reference parity note: the reference repo has no web surface; this is
crawl-corpus extension scope alongside ``sources/warc.py``.
"""

from __future__ import annotations

import base64
import hashlib
import json
import re
import zlib
from collections.abc import Iterator

from .warc import (
    WARC_VERSIONS,
    _iter_plain_spans,
    parse_http_response,
)

__all__ = [
    "surt",
    "iter_warc_members",
    "build_cdxj",
    "cdxj_lines",
    "fetch_warc_record",
    "warc_cdx_index",
]


_DEFAULT_PORTS = {"http": "80", "https": "443"}


def surt(url: str) -> str:
    """SURT-transform one URL (see module docstring for conventions).
    URLs without ``://`` pass through lowercased-verbatim — refusing
    to guess beats mangling, the ``canonicalize_urls`` policy."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$", url.strip())
    if m is None:
        return url.strip().lower()
    scheme = m.group(1).lower()
    hostport = m.group(2).lower()
    rest = m.group(3)
    host, _, port = hostport.partition(":")
    host = host.rstrip(".")
    rev = ",".join(reversed(host.split(".")))
    if port and port != _DEFAULT_PORTS.get(scheme):
        rev = f"{rev}:{port}"  # port AFTER the reversed host
    frag_split = rest.split("#", 1)[0].lower()
    path, sep, query = frag_split.partition("?")
    if not path:
        path = "/"
    if sep:
        params = sorted(p for p in query.split("&") if p)
        query = "&".join(params)
        return f"{rev}){path}?{query}" if query else f"{rev}){path}"
    return f"{rev}){path}"


def iter_warc_members(
    data: bytes,
) -> Iterator[tuple[int | None, int | None, dict, bytes]]:
    """Yield ``(offset, length, headers, body)`` per record, where
    offset/length address the record's slice of the ARCHIVE bytes —
    the compressed gzip member for ``.warc.gz``, the plain byte span
    otherwise, and ``(None, None)`` for zstd archives (frame
    boundaries unrecoverable without the seekable-format table)."""
    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n:
            d = zlib.decompressobj(wbits=31)
            out = d.decompress(data[pos:])
            if not d.eof:
                raise ValueError("truncated gzip member in WARC payload")
            out += d.flush()
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                raise ValueError("gzip member consumed no bytes")
            for _s, _e, hdrs, body in _iter_plain_spans(out):
                yield pos, consumed, hdrs, body
            pos += consumed
        return
    if data[:4] == b"\x28\xb5\x2f\xfd":
        from .warc import iter_warc_records

        for hdrs, body in iter_warc_records(data):
            yield None, None, hdrs, body
        return
    for start, end, hdrs, body in _iter_plain_spans(data):
        yield start, end - start, hdrs, body


def _ts14(warc_date: str | None) -> str | None:
    """WARC-Date (ISO 8601) -> the CDX 14-digit timestamp."""
    if not warc_date:
        return None
    digits = re.sub(r"\D", "", warc_date)[:14]
    return digits if len(digits) == 14 else None


def build_cdxj(data: bytes, filename: str | None = None) -> list[dict]:
    """One entry per RESPONSE record: ``{surt, ts, url, status, mime,
    digest, offset, length, filename}`` (offset/length None where the
    layout can't provide them — see ``iter_warc_members``)."""
    out: list[dict] = []
    for offset, length, hdrs, body in iter_warc_members(data):
        if hdrs.get("warc-type") != "response":
            continue
        url = hdrs.get("warc-target-uri", "")
        try:
            status, hh, payload = parse_http_response(body)
            mime = hh.get("content-type", "").split(";")[0].strip() or None
        except ValueError:
            status, payload, mime = None, body, None
        digest = "sha1:" + base64.b32encode(
            hashlib.sha1(payload).digest()
        ).decode("ascii")
        out.append(
            {
                "surt": surt(url),
                "ts": _ts14(hdrs.get("warc-date")),
                "url": url,
                "status": status,
                "mime": mime,
                "digest": digest,
                "offset": offset,
                "length": length,
                "filename": filename,
            }
        )
    return out


def cdxj_lines(entries: list[dict]) -> list[str]:
    """Serialize entries as sorted CDXJ lines (``surt ts {json}``)."""
    lines = []
    for e in entries:
        fields = {
            k: v
            for k, v in e.items()
            if k not in ("surt", "ts") and v is not None
        }
        lines.append(
            f"{e['surt']} {e['ts'] or '-'} "
            + json.dumps(fields, sort_keys=True, separators=(",", ":"))
        )
    return sorted(lines)


def fetch_warc_record(
    data: bytes, offset: int, length: int
) -> tuple[dict, bytes]:
    """Random-access replay: decode ONE record from its indexed slice
    without touching the rest of the archive — the whole point of the
    index at 100 TB (a replay service range-reads ``length`` bytes at
    ``offset`` instead of scanning)."""
    chunk = data[offset : offset + length]
    if chunk[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(chunk)
        if not d.eof:
            raise ValueError("indexed slice is not a whole gzip member")
        chunk += d.flush()
    first = next(_iter_plain_spans(chunk), None)
    if first is None:
        raise ValueError("indexed slice holds no WARC record")
    _s, _e, hdrs, body = first
    return hdrs, body


def warc_cdx_index(media, payload_col: str = "payload"):
    """Arrow-batched archive -> capture-index rows: one narrow pass,
    one output row per response record; archive bytes never leave the
    executor."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = {
                "media_id": [], "surt": [], "ts": [], "url": [],
                "status": [], "mime": [], "digest": [],
                "offset": [], "length": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                for e in build_cdxj(bytes(payload)):
                    rows["media_id"].append(mid)
                    for k in (
                        "surt", "ts", "url", "status", "mime",
                        "digest", "offset", "length",
                    ):
                        rows[k].append(e[k])
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "surt": rows["surt"],
                    "ts": rows["ts"],
                    "url": rows["url"],
                    "status": pd.array(rows["status"], dtype="Int32"),
                    "mime": rows["mime"],
                    "digest": rows["digest"],
                    "offset": pd.array(rows["offset"], dtype="Int64"),
                    "length": pd.array(rows["length"], dtype="Int64"),
                }
            )

    return media.mapInPandas(
        kernel,
        schema=(
            "media_id long, surt string, ts string, url string, "
            "status int, mime string, digest string, "
            "offset long, length long"
        ),
    )
