"""Charset sniffing for raw web-page bytes (WHATWG-style).

Real Common-Crawl HTML is a quarter legacy-encoded (windows-125x,
Shift_JIS, GBK, EUC-KR, …); decoding everything as UTF-8 with
replacement characters silently corrupts the byte-identity surface.
This implements the public WHATWG HTML "determining the character
encoding" algorithm's effective core, precedence order:

1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) — always wins;
2. transport-layer charset (HTTP ``Content-Type`` — the WARC source
   surfaces it as ``http_charset``);
3. ``<meta charset=…>`` / ``<meta http-equiv="Content-Type" …>``
   prescan over the first 1024 bytes;
4. strict UTF-8 attempt;
5. windows-1252 fallback (the WHATWG default for web content — note
   the spec maps ``iso-8859-1``/``ascii`` labels to windows-1252).

Decoding never raises: the chosen codec runs with ``errors='replace'``
so undecodable bytes surface as U+FFFD, not task failures. The sniff
is pure per-row byte logic inside the existing Arrow extraction
kernel — no extra pass, no shuffle, scale-neutral.
"""

from __future__ import annotations

import codecs
import re

# WHATWG encoding-label subset → Python codec names. Labels the spec
# aliases to windows-1252 (latin1, ascii) follow the spec, not the
# IANA name.
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "us-ascii": "windows-1252",
    "ascii": "windows-1252", "windows-1252": "windows-1252",
    "cp1252": "windows-1252", "x-cp1252": "windows-1252",
    "windows-1250": "windows-1250", "windows-1251": "windows-1251",
    "cp1251": "windows-1251", "windows-1253": "windows-1253",
    "windows-1254": "windows-1254", "windows-1255": "windows-1255",
    "windows-1256": "windows-1256", "windows-1257": "windows-1257",
    "windows-1258": "windows-1258",
    "iso-8859-2": "iso8859-2", "iso-8859-5": "iso8859-5",
    "iso-8859-7": "iso8859-7", "iso-8859-9": "windows-1254",
    "iso-8859-15": "iso8859-15",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    "gb2312": "gbk", "gbk": "gbk", "gb_2312": "gbk", "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "euc_kr", "korean": "euc_kr", "ks_c_5601-1987": "euc_kr",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

_BOMS = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# prescan regexes over the raw head bytes (spec: first 1024 bytes);
# one pattern catches both <meta charset=…> and the http-equiv
# content="…; charset=…" form
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9][a-zA-Z0-9._:-]*)",
    re.IGNORECASE,
)
_CHARSET_PARAM_RE = re.compile(
    r"charset\s*=\s*[\"']?\s*([a-zA-Z0-9][a-zA-Z0-9._:-]*)", re.IGNORECASE
)


def resolve_label(label: str | None) -> str | None:
    """WHATWG label → Python codec name, or None if unrecognised.
    Sloppy real-world labels (``euc_kr``, ``SHIFT-JIS``) retry with
    underscore↔hyphen swapped after the exact table misses."""
    if not label:
        return None
    key = label.strip().strip("\"'").lower()
    hit = _LABELS.get(key)
    if hit is None:
        hit = _LABELS.get(key.replace("_", "-")) or _LABELS.get(
            key.replace("-", "_")
        )
    return hit


def charset_from_content_type(content_type: str | None) -> str | None:
    """Extract the charset parameter from an HTTP Content-Type value
    (label form, not yet resolved) — e.g. ``text/html; charset=SJIS``."""
    if not content_type:
        return None
    m = _CHARSET_PARAM_RE.search(content_type)
    return m.group(1) if m else None


def sniff_charset(data: bytes, transport: str | None = None) -> tuple[str, str]:
    """→ (python_codec, source) with source ∈ {bom, transport, meta,
    utf8, fallback} in WHATWG precedence order."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc, "bom"
    codec = resolve_label(transport)
    if codec is not None:
        return codec, "transport"
    m = _META_CHARSET_RE.search(data[:1024])
    if m:
        codec = resolve_label(m.group(1).decode("latin-1"))
        if codec is not None:
            # spec: a meta claiming utf-16 is treated as utf-8 (the
            # prescan found ASCII-compatible bytes)
            if codec.startswith("utf-16"):
                codec = "utf-8"
            return codec, "meta"
    try:
        data.decode("utf-8")
        return "utf-8", "utf8"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


def decode_html(data: bytes, transport: str | None = None) -> tuple[str, str, str]:
    """bytes → (text, codec, source); never raises (errors='replace';
    BOM stripped from the decoded text)."""
    codec, source = sniff_charset(data, transport)
    if source == "bom":
        bom = next(b for b, e in _BOMS if data.startswith(b))
        data = data[len(bom) :]
    try:
        return data.decode(codec, errors="replace"), codec, source
    except LookupError:  # codec missing from the runtime — be safe
        return data.decode("utf-8", errors="replace"), "utf-8", "fallback"
