"""Minimal, dependency-free PDF text extraction (R2 fallback tier).

The reference extracts per-page text with pypdf (`app/main.py:19-27`);
this container has no pypdf, so until now R2 ran only on the
plain-text/form-feed fallback. This module implements the subset of
ISO 32000 (the public PDF spec) needed to read text from simple,
classically-structured PDFs with nothing but the stdlib:

- object scanning (``N G obj ... endobj``) — xref offsets are
  IGNORED; the object map is rebuilt by scanning, which also handles
  incrementally-updated files (later definitions win);
- the Catalog → Pages → Kids page-tree walk (page ORDER is the tree
  order, as in pypdf);
- content streams, raw or /FlateDecode (zlib);
- the text-showing operators ``Tj``, ``'``, ``"``, ``TJ`` with
  literal-string escapes (octal, \\(, \\), line continuations) and
  hex strings; ``Td``/``TD`` with a vertical component and ``T*``
  emit newlines (the same line-break approximation pypdf makes).

Out of scope (documented, not silently wrong): PDF 1.5+ compressed
object streams (/ObjStm) and xref streams (those objects are simply
absent from the scan), non-Flate filters, CMap/ToUnicode font
remapping (string bytes decode as Latin-1, UTF-16BE with BOM as
such — correct for the standard-encoding fonts simple generators
emit). Callers needing full fidelity plug pypdf into the same seam
(readers.get_pdf_parser prefers it when importable).
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)


def _objects(data: bytes) -> dict[int, bytes]:
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(3)  # later (updated) defs win
    return objs


def _dict_part(body: bytes) -> bytes:
    """The object's dictionary portion (everything before stream data
    — good enough for the keys we probe)."""
    i = body.find(b"stream")
    return body if i < 0 else body[:i]


def _ref_value(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _ref_array(body: bytes, key: bytes) -> list[int]:
    """Refs under ``key``, whether a single ref or an [ array ]."""
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", body, re.DOTALL)
    if m:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    one = _ref_value(body, key)
    return [one] if one is not None else []


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Walk Catalog → Pages → Kids; returns page object numbers in
    tree order. Falls back to scan order of /Type /Page objects when
    the tree is unreachable (e.g. root lives in an object stream)."""
    root = None
    for body in objs.values():  # trailer may be anywhere; scan for Catalog
        if re.search(rb"/Type\s*/Catalog\b", _dict_part(body)):
            root = body
            break
    pages: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64:  # malformed cyclic tree guard
            return
        body = objs.get(num)
        if body is None:
            return
        d = _dict_part(body)
        if re.search(rb"/Type\s*/Pages\b", d):
            for kid in _ref_array(d, b"/Kids"):
                walk(kid, depth + 1)
        elif re.search(rb"/Type\s*/Page\b", d):
            pages.append(num)

    if root is not None:
        top = _ref_value(_dict_part(root), b"/Pages")
        if top is not None:
            walk(top)
    if not pages:  # degraded: scan order
        pages = [
            n
            for n, b in objs.items()
            if re.search(rb"/Type\s*/Page\b", _dict_part(b))
        ]
    return pages


def _stream_bytes(body: bytes) -> bytes:
    raw = None
    # Spec-correct extent first: /Length N bytes after the EOL that
    # follows the 'stream' keyword (ISO 32000 §7.3.8.1). The regex
    # fallback's trailing `\r?\n endstream` match truncates any stream
    # whose DATA ends in 0x0D — a compressed stream hits that with
    # probability ~1/256 (4 of 500 rendered fixture docs did).
    # Indirect /Length (N 0 R) falls through to the regex.
    d = _dict_part(body)
    if not re.search(rb"/Length\s+\d+\s+\d+\s+R", d):
        n = re.search(rb"/Length\s+(\d+)", d)
        s = re.search(rb"stream(?:\r\n|\n|\r)", body)
        if n and s:
            start = s.end()
            end = start + int(n.group(1))
            if end <= len(body) and b"endstream" in body[end : end + 32]:
                raw = body[start:end]
    if raw is None:
        m = _STREAM_RE.search(body)
        if not m:
            return b""
        raw = m.group(1)
    if re.search(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b", _dict_part(body)):
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return b""
    return raw


def _decode_pdf_string(b: bytes) -> str:
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """data[i] == '(' — returns (string bytes, index past ')')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f"}[e]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _tokens(data: bytes):
    """Content-stream tokens: ('str', bytes) | ('num', float) |
    ('op', bytes) | ('[', ) | (']', ). Names, dicts and inline
    images are skipped."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == 0x28:  # (
            s, i = _parse_literal(data, i)
            yield ("str", s)
        elif c == 0x3C and i + 1 < n and data[i + 1] == 0x3C:  # <<
            i += 2
        elif c == 0x3C:  # hex string
            j = data.find(b">", i + 1)
            j = n if j < 0 else j
            h = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(h) % 2:
                h += b"0"
            try:
                yield ("str", bytes.fromhex(h.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif c == 0x5B:  # [
            yield ("[",)
            i += 1
        elif c == 0x5D:  # ]
            yield ("]",)
            i += 1
        elif c == 0x2F:  # /Name
            m = re.match(rb"/[^\s()<>\[\]{}/%]*", data[i:])
            i += m.end() if m else 1
        elif c == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _NUM_RE.match(data, i)
            if m and m.end() > i:
                yield ("num", float(m.group()))
                i = m.end()
                continue
            m = _OP_RE.match(data, i)
            if m:
                op = m.group()
                if op == b"BI":  # inline image: skip through EI
                    # EI must be whitespace-delimited — a bare
                    # data.find(b"EI") can match the byte pair inside
                    # binary image data and resume tokenizing mid-image
                    # (garbage string tokens in extracted text).
                    m_ei = re.search(rb"[\s\x00]EI(?=[\s\x00]|$)", data[i:])
                    i = n if m_ei is None else i + m_ei.end()
                else:
                    yield ("op", op)
                    i = m.end()
            else:
                i += 1  # stray delimiter (e.g. '>' '{' '}')


def extract_text(content_stream: bytes) -> str:
    """Text of one decoded content stream.

    Layout-operator newlines (``T*``/``Td``/``TD`` moves and the
    implicit line break of ``'``/``"``) are suppressed until the
    first text-showing op has emitted — NOT stripped from the final
    result, which would also eat genuine leading ``\\n`` bytes
    decoded from literal strings (the r03 lstrip bug its own
    round-trip property test caught with payload ``b"\\n"``).
    """
    out: list[str] = []
    shown = False  # any text-showing op emitted yet?
    stack: list = []  # operand stack: str/num/list
    arr: list | None = None
    for tok in _tokens(content_stream):
        kind = tok[0]
        if kind == "[":
            arr = []
        elif kind == "]":
            stack.append(arr if arr is not None else [])
            arr = None
        elif kind in ("str", "num"):
            (arr if arr is not None else stack).append(tok[1])
        else:
            op = tok[1]
            if op == b"Tj" and stack and isinstance(stack[-1], bytes):
                out.append(_decode_pdf_string(stack[-1]))
                shown = True
            elif op in (b"'", b'"') and stack and isinstance(stack[-1], bytes):
                out.append(("\n" if shown else "") + _decode_pdf_string(stack[-1]))
                shown = True
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                out.append(
                    "".join(
                        _decode_pdf_string(e)
                        for e in stack[-1]
                        if isinstance(e, bytes)
                    )
                )
                shown = True
            elif op == b"T*":
                if shown:
                    out.append("\n")
            elif op in (b"Td", b"TD"):
                # newline only on an actual vertical move
                if (
                    shown
                    and len(stack) >= 1
                    and isinstance(stack[-1], float)
                    and stack[-1] != 0.0
                ):
                    out.append("\n")
            stack.clear()
    return "".join(out)


def extract_pages(content: bytes) -> list[str]:
    """Per-page text of a PDF byte string (the R2 parser contract:
    ``bytes -> list[str]``, one entry per page, blank for pages whose
    objects are unreadable)."""
    objs = _objects(content or b"")
    pages = []
    for pnum in _page_order(objs):
        body = objs.get(pnum, b"")
        streams = [
            _stream_bytes(objs[c]) for c in _ref_array(_dict_part(body), b"/Contents") if c in objs
        ]
        pages.append("\n".join(extract_text(s) for s in streams if s).strip("\n"))
    return pages


# --- writer -----------------------------------------------------------------

def _encode_pdf_string(s: str) -> bytes:
    """Text → literal-string bytes that ``_decode_pdf_string`` inverts
    exactly: latin-1 when possible, else BOM + UTF-16BE; then
    byte-level escapes for ``\\ ( ) \\r \\n`` (escaping AFTER encoding —
    a UTF-16 code unit can contain a paren byte)."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    else:
        # latin-1 text starting with U+00FE U+00FF encodes to bytes
        # FE FF, which the decoder would misread as a UTF-16BE BOM —
        # force the BOM branch for exact inversion (r06 ADVICE).
        if raw[:2] == b"\xfe\xff":
            raw = b"\xfe\xff" + s.encode("utf-16-be")
    return (
        raw.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
        .replace(b"\n", b"\\n")
    )


def render_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Minimal VALID classic PDF (correct xref offsets, one /Page per
    entry, one Flate content stream of ``BT (text) Tj ET``) whose
    ``extract_pages`` round-trip returns each page verbatim modulo the
    reader's per-page ``.strip("\\n")``.  Fixture/writer counterpart of
    the extractor above — used to materialize text corpora as real
    PDFs so the R1→R2 scan path (binaryFile → parser) can be driven
    end-to-end without pypdf (reference trace: app/main.py:19-27
    reads such a directory of PDFs)."""
    objs: list[bytes] = []  # bodies; object number = index + 1
    kids: list[int] = []
    next_num = 3  # 1 = Catalog, 2 = Pages
    content_refs: list[int] = []
    for p in pages:
        stream = b"BT (" + _encode_pdf_string(p) + b") Tj ET"
        data = zlib.compress(stream) if compress else stream
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            b"<< "
            + filt
            + b"/Length "
            + str(len(data)).encode()
            + b" >>\nstream\n"
            + data
            + b"\nendstream\n"
        )
        content_refs.append(next_num)
        next_num += 1
    for ref in content_refs:
        objs.append(b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>\n" % ref)
        kids.append(next_num)
        next_num += 1
    catalog = b"<< /Type /Catalog /Pages 2 0 R >>\n"
    pages_obj = (
        # /MediaBox is spec-required (inheritable from the Pages node)
        # — pypdf-equipped environments parse these fixtures too.
        b"<< /Type /Pages /MediaBox [ 0 0 612 792 ] /Kids [ "
        + b" ".join(b"%d 0 R" % k for k in kids)
        + b" ] /Count "
        + str(len(kids)).encode()
        + b" >>\n"
    )
    bodies = [catalog, pages_obj] + objs
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(bodies, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"endobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(bodies) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(bodies) + 1,
        xref_at,
    )
    return bytes(out)
