"""Minimal, dependency-free DOCX text codec (stdlib zipfile + xml.etree).

The reference converts DOCX exactly like PPTX: shell out to LibreOffice
(``docx2pdf`` — TypeConverter.class.js:70-127) and walk the produced
PDF. No office suite exists in this container, but DOCX is an OOXML
package (ECMA-376, public): WordprocessingML text lives in ``<w:t>``
runs inside ``word/document.xml``, resolved through the same
package-relationship walk as pptxmini. This module implements the
subset a text pipeline needs:

* ``encode_docx``  — pages (list of paragraph strings each) → a real
  .docx zip: ``[Content_Types].xml``, package rels, and a document
  part whose paragraphs carry one-or-more ``<w:r><w:t>`` runs;
  embedded ``\\n`` becomes ``<w:br/>``, ``\\t`` becomes ``<w:tab/>``,
  and page boundaries become explicit ``<w:br w:type="page"/>`` runs
  in a dedicated paragraph. Deterministic bytes (pinned zip
  timestamps) so fixtures hash stably.
* ``decode_docx``  — .docx bytes → per-page ordered paragraph texts,
  resolved the way a real consumer must: package rels → the
  officeDocument part → ``w:body`` paragraphs in document order; runs
  concatenate within a paragraph. Page-split rule (pinned): each
  ``w:br w:type="page"`` starts a new page; the text before it stays
  as a paragraph on the old page and the text after it becomes a new
  paragraph on the new page, EXCEPT that an empty fragment in a
  paragraph that contains a page break emits nothing (so a dedicated
  break-only paragraph adds no phantom empty paragraphs, while a
  genuinely empty ``<w:p/>`` without breaks still counts).

Word order comes from document order inside ``w:body`` — unlike PPTX
there is no id-list indirection, but the document PART name still
comes from the rels walk, never from a hardcoded path. Malformed
packages raise ValueError.

Scale note: like pdfmini/pptxmini this is pure bytes→text, run inside
Arrow-batched ``mapInPandas`` (operators/convert.py); zip inflate cost
is per-document and embarrassingly parallel.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

from ocr_search_spark.training.pptxmini import (
    _REL_OFFICEDOC,
    _read_rels,
    _xml_esc,
)

__all__ = ["encode_docx", "decode_docx", "is_docx"]

_NS_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"


# --------------------------------------------------------------- writer


def _para_xml(text: str) -> str:
    """One paragraph: runs split at the first space (round-trip must
    re-concatenate runs), ``\\n`` → ``<w:br/>``, ``\\t`` → ``<w:tab/>``."""
    runs: list[str] = []

    def emit(seg: str) -> None:
        parts: list[str] = []
        for k, piece in enumerate(seg.split("\t")):
            if k:
                parts.append("<w:tab/>")
            if piece:
                parts.append(
                    f'<w:t xml:space="preserve">{_xml_esc(piece)}</w:t>'
                )
        runs.append(f"<w:r>{''.join(parts)}</w:r>")

    for seg_i, seg in enumerate(text.split("\n")):
        if seg_i:
            runs.append("<w:r><w:br/></w:r>")
        sp = seg.find(" ")
        if 0 < sp < len(seg) - 1:
            emit(seg[: sp + 1])
            emit(seg[sp + 1 :])
        else:
            emit(seg)
    return f"<w:p>{''.join(runs)}</w:p>"


_PAGE_BREAK_P = '<w:p><w:r><w:br w:type="page"/></w:r></w:p>'


def encode_docx(pages: list[list[str]]) -> bytes:
    """Paragraph texts per page → deterministic .docx bytes; pages are
    separated by a dedicated page-break paragraph."""
    body: list[str] = []
    for i, paras in enumerate(pages):
        if i:
            body.append(_PAGE_BREAK_P)
        body.extend(_para_xml(t) for t in paras)

    parts: dict[str, bytes] = {}
    parts["[Content_Types].xml"] = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="{_NS_CT}">'
        f'<Default Extension="rels" ContentType="application/vnd.'
        f'openxmlformats-package.relationships+xml"/>'
        f'<Default Extension="xml" ContentType="application/xml"/>'
        f'<Override PartName="/word/document.xml" ContentType="application/'
        f'vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        f"</Types>"
    ).encode()
    parts["_rels/.rels"] = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_REL}">'
        f'<Relationship Id="rId1" Type="{_REL_OFFICEDOC}" '
        f'Target="word/document.xml"/></Relationships>'
    ).encode()
    parts["word/document.xml"] = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_NS_W}"><w:body>{"".join(body)}</w:body>'
        f"</w:document>"
    ).encode()

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name in sorted(parts):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, parts[name])
    return buf.getvalue()


# --------------------------------------------------------------- parser


def decode_docx(data: bytes) -> list[list[str]]:
    """.docx bytes → per-page paragraph texts (see page-split rule in
    the module docstring)."""
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a zip/docx: {e}") from None
    with z:
        pkg_rels = _read_rels(z, "")
        doc_part = next(
            (t for (typ, t) in pkg_rels.values() if typ == _REL_OFFICEDOC), None
        )
        if doc_part is None:
            raise ValueError("package has no officeDocument relationship")
        try:
            doc_xml = z.read(doc_part)
        except KeyError:
            raise ValueError(f"missing document part {doc_part}") from None
        try:
            root = ET.fromstring(doc_xml)
        except ET.ParseError as e:
            raise ValueError(f"bad document XML: {e}") from None
        body = root.find(f"{{{_NS_W}}}body")
        if body is None:
            raise ValueError("document has no w:body")

        t_tag = f"{{{_NS_W}}}t"
        br_tag = f"{{{_NS_W}}}br"
        tab_tag = f"{{{_NS_W}}}tab"
        type_attr = f"{{{_NS_W}}}type"

        pages: list[list[str]] = [[]]
        for p in body.iter(f"{{{_NS_W}}}p"):
            chunks: list[list[str]] = [[]]
            for node in p.iter():
                if node.tag == t_tag:
                    chunks[-1].append(node.text or "")
                elif node.tag == tab_tag:
                    chunks[-1].append("\t")
                elif node.tag == br_tag:
                    if node.get(type_attr) == "page":
                        chunks.append([])
                    else:
                        chunks[-1].append("\n")
            has_break = len(chunks) > 1
            for j, frag in enumerate("".join(c) for c in chunks):
                if j:
                    pages.append([])
                if frag or not has_break:
                    pages[-1].append(frag)
        return pages


def is_docx(data: bytes) -> bool:
    """Cheap container sniff: zip magic + a word document part."""
    if not data.startswith(b"PK\x03\x04"):
        return False
    return re.search(rb"word/document\.xml", data) is not None
