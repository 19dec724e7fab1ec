"""docxmini: dependency-free WordprocessingML codec round-trips.

Reference path: TypeConverter.class.js:70-127 converts .docx via
LibreOffice → PDF; here the package itself is parsed (ECMA-376 OOXML),
so the gate is bytes → pages → bytes identity plus malformed-package
refusals, with no office suite in the loop.
"""

import io
import zipfile

import pytest

from ocr_search_spark.training.docxmini import (
    decode_docx,
    encode_docx,
    is_docx,
)


def test_roundtrip_multi_page():
    pages = [
        ["first paragraph here", "second one"],
        ["next page opens", "and continues", "three paras"],
        ["last page"],
    ]
    assert decode_docx(encode_docx(pages)) == pages


def test_roundtrip_newline_and_tab():
    pages = [["line one\nline two", "col a\tcol b\tcol c"]]
    assert decode_docx(encode_docx(pages)) == pages


def test_roundtrip_empty_paragraph_and_single_word():
    pages = [["", "word"], [""]]
    assert decode_docx(encode_docx(pages)) == pages


def test_runs_concatenate():
    # encoder splits at the first space into two runs; text must rejoin
    data = encode_docx([["alpha beta gamma"]])
    assert b"<w:r>" in zipfile.ZipFile(io.BytesIO(data)).read(
        "word/document.xml"
    )
    assert decode_docx(data) == [["alpha beta gamma"]]


def test_mid_paragraph_page_break_splits():
    # hand-built: "aaa<page break>bbb" in ONE paragraph
    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{ns}"><w:body><w:p>'
        f"<w:r><w:t>aaa</w:t></w:r>"
        f'<w:r><w:br w:type="page"/></w:r>'
        f"<w:r><w:t>bbb</w:t></w:r>"
        f"</w:p></w:body></w:document>"
    ).encode()
    base = encode_docx([["x"]])
    z = zipfile.ZipFile(io.BytesIO(base))
    parts = {n: z.read(n) for n in z.namelist()}
    parts["word/document.xml"] = doc
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n, b in parts.items():
            out.writestr(n, b)
    assert decode_docx(buf.getvalue()) == [["aaa"], ["bbb"]]


def test_deterministic_bytes():
    pages = [["stable fixture bytes"]]
    assert encode_docx(pages) == encode_docx(pages)


def test_xml_escaping_roundtrip():
    pages = [["a<b>&c", 'quotes "x"']]
    assert decode_docx(encode_docx(pages)) == pages


def test_not_a_zip_raises():
    with pytest.raises(ValueError, match="not a zip"):
        decode_docx(b"garbage bytes")


def test_missing_document_part_raises():
    base = encode_docx([["x"]])
    z = zipfile.ZipFile(io.BytesIO(base))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in z.namelist():
            if n != "word/document.xml":
                out.writestr(n, z.read(n))
    with pytest.raises(ValueError, match="missing document part"):
        decode_docx(buf.getvalue())


def test_sniff():
    from ocr_search_spark.training.pptxmini import encode_pptx

    assert is_docx(encode_docx([["hi"]]))
    assert not is_docx(encode_pptx([["hi"]]))
    assert not is_docx(b"%PDF-1.4")
