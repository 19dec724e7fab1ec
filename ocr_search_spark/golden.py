"""Independent pure-Python oracle for the golden-fixture tests.

Implements the textproc SPEC (see textproc.py module docstring) as plain
single-row loops, sharing only the pinned *constants* with the engine —
none of the vectorized/columnar code paths. Tests compare the Spark
pipeline's output against this implementation on the synthetic corpus:
span-sequence equality (kind, text, media_ref, order) per doc_id — the
authoritative invariant (BASELINE.json north_rule).

Deliberately slow and obvious. Never imported by the engine.
"""

from __future__ import annotations

import hashlib
import re

from . import textproc as spec


def ocr_text(media_ref: str) -> str:
    h = hashlib.sha256(media_ref.encode("utf-8")).hexdigest()
    n = 3 + int(h[0:2], 16) % 6
    words = []
    for i in range(n):
        idx = int(h[2 + 2 * i : 4 + 2 * i], 16) % 64
        words.append(spec.OCR_VOCAB[idx])
    return " ".join(words)


_BOILER = re.compile("(?i)" + spec.BOILERPLATE_LINE_RE)


def strip_boilerplate(text: str) -> str:
    if text is None:
        text = ""
    # 1. tags
    text = re.sub(r"<[^>]*>", " ", text)
    # 2. boilerplate lines (full-line match, case-insensitive)
    kept = [ln for ln in text.split("\n") if not _BOILER.fullmatch(ln)]
    text = "\n".join(kept)
    # 3. strip chars
    for ch in spec.STRIP_CHARS:
        text = text.replace(ch, "")
    # 4. whitespace collapse
    return re.sub(r"\s+", " ", text).strip()


def normalize_media_ref(doc_id: str, offset: int) -> str:
    return f"{doc_id}-{str(offset).zfill(spec.MEDIA_REF_PAD)}.png"


def extract_doc(doc_id: str, spans: list[dict]) -> list[dict]:
    """Expected extraction output for one document, offsets preserved."""
    out = []
    for s in sorted(spans, key=lambda s: s["offset"]):
        if s["kind"] == "media":
            out.append(
                {
                    "kind": "media",
                    "text": ocr_text(s["media_ref"]),
                    "media_ref": normalize_media_ref(doc_id, s["offset"]),
                    "offset": s["offset"],
                }
            )
        else:
            out.append(
                {
                    "kind": "text",
                    "text": strip_boilerplate(s["text"]),
                    "media_ref": "",
                    "offset": s["offset"],
                }
            )
    return out


def lemmatize(token: str) -> str:
    if token in spec.LEMMA_EXCEPTIONS:
        return spec.LEMMA_EXCEPTIONS[token]
    if re.match(r"^(..+)sses$", token):
        token = token[:-2]  # sses -> ss
    if m := re.match(r"^(..+)ies$", token):
        token = m.group(1) + "y"
    if (m := re.match(r"^(.*[^sui])s$", token)):
        token = m.group(1)
    if re.match(r"^(...+)ing$", token):
        token = token[:-3]
    if re.match(r"^(...+)ed$", token):
        token = token[:-2]
    return token


def segment_cjk(chars: str) -> list[str]:
    out = []
    i = 0
    while i < len(chars):
        word = chars[i]
        for ln in range(min(spec.CJK_MAX_WORD, len(chars) - i), 1, -1):
            if chars[i : i + ln] in spec.CJK_DICT_SET:
                word = chars[i : i + ln]
                break
        out.append(word)
        i += len(word)
    return out


def tokenize(text: str) -> list[str]:
    t = text.lower()
    for ch in spec.STRIP_CHARS:
        t = t.replace(ch, "")
    for ch in spec.ASCII_PUNCT:
        t = t.replace(ch, " ")
    cjk_chars = []
    out = []
    for tok in t.split():
        if all(ord(c) < 128 for c in tok):
            if (
                len(tok) > 1
                and any("a" <= c <= "z" for c in tok)
                and tok not in spec.STOPWORDS_SET
            ):
                out.append(lemmatize(tok))
        else:
            for c in tok:
                if "一" <= c <= "鿿":
                    cjk_chars.append(c)
    out.extend(segment_cjk("".join(cjk_chars)))
    return out


def doc_text(extracted_spans: list[dict]) -> str:
    return " ".join(s["text"] for s in extracted_spans)


def term_postings(extracted: dict[str, list[dict]]) -> dict[tuple[str, str], int]:
    """(term, doc_id) -> tf over the whole corpus."""
    postings: dict[tuple[str, str], int] = {}
    for doc_id, spans in extracted.items():
        for term in tokenize(doc_text(spans)):
            key = (term, doc_id)
            postings[key] = postings.get(key, 0) + 1
    return postings


def search(
    postings: dict[tuple[str, str], int], query: str, k: int = 20
) -> list[tuple[str, int]]:
    """Expected hit list: (doc_id, score) — score = max tf over matched
    terms, desc, tie-break doc_id asc, top-k."""
    terms = set(tokenize(query))
    scores: dict[str, int] = {}
    for (term, doc_id), tf in postings.items():
        if term in terms:
            scores[doc_id] = max(scores.get(doc_id, 0), tf)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
