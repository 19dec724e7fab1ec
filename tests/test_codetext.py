"""Tests for the code-aware curation operators (training/codetext.py):
fenced-code extraction, keyword language ID, SPDX license detection,
Unicode-script profiling — each against hand-built inputs with known
answers, including the adversarial cases (unclosed fences, dual
licenses, tie-breaking on script dominance)."""

from __future__ import annotations

import pytest

from ocr_search_spark.training import codetext as CT


@pytest.fixture(scope="module")
def code_docs(spark):
    rows = [
        (1, "prose\n```python\ndef f(x):\n    return x\n```\nmore prose"),
        # two blocks, second without an info string
        (2, "a\n```js\nlet x = 1;\n```\nb\n```\nSELECT 1;\n```"),
        # unclosed fence: must yield ZERO blocks
        (3, "broken\n```python\ndef g():\n    pass"),
        # bare ``` mid-sentence (no newline after info string): no block
        (4, "inline `tick` and ``` stray"),
        (5, ""),
        # same language twice -> one distinct lang; uppercase info string
        (6, "```PY\na\n```\nmid\n```py\nbb\n```"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_fenced_code_blocks(code_docs):
    out = {r["doc_id"]: r for r in CT.fenced_code_blocks(code_docs).collect()}
    assert out[1]["n_blocks"] == 1
    assert out[1]["langs"] == "python"
    assert out[1]["code_chars"] == len("def f(x):\n    return x\n")
    assert out[2]["n_blocks"] == 2
    assert out[2]["langs"] == "js"  # empty info string filtered out
    assert out[2]["code_chars"] == len("let x = 1;\n") + len("SELECT 1;\n")
    assert out[3]["n_blocks"] == 0 and out[3]["code_chars"] == 0
    assert out[4]["n_blocks"] == 0
    assert out[5]["n_blocks"] == 0 and out[5]["code_ratio"] == 0.0
    assert out[6]["n_blocks"] == 2 and out[6]["langs"] == "py"  # lowercased, distinct
    assert out[1]["code_ratio"] == pytest.approx(
        out[1]["code_chars"] / len("prose\n```python\ndef f(x):\n    return x\n```\nmore prose")
    )


def test_code_language_heuristic(spark):
    rows = [
        (1, "def f(x):\n    return 1"),
        (2, "#include <stdio.h>\nint main(void) {}"),
        (3, "fn add(a: i32) -> i32 { a }"),
        (4, "public static void main(String[] a) {}"),
        (5, "const f = (x) => x + 1;"),
        (6, "function foo() { return 1; }"),
        (7, "SELECT a FROM t WHERE b = 1"),
        (8, "just some prose with no code keywords"),
        # priority: python rule fires before the js arrow rule
        (9, "def g(x):\n    return (lambda y: y)(x)  # => arrow in comment"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    out = {r["doc_id"]: r["language"] for r in CT.classify_code_blocks(df).collect()}
    assert out == {
        1: "python", 2: "c", 3: "rust", 4: "java", 5: "javascript",
        6: "javascript", 7: "sql", 8: "unknown", 9: "python",
    }


def test_detect_licenses(spark):
    rows = [
        (1, 'Licensed under the Apache License, Version 2.0 (the "License")'),
        (2, "Permission is hereby granted, free of charge, to any person"),
        (3, "GNU General Public License as published, either version 3"),
        (4, "Redistribution and use in source and binary forms, with or without"),
        # dual license: sorted, comma-joined; MPL flips permissive off
        (5, "MIT License text ... Mozilla Public License, v. 2.0"),
        (6, "no license text at all"),
        # GPL v2 vs v3 disambiguation
        (7, "GNU General Public License, version 2 of the License"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in CT.detect_licenses(df).collect()}
    assert out[1]["licenses"] == "Apache-2.0" and out[1]["permissive"]
    assert out[2]["licenses"] == "MIT" and out[2]["permissive"]
    assert out[3]["licenses"] == "GPL-3.0" and not out[3]["permissive"]
    assert out[4]["licenses"] == "BSD-3-Clause" and out[4]["permissive"]
    assert out[5]["licenses"] == "MIT,MPL-2.0" and not out[5]["permissive"]
    assert out[6]["licenses"] == "" and not out[6]["permissive"]
    assert out[7]["licenses"] == "GPL-2.0" and not out[7]["permissive"]


def test_script_profile(spark):
    rows = [
        (1, "hello world"),
        (2, "привет мир"),
        (3, "好好好 hi"),  # cjk 3 > latin 2
        (4, "γειά"),
        (5, "مرحبا"),
        (6, "ab αβ"),  # tie latin=2 greek=2 -> latin (first in order) wins
        (7, "1234 !!"),  # all zero counts -> every count == max(0) -> latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in CT.script_profile(df).collect()}
    assert out[1]["latin_chars"] == 10 and out[1]["dominant"] == "latin"
    assert out[2]["cyrillic_chars"] == 9 and out[2]["dominant"] == "cyrillic"
    assert out[3]["cjk_chars"] == 3 and out[3]["dominant"] == "cjk"
    assert out[4]["greek_chars"] == 4 and out[4]["dominant"] == "greek"
    assert out[5]["arabic_chars"] == 5 and out[5]["dominant"] == "arabic"
    assert out[6]["dominant"] == "latin"
    assert out[7]["dominant"] == "latin"
