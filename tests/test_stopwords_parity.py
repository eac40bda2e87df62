"""Stop-word data parity with the reference (ADVICE round 1, item 1).

The en and english_question_words sets are plain data copied verbatim from
/root/reference/StopWords.py:5-32; stop filtering feeds unigram/phrase/verb
dictionaries, tags, and fallback tags, so any drift silently diverges
default-config outputs from upstream. These tests parse the reference file
(AST literal_eval — no import, no execution) and assert set equality.
"""

from __future__ import annotations

import ast
import os

import pytest

from knowledgegraphgenerator_spark.core.stopwords import (
    ENGLISH_QUESTION_WORDS,
    ENGLISH_STOP_WORDS,
    get_stop_words,
    resolve_stop_words,
)

REF = "/root/reference/StopWords.py"


def _reference_sets() -> dict[str, set]:
    tree = ast.parse(open(REF).read())
    cls = next(n for n in tree.body if isinstance(n, ast.ClassDef))
    out = {}
    for node in cls.body:
        if isinstance(node, ast.Assign) and isinstance(
            node.targets[0], ast.Name
        ):
            try:
                out[node.targets[0].id] = ast.literal_eval(node.value)
            except ValueError:
                pass
    return out


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree absent")
def test_en_set_equals_reference():
    ref = _reference_sets()
    assert set(ENGLISH_STOP_WORDS) == set(ref["en"])


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree absent")
def test_question_words_equal_reference():
    ref = _reference_sets()
    assert set(ENGLISH_QUESTION_WORDS) == set(ref["english_question_words"])


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree absent")
def test_get_stop_words_en_union_matches_reference_semantics():
    ref = _reference_sets()
    expected = set(ref["en"]) | set(ref["english_question_words"])
    assert set(get_stop_words("en")) == expected


def test_resolve_provided_still_unions_question_words():
    # reference # NLP-7736: input-provided en stop words union question words
    got = resolve_stop_words("en", ["foo", "BAR"])
    assert "foo" in got and "bar" in got
    assert ENGLISH_QUESTION_WORDS <= got


def test_reference_content_words_present():
    # spot markers that distinguish the reference list from the NLTK list
    for w in ("help", "go", "take", "describe", "detail", "many", "much"):
        assert w in get_stop_words("en"), w
