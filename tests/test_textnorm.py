"""P1-P3 normalization chain (reference StringProcessor.normalize parity
semantics: /root/reference/StringProcessor.py:142-155)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraphgenerator_spark.core.textnorm import (
    expand_contractions,
    normalize_text,
    tokenize,
)


def test_lowercase_and_nonword_collapse():
    assert normalize_text("Hello,  World!!") == "hello world "
    assert normalize_text("A-B_C") == "a b_c"  # _ is \w


def test_contractions_expand():
    assert normalize_text("I can't do it") == "i cannot do it"
    assert normalize_text("won't") == "will not"
    assert normalize_text("What's the NEFT?") == "what is the neft "


def test_double_pass_only_matters_with_surviving_apostrophe():
    # shouldn't've: first pass expands "shouldn't" + leftover "'ve" handled
    # by the extended key; unconditional double pass == conditional pass
    out = normalize_text("you shouldn't've gone")
    assert "'" not in out
    assert "should not have" in out


def test_non_en_lowercase_only():
    assert normalize_text("C'est Bon!", lang="fr") == "c'est bon!"


def test_none_passthrough():
    assert normalize_text(None) is None


def test_trailing_space_preserved():
    # \W+ -> " " does NOT strip ends (StringProcessor.py:150-154)
    assert normalize_text("end?") == "end "


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.text(alphabet=st.characters(whitelist_categories=("Ll", "Nd", "Zs")), max_size=100))
@settings(max_examples=100, deadline=None)
def test_tokenize_roundtrip_on_clean_text(s):
    toks = tokenize(normalize_text(s))
    assert all(" " not in t and t for t in toks)


def test_expand_is_noop_without_apostrophe():
    s = "plain words without contractions"
    assert expand_contractions(s) == s
