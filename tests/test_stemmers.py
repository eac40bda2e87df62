"""N3 per-language stemmers (reference Lemmatize.py:140-194 dispatch)."""

from __future__ import annotations

from knowledgegraphgenerator_spark.core.stemmers import (
    chinese_char_tokenize,
    lemmatize_for_lang,
    stem_de,
    stem_es,
    stem_fr,
    stem_it,
    stem_pt,
)


def test_spanish_inflection_conflates():
    # plural/verb/derivational variants of one lemma stem together
    assert stem_es("pronunciaciones") == stem_es("pronunciación")
    assert stem_es("hablamos") == stem_es("hablar") == stem_es("habla")
    assert stem_es("rápidamente").startswith("rápid")
    assert stem_es("gatos") == stem_es("gato")


def test_french_inflection_conflates():
    assert stem_fr("prononciations") == stem_fr("prononciation")
    assert stem_fr("mangées") == stem_fr("manger") == stem_fr("mange")
    assert stem_fr("nationaux")[:6] == stem_fr("national")[:6]


def test_german_stem_and_recap():
    # capitalization restore per the reference (Lemmatize.py:155-162)
    assert stem_de("Schokoladen") == stem_de("Schokolade")
    assert stem_de("Schokoladen")[0] == "S"
    assert stem_de("laufen") == stem_de("laufe") == "lauf"
    assert stem_de("Freundlichkeit")[0] == "F"


def test_portuguese_italian():
    assert stem_pt("chocolates") == stem_pt("chocolate")
    assert stem_pt("falamos") == stem_pt("falar")
    assert stem_it("pronunciazioni")[:8] == stem_it("pronunciazione")[:8]
    assert stem_it("parlare") == stem_it("parlano")


def test_chinese_char_tokenize_reference_semantics():
    # CJK chars single tokens; latin runs whitespace-split (Lemmatize.py:111-124)
    assert chinese_char_tokenize("我吃 abc def 巧克力") == [
        "我", "吃", "abc", "def", "巧", "克", "力"
    ]
    assert chinese_char_tokenize("abc") == ["abc"]
    assert chinese_char_tokenize("") == []


def test_dispatch():
    assert lemmatize_for_lang("los gatos", "es") == ["los", stem_es("gatos")]
    assert lemmatize_for_lang("banks", "en") == ["bank"]
    assert lemmatize_for_lang("мої слова", "uk") == ["мої", "слова"]
    assert lemmatize_for_lang("我吃", "zh") == ["我", "吃"]
    # stemming is idempotent-ish on already-stemmed forms (gate sanity)
    for lang, stem in (("es", stem_es), ("fr", stem_fr), ("de", stem_de)):
        w = stem("informaciones" if lang == "es" else
                 "informations" if lang == "fr" else "Informationen")
        assert isinstance(w, str) and w
