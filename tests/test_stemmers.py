"""N3 per-language stemmers (reference Lemmatize.py:140-194 dispatch)."""

from __future__ import annotations

from knowledgegraphgenerator_spark.core.stemmers import (
    chinese_char_tokenize,
    dutch_lemmatize,
    lemmatize_for_lang,
    stem_ar,
    stem_de,
    stem_es,
    stem_fr,
    stem_it,
    stem_nl,
    stem_pt,
    stem_ru,
    stem_sv,
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


def test_russian_inflection_conflates():
    # noun case endings, adjective endings, verb forms (Lemmatize.py:169-170)
    assert stem_ru("книгами") == stem_ru("книга") == stem_ru("книги") == "книг"
    assert stem_ru("красивые") == stem_ru("красивый") == "красив"
    assert stem_ru("делать") == stem_ru("делала") == stem_ru("делавшись")
    assert stem_ru("говорить") == stem_ru("говорила") == "говор"
    assert stem_ru("организациями") == stem_ru("организация")


def test_swedish_inflection_conflates():
    # definite/plural endings + derivational els (Lemmatize.py:171-172)
    assert stem_sv("flickorna") == stem_sv("flicka") == "flick"
    assert stem_sv("betydelsen") == stem_sv("betydelse") == "betyd"
    assert stem_sv("hoppade") == stem_sv("hoppar") == "hopp"
    assert stem_sv("läsningen") == stem_sv("läsning")


def test_dutch_stem_and_compound_map():
    # heden→heid, en-strip, lijk-strip (Lemmatize.py:127-138, 167)
    assert stem_nl("snelheden") == stem_nl("snelheid") == "snelheid"
    assert stem_nl("lichamen") == stem_nl("lichamelijk") == "licham"
    assert stem_nl("appels") == stem_nl("appel") == "appel"
    # known compounds split on +/_ via the map, as in dutch_lemmatizer
    assert dutch_lemmatize("appelboom is mooi",
                           {"appelboom": "appel+boom"}) == [
        "appel", "boom", "is", "mooi"
    ]


def test_arabic_affix_strip_conflates():
    # definite article + possessive strip (Lemmatize.py:164-165, ISRI)
    assert stem_ar("المدرسة") == stem_ar("مدرسة") == "مدرس"
    assert stem_ar("والكتاب") == stem_ar("الكتاب") == stem_ar("كتابهم")
    assert stem_ar("مكتبات") == "مكتب"


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
