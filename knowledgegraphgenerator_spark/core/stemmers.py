"""Per-language stemmers for the N3 language dispatch (SURVEY.md §2.3).

The reference dispatches 17 languages in ``lemmatize_old``
(/root/reference/analyzer/kg_export/language/Lemmatize.py:140-194):
Snowball stemmers for fr/de/pt/ru/sv/ar/nl, pattern lemmas for es/it,
char-split for zh, plain tokenization for ko/fi/pl/uk. Round 1 shipped
only the language GATE; this module adds working stemmers for the
highest-traffic languages behind it:

  * es / fr / de / pt / it — Snowball-style suffix strippers (the public
    Snowball algorithms, simplified to the R1/R2-gated suffix-removal
    core that covers regular inflection; the full algorithms' minority
    steps — accent-aware respelling, verb-class tables — are out of the
    pinned-spec scope, like the chunker's closed lexicon);
  * de additionally restores the original capitalization the way the
    reference does (Lemmatize.py:155-162);
  * zh — the reference's char-split tokenizer (:111-124), verbatim
    semantics: CJK code points become single tokens, runs of non-CJK
    text are whitespace-split;
  * ko / fi / pl / uk — plain tokenization (:184-191).

Everything is pure Python shipped to executors inside Arrow UDF closures;
no model files, no per-row JVM crossings.
"""

from __future__ import annotations

_VOWELS = {
    "es": set("aeiouáéíóúü"),
    "fr": set("aeiouyâàëéêèïîôûù"),
    "de": set("aeiouyäöü"),
    "pt": set("aeiouáéíóúâêôàãõ"),
    "it": set("aeiouàèìòù"),
}


def _r_region(word: str, vowels: set[str], start: int = 0) -> int:
    """Snowball R-region: position after the first non-vowel following a
    vowel, at or after ``start``; len(word) if none."""
    i = start
    n = len(word)
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    return min(i + 1, n) if i < n else n


def _strip_longest(word: str, region_pos: int,
                   suffixes: tuple[str, ...]) -> str:
    """Remove the longest matching suffix that lies entirely inside the
    region starting at ``region_pos``."""
    for suf in sorted(suffixes, key=len, reverse=True):
        if word.endswith(suf) and len(word) - len(suf) >= region_pos:
            return word[: -len(suf)]
    return word


# Suffix groups: the regular inflectional/derivational cores of the
# public Snowball algorithms (r2-gated derivational endings, r1-gated
# verb/plural endings). Ordered longest-first by _strip_longest.
_ES_R2 = ("amientos", "imientos", "amiento", "imiento", "aciones",
          "uciones", "logías", "idades", "encias", "anzas", "ismos",
          "ables", "ibles", "istas", "ación", "ución", "logía", "encia",
          "anza", "idad", "ismo", "able", "ible", "ista", "oso", "osa",
          "osos", "osas", "ador", "adora", "adores", "adoras", "ante",
          "antes", "ancia", "ancias", "mente")
_ES_VERB = ("aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
            "aremos", "eremos", "iremos", "áramos", "ásemos", "arían",
            "erían", "irían", "arías", "erías", "irías", "ieran",
            "iesen", "ieron", "iendo", "ando", "arán", "erán", "irán",
            "arás", "erás", "irás", "aría", "ería", "iría", "iera",
            "iese", "aste", "iste", "aban", "aran", "asen", "aron",
            "ados", "idos", "amos", "imos", "emos", "ará", "aré",
            "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ado",
            "ido", "ase", "ara", "án", "ar", "er", "ir", "as", "es",
            "en", "an")
_ES_RESID = ("os", "a", "o", "á", "í", "ó", "e", "é")

_FR_R2 = ("issements", "issement", "atrices", "atrice", "ateurs",
          "ations", "logies", "usions", "utions", "ements", "amment",
          "emment", "ances", "iqUes", "ables", "istes", "ateur",
          "ation", "logie", "usion", "ution", "ences", "ement",
          "euses", "ance", "ique", "able", "iste", "ence", "euse",
          "ités", "ité", "ments", "ment")
_FR_VERB = ("eraient", "assions", "assiez", "assent", "èrent",
            "erons", "eront", "erais", "erait", "eriez", "erions",
            "aient", "antes", "asses", "erai", "eras", "erez",
            "âmes", "âtes", "ants", "ante", "ant", "ait", "ais",
            "iez", "ons", "ont", "ent", "ées", "és", "ée", "er",
            "ez", "az", "é", "a", "as", "ai", "ions", "ie", "ies",
            "ir", "is", "it", "issant", "issante", "i")
_FR_RESID = ("s", "e")

_DE_STEP1 = ("ern", "em", "er", "en", "es", "e", "s")
_DE_STEP2 = ("est", "en", "er", "st")
_DE_R2 = ("isch", "lich", "heit", "keit", "ung", "ig", "ik")

_PT_R2 = ("amentos", "imentos", "adoras", "adores", "amento",
          "imento", "adora", "ações", "ismos", "istas", "adore",
          "ância", "ação", "ezas", "icos", "icas", "ismo", "ável",
          "ível", "ista", "osos", "osas", "ador", "eza", "ico",
          "ica", "oso", "osa", "mente", "idade", "idades")
_PT_VERB = ("aríamos", "eríamos", "iríamos", "ássemos", "êssemos",
            "íssemos", "aremos", "eremos", "iremos", "ariam",
            "eriam", "iriam", "assem", "essem", "issem", "arama",
            "aram", "eram", "iram", "avam", "arem", "erem", "irem",
            "ando", "endo", "indo", "adas", "idas", "ados", "idos",
            "amos", "emos", "imos", "ará", "arão", "erão", "irão",
            "ava", "ada", "ida", "ado", "ido", "am", "em", "ar",
            "er", "ir", "as", "es", "is", "eu", "iu", "ou")
_PT_RESID = ("os", "a", "i", "o", "á", "í", "ó", "e")

_IT_R2 = ("azioni", "amenti", "imenti", "amento", "imento", "azione",
          "logie", "logia", "ismi", "ismo", "isti", "ista", "ibili",
          "abili", "ibile", "abile", "mente", "itá", "ità", "oso",
          "osa", "osi", "ose", "atore", "atori")
_IT_VERB = ("erebbero", "irebbero", "eremmo", "iremmo", "eranno",
            "iranno", "assero", "essero", "issero", "avamo", "evamo",
            "ivamo", "avano", "evano", "ivano", "ando", "endo",
            "ammo", "emmo", "immo", "erà", "irà", "ava", "eva",
            "iva", "ata", "ate", "ati", "ato", "ita", "ite", "iti",
            "ito", "are", "ere", "ire", "ano", "ono", "iamo", "ete",
            "ete", "ano", "erò", "irò", "ai", "ei", "ii", "ò", "ò")
_IT_RESID = ("i", "e", "a", "o")


def _stem_three_step(word: str, lang: str, deriv: tuple[str, ...],
                     verb: tuple[str, ...],
                     resid: tuple[str, ...]) -> str:
    vowels = _VOWELS[lang]
    w = word.lower()
    if len(w) <= 3:
        return w
    r1 = _r_region(w, vowels)
    r2 = _r_region(w, vowels, r1)
    out = _strip_longest(w, r2, deriv)
    if out == w:
        out = _strip_longest(w, r1, verb)
    if out == w:
        out = _strip_longest(w, r1, resid)
    return out


def stem_es(word: str) -> str:
    return _stem_three_step(word, "es", _ES_R2, _ES_VERB, _ES_RESID)


def stem_fr(word: str) -> str:
    return _stem_three_step(word, "fr", _FR_R2, _FR_VERB, _FR_RESID)


def stem_pt(word: str) -> str:
    return _stem_three_step(word, "pt", _PT_R2, _PT_VERB, _PT_RESID)


def stem_it(word: str) -> str:
    return _stem_three_step(word, "it", _IT_R2, _IT_VERB, _IT_RESID)


def stem_de(word: str) -> str:
    """German: two inflectional steps + derivational endings in R2, then
    the reference's capitalization restore (Lemmatize.py:155-162)."""
    w = word.lower()
    if len(w) <= 3:
        return _recap(word, w)
    vowels = _VOWELS["de"]
    r1 = _r_region(w, vowels)
    r1 = max(r1, 3)  # Snowball German: R1 starts no earlier than pos 3
    out = _strip_longest(w, r1, _DE_STEP1)
    out2 = _strip_longest(out, r1, _DE_STEP2)
    r2 = _r_region(w, vowels, _r_region(w, vowels))
    out3 = _strip_longest(out2, r2, _DE_R2)
    return _recap(word, out3)


def _recap(original: str, stemmed: str) -> str:
    """Restore a leading capital the way the reference does for German
    nouns (Lemmatize.py:156-162)."""
    if original and original[0].isupper() and stemmed:
        return stemmed[0].upper() + stemmed[1:]
    return stemmed


def chinese_char_tokenize(sentence: str) -> list[str]:
    """Verbatim semantics of the reference's chinese_tokenize
    (Lemmatize.py:111-124): CJK code points ('\\u4e00'..'\\u9fff',
    exclusive bounds as in the reference) become single tokens; runs of
    other text are whitespace-split."""
    tokens: list[str] = []
    temp = ""
    for ch in sentence:
        if "一" < ch < "鿿":
            if temp != "":
                tokens.extend(temp.strip().split(" "))
                temp = ""
            tokens.append(ch)
        else:
            temp += ch
    if temp != "":
        tokens.extend(temp.strip().split(" "))
    return [t for t in tokens if t != ""]


def lemmatize_for_lang(sentence: str, lang: str) -> list[str]:
    """N3 dispatch (Lemmatize.py:140-194): language -> token lemmas.
    en falls through to the WordNet-style noun lemmatizer; unknown
    languages tokenize only (the reference's ko/fi/pl/uk branches)."""
    from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma
    from knowledgegraphgenerator_spark.core.textnorm import tokenize

    if lang in ("zh", "zh_cn", "zh_tw", "chinese"):
        return chinese_char_tokenize(sentence)
    stem = {
        "es": stem_es, "spanish": stem_es,
        "fr": stem_fr, "french": stem_fr,
        "de": stem_de, "german": stem_de,
        "pt": stem_pt, "portugese brazalian": stem_pt,
        "it": stem_it, "italian": stem_it,
    }.get(lang)
    if stem is not None:
        return [stem(t) for t in tokenize(sentence)]
    if lang in ("en", "english"):
        return [noun_lemma(t) for t in tokenize(sentence)]
    return tokenize(sentence)
