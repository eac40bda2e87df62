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
  * ru / sv — Snowball Russian/Swedish cores (RV/R1/R2-gated suffix
    classes; Lemmatize.py:169-172);
  * nl — Snowball Dutch core + the reference's compound-word-map split
    (dutch_lemmatizer, Lemmatize.py:127-138);
  * ar — ISRI-style normalization + length-guarded affix strip
    (Lemmatize.py:164-165);
  * zh — the reference's char-split tokenizer (:111-124), verbatim
    semantics: CJK code points become single tokens, runs of non-CJK
    text are whitespace-split;
  * ko / fi / pl / uk — plain tokenization (:184-191);
  * id / ms — Nazief–Adriani confix stripping, the public algorithm
    underneath Sastrawi (:179-180); dictionary-gated like the original,
    small bundled root set + injectable dictionary (coverage is the
    disclosed divergence);
  * ja — character-class segmentation, the deterministic core of
    tinysegmenter's feature design (:181-182); same-script-internal
    boundaries need the trained weights and are the pinned-spec gap;
  * kk — the suffix-substitution semantics of the reference's (dead —
    import commented out at :16) kazlemmatizer.py, empty-dictionary
    state.

With that, all 17 reference languages have working branches.

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


# ---------------------------------------------------------------------
# ru / sv / nl / ar — the N3 long tail (VERDICT r2 'Next round' #5),
# mirroring the reference branches Lemmatize.py:169-177 (stem_ru,
# stem_sv), :127-138+167 (dutch compound map + stem_nl), :164-165
# (ISRI ar). Same policy as above: the public Snowball/ISRI algorithms
# reduced to their R-region-gated affix-removal cores.
# ---------------------------------------------------------------------

_RU_VOWELS = set("аеиоуыэюя")
# Snowball Russian suffix classes (longest-first matching inside RV).
_RU_PGERUND_1 = ("вшись", "вши", "в")          # require preceding а/я
_RU_PGERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_REFLEX = ("ся", "сь")
_RU_ADJ = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые",
           "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их",
           "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")     # require preceding а/я
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло",
              "но", "ет", "ют", "ны", "ть", "й", "л", "н")  # after а/я
_RU_VERB_2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
              "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть",
              "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят",
              "ит", "ыт", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев",
            "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
            "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
            "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")


def _ru_rv(word: str) -> int:
    """RV: position after the first vowel."""
    for i, ch in enumerate(word):
        if ch in _RU_VOWELS:
            return i + 1
    return len(word)


def _ru_strip_group(word: str, rv: int, sufs: tuple[str, ...],
                    need_a_ya: bool) -> str | None:
    for suf in sorted(sufs, key=len, reverse=True):
        if not word.endswith(suf) or len(word) - len(suf) < rv:
            continue
        if need_a_ya:
            pre = len(word) - len(suf) - 1
            if pre < 0 or word[pre] not in "ая":
                continue
        return word[: -len(suf)]
    return None


def stem_ru(word: str) -> str:
    """Snowball Russian, R-gated core: perfective gerund | (reflexive +
    adjectival/verb/noun), then и-removal, derivational ость/ост in R2,
    final ь / superlative / нн→н cleanup."""
    w = word.lower().replace("ё", "е")
    if len(w) <= 2:
        return w
    rv = _ru_rv(w)
    r1 = _r_region(w, _RU_VOWELS)
    r2 = _r_region(w, _RU_VOWELS, r1)

    out = _ru_strip_group(w, rv, _RU_PGERUND_2, False)
    if out is None:
        out = _ru_strip_group(w, rv, _RU_PGERUND_1, True)
    if out is None:
        out = w
        ref = _ru_strip_group(out, rv, _RU_REFLEX, False)
        if ref is not None:
            out = ref
        adj = _ru_strip_group(out, rv, _RU_ADJ, False)
        if adj is not None:
            out = adj
            part = _ru_strip_group(out, rv, _RU_PART_2, False)
            if part is None:
                part = _ru_strip_group(out, rv, _RU_PART_1, True)
            if part is not None:
                out = part
        else:
            verb = _ru_strip_group(out, rv, _RU_VERB_2, False)
            if verb is None:
                verb = _ru_strip_group(out, rv, _RU_VERB_1, True)
            if verb is not None:
                out = verb
            else:
                noun = _ru_strip_group(out, rv, _RU_NOUN, False)
                if noun is not None:
                    out = noun
    if out.endswith("и") and len(out) - 1 >= rv:
        out = out[:-1]
    for suf in ("ость", "ост"):
        if out.endswith(suf) and len(out) - len(suf) >= r2:
            out = out[: -len(suf)]
            break
    if out.endswith("ь") and len(out) - 1 >= rv:
        out = out[:-1]
    else:
        for suf in ("ейше", "ейш"):
            if out.endswith(suf) and len(out) - len(suf) >= rv:
                out = out[: -len(suf)]
                break
        if out.endswith("нн") and len(out) - 1 >= rv:
            out = out[:-1]
    return out


_SV_VOWELS = set("aeiouyäåö")
_SV_STEP1 = ("heterna", "hetens", "ornas", "andes", "arnas", "ernas",
             "andet", "anden", "heten", "heter", "arens", "erns",
             "aste", "arna", "erna", "orna", "ande", "arne", "aren",
             "ades", "ade", "are", "ern", "ens", "het", "ast", "ad",
             "en", "ar", "er", "or", "as", "es", "at", "a", "e")
_SV_S_ENDING = set("bcdfghjklmnoprtvy")
_SV_STEP3 = ("lig", "els", "ig")


def stem_sv(word: str) -> str:
    """Snowball Swedish: R1 (min pos 3) suffix strip, s-ending rule,
    double-consonant trim, step-3 derivational endings."""
    w = word.lower()
    if len(w) <= 3:
        return w
    r1 = max(_r_region(w, _SV_VOWELS), 3)
    out = _strip_longest(w, r1, _SV_STEP1)
    if out == w and w.endswith("s") and len(w) - 1 >= r1 \
            and len(w) >= 2 and w[-2] in _SV_S_ENDING:
        out = w[:-1]
    for pair in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if out.endswith(pair) and len(out) - 1 >= r1:
            out = out[:-1]
            break
    if out.endswith("löst"):
        out = out[:-1]
    elif out.endswith("fullt"):
        out = out[:-1]
    else:
        out = _strip_longest(out, r1, _SV_STEP3)
    return out


_NL_VOWELS = set("aeiouyè")


def _nl_undouble(w: str) -> str:
    for pair in ("kk", "dd", "tt"):
        if w.endswith(pair):
            return w[:-1]
    return w


def stem_nl(word: str) -> str:
    """Snowball Dutch core: heden→heid, en(e)/s(e) strip with valid-
    ending guards + undoubling, e-strip, heid / derivational endings in
    R2 (end/ing/ig/lijk/baar)."""
    w = word.lower()
    if len(w) <= 3:
        return w
    r1 = max(_r_region(w, _NL_VOWELS), 3)
    r2 = _r_region(w, _NL_VOWELS, _r_region(w, _NL_VOWELS))
    e_removed = False
    # step 1
    if w.endswith("heden") and len(w) - 5 >= r1:
        w = w[:-5] + "heid"
    else:
        for suf in ("ene", "en"):
            if (w.endswith(suf) and len(w) - len(suf) >= r1
                    and len(w) > len(suf)
                    and w[-len(suf) - 1] not in _NL_VOWELS
                    and not w.endswith("gem" + suf)):
                w = _nl_undouble(w[: -len(suf)])
                break
        else:
            for suf in ("se", "s"):
                if (w.endswith(suf) and len(w) - len(suf) >= r1
                        and len(w) > len(suf)
                        and w[-len(suf) - 1] not in _NL_VOWELS | {"j"}):
                    w = w[: -len(suf)]
                    break
    # step 2: drop a final e after a consonant
    if w.endswith("e") and len(w) - 1 >= r1 \
            and len(w) >= 2 and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True
    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= r2 \
            and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if (w.endswith("en") and len(w) - 2 >= r1
                and len(w) > 2 and w[-3] not in _NL_VOWELS):
            w = _nl_undouble(w[:-2])
    # step 3b: derivational
    for suf in ("end", "ing"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            if w.endswith("ig") and len(w) - 2 >= r2 \
                    and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
            break
    else:
        if w.endswith("ig") and len(w) - 2 >= r2 \
                and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
        elif w.endswith("lijk") and len(w) - 4 >= r2:
            w = w[:-4]
            if w.endswith("e") and len(w) - 1 >= r1 \
                    and len(w) >= 2 and w[-2] not in _NL_VOWELS:
                w = _nl_undouble(w[:-1])
        elif w.endswith("baar") and len(w) - 4 >= r2:
            w = w[:-4]
        elif w.endswith("bar") and len(w) - 3 >= r2 and e_removed:
            w = w[:-3]
    return w


def dutch_lemmatize(sentence: str,
                    compound_map: dict[str, str] | None = None) -> list[str]:
    """The reference's dutch_lemmatizer (Lemmatize.py:127-138): known
    compounds split on '+'/'_' via the provided map, everything else
    Snowball-stemmed."""
    from knowledgegraphgenerator_spark.core.textnorm import tokenize

    out: list[str] = []
    cmap = compound_map or {}
    for word in tokenize(sentence):
        if word in cmap:
            parts = (
                cmap[word].replace("+", "||").replace("_", "||")
                .replace(" ", "").split("||")
            )
            out.extend(p for p in parts if p)
        else:
            out.append(stem_nl(word))
    return out


_AR_DIACRITICS = set("ًٌٍَُِّْ")
_AR_PRE3 = ("كال", "بال", "ولل", "وال")
_AR_PRE2 = ("ال", "لل")
_AR_SUF3 = ("تمل", "همل", "تان", "تين", "كمل")
_AR_SUF2 = ("ون", "ات", "ان", "ين", "تن", "كم", "هن", "نا", "يا",
            "ها", "تم", "كن", "ني", "وا", "ما", "هم")


def stem_ar(word: str) -> str:
    """ISRI-style Arabic root strip, reduced to its normalization +
    length-guarded affix-removal core (the pattern-template root
    extraction of full ISRI is out of pinned-spec scope): strip
    diacritics/tatweel, normalize hamza, then 3/2-char prefixes and
    3/2/1-char suffixes while ≥3 letters remain."""
    w = "".join(ch for ch in word if ch not in _AR_DIACRITICS)
    w = w.replace("ـ", "")  # tatweel
    for h in "أإآ":
        w = w.replace(h, "ا")
    for pre in _AR_PRE3:
        if w.startswith(pre) and len(w) - 3 >= 3:
            w = w[3:]
            break
    else:
        for pre in _AR_PRE2:
            if w.startswith(pre) and len(w) - 2 >= 3:
                w = w[2:]
                break
        else:
            if w.startswith("و") and len(w) - 1 >= 3:
                w = w[1:]
    for suf in _AR_SUF3:
        if w.endswith(suf) and len(w) - 3 >= 3:
            w = w[:-3]
            break
    else:
        for suf in _AR_SUF2:
            if w.endswith(suf) and len(w) - 2 >= 3:
                w = w[:-2]
                break
        else:
            for suf in "ةهيكتان":
                if w.endswith(suf) and len(w) - 1 >= 3:
                    w = w[:-1]
                    break
    return w


# ---------------------------------------------------------------------------
# Indonesian / Malay — Nazief–Adriani confix stripping (the public
# algorithm underneath Sastrawi, which the reference calls at
# Lemmatize.py:179-180). The algorithm is dictionary-gated: affixes are
# stripped in the canonical order (inflectional particle -> possessive
# pronoun -> derivational suffix -> up to three derivational prefixes
# with nasal recoding) and the word is returned UNCHANGED unless a
# stripped candidate hits the root dictionary — exactly Sastrawi's
# contract for out-of-dictionary words. Sastrawi ships ~29k roots; we
# bundle a small default set and accept a caller-supplied one, so the
# only divergence from the reference is dictionary coverage (disclosed,
# same posture as the chunker's closed lexicon).

_ID_PARTICLES = ("lah", "kah", "tah", "pun")
_ID_POSSESSIVES = ("ku", "mu", "nya")
_ID_DERIV_SUFFIXES = ("kan", "an", "i")

_ID_DEFAULT_ROOTS = frozenset("""
ajar makan minum beli baca tulis main kerja jalan lari duduk tidur
besar kecil baik buruk cepat lambat baru lama tinggi rendah
guru murid sekolah buku rumah meja kursi pintu jalan kota desa
hasil ubah temu bantu milik guna turun naik masuk keluar datang pergi
kata bicara dengar lihat tahu kenal ingat lupa pikir rasa
satu dua tiga empat lima enam tujuh delapan sembilan sepuluh
nyanyi sapu tari tanam tanya jawab kirim terima bayar jual
""".split())


def _id_prefix_candidates(w: str) -> list[str]:
    """One round of derivational-prefix removal: every candidate the
    standard recoding table allows for ``w``, most-specific first."""
    out: list[str] = []
    if len(w) <= 3:
        return out
    if w.startswith(("di", "ke", "se")):
        out.append(w[2:])
        return out
    for p, recodes in (("meng", ("", "k")), ("peng", ("", "k")),
                       ("meny", ("s",)), ("peny", ("s",)),
                       ("mem", ("", "p", "m")), ("pem", ("", "p", "m")),
                       ("men", ("", "t", "n")), ("pen", ("", "t", "n")),
                       ("me", ("",)), ("ber", ("",)), ("bel", ("",)),
                       ("be", ("",)), ("ter", ("",)), ("tel", ("",)),
                       ("te", ("",)), ("per", ("",)), ("pel", ("",)),
                       ("pe", ("",))):
        if w.startswith(p):
            rest = w[len(p):]
            for r in recodes:
                if len(r + rest) >= 2:
                    out.append(r + rest)
            break
    return out


def stem_id(word: str, roots: frozenset[str] | None = None) -> str:
    """Nazief–Adriani confix strip of one lowercase token; returns the
    first dictionary root reached, else the original word."""
    roots = _ID_DEFAULT_ROOTS if roots is None else roots
    w = word.lower()
    if w in roots:
        return w
    stage = [w]
    for sufs in (_ID_PARTICLES, _ID_POSSESSIVES, _ID_DERIV_SUFFIXES):
        cur = stage[-1]
        for suf in sufs:
            if cur.endswith(suf) and len(cur) - len(suf) >= 2:
                cand = cur[: -len(suf)]
                if cand in roots:
                    return cand
                stage.append(cand)
                break
    # prefix rounds over every suffix-stripped stage (the algorithm's
    # confix property: prefixes may combine with any suffix state)
    for base in reversed(stage):
        frontier = [base]
        for _ in range(3):
            nxt: list[str] = []
            for f in frontier:
                for cand in _id_prefix_candidates(f):
                    if cand in roots:
                        return cand
                    nxt.append(cand)
            frontier = nxt
            if not frontier:
                break
    return word.lower()


def indonesian_stem(sentence: str,
                    roots: frozenset[str] | None = None) -> list[str]:
    """Sentence-level id/ms branch (Lemmatize.py:179-180):
    ``sastrawi_stemmer.stem(sentence).split(" ")`` == per-token stems."""
    from knowledgegraphgenerator_spark.core.textnorm import tokenize

    return [stem_id(t, roots) for t in tokenize(sentence)]


# ---------------------------------------------------------------------------
# Japanese — character-class segmentation. The reference tokenizes with
# tinysegmenter (Lemmatize.py:181-182), a compact classifier whose
# features are character-class n-grams (kanji/hiragana/katakana/latin/
# digit) with trained weights. The trained weight table is a model
# artifact we cannot re-derive, so this is the disclosed deterministic
# core of the same idea: token boundaries at script-class transitions
# (katakana runs keep the long-vowel mark; CJK punctuation splits).
# TinySegmenter additionally splits inside same-script runs (e.g. a
# hiragana particle off a verb); those boundaries need the trained
# weights and are the pinned-spec gap here.

def _ja_char_class(ch: str) -> str:
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FFF or ch in "々〆ヵヶ":
        return "H"  # kanji
    if 0x3040 <= o <= 0x309F:
        return "I"  # hiragana
    if 0x30A0 <= o <= 0x30FF or ch == "ー":
        return "K"  # katakana
    if ch.isascii() and ch.isalpha() or 0xFF21 <= o <= 0xFF5A:
        return "A"  # latin (incl. full-width)
    if ch.isdigit() or 0xFF10 <= o <= 0xFF19:
        return "N"
    if ch.isspace():
        return "S"
    return "O"  # punctuation / other


def japanese_segment(sentence: str) -> list[str]:
    """Segment on character-class transitions; whitespace delimits and
    is dropped, each O-class (punctuation) char is its own token."""
    tokens: list[str] = []
    cur = ""
    cur_cls = ""
    for ch in sentence:
        cls = _ja_char_class(ch)
        if cls == "S":
            if cur:
                tokens.append(cur)
            cur, cur_cls = "", ""
            continue
        if cls == "O":
            if cur:
                tokens.append(cur)
            tokens.append(ch)
            cur, cur_cls = "", ""
            continue
        if cls != cur_cls and cur:
            tokens.append(cur)
            cur = ""
        cur, cur_cls = cur + ch, cls
    if cur:
        tokens.append(cur)
    return tokens


# ---------------------------------------------------------------------------
# Kazakh — suffix-substitution lemmatizer. The reference ships
# kazlemmatizer.py (kazakh_lemma_tokenizer) but its import is commented
# out at Lemmatize.py:16, so the kk branch is dead code upstream; we
# implement the file's specified semantics anyway. With its root
# dictionary empty (the shipped state: the kaz.txt loads are commented
# out, kazlemmatizer.py:7-10), generate-candidates-then-filter reduces
# to: the FIRST matching suffix substitution — scanning the rule groups
# in order (case, possessive, possessive-exception, number;
# kazlemmatizer.py:12-67, the personal group is defined but not in
# NOUN_SUBSTITUTION_RULES) and each group's suffix list in order —
# applied to the original token, else the token unchanged. The suffix
# tables are Kazakh case/possessive/plural morphology data (vowel-
# harmony variants), reproduced as data the same way the stop sets are.
# The reference would also return a nested list per token
# (tokens.append of a list); we flatten to this engine's list[str]
# token contract.

_KK_SUBSTITUTIONS: tuple[tuple[str, str], ...] = (
    # case: ablative, locative, locative-adjectival, dative, genitive,
    # accusative, instrumental
    ("дан", ""), ("ден", ""), ("тан", ""), ("тен", ""), ("нан", ""),
    ("нен", ""),
    ("да", ""), ("де", ""), ("та", ""), ("те", ""), ("нда", ""),
    ("нде", ""),
    ("дағы", ""), ("дегі", ""), ("тағы", ""), ("тегі", ""),
    ("ндағы", ""), ("ндегі", ""),
    ("ға", ""), ("ге", ""), ("қа", ""), ("ке", ""), ("на", ""),
    ("не", ""),
    ("а", ""), ("е", ""),
    ("дың", ""), ("дің", ""), ("тың", ""), ("тің", ""), ("ның", ""),
    ("нің", ""),
    ("дікі", ""), ("тікі", ""), ("нікі", ""),
    ("ды", ""), ("ді", ""), ("ты", ""), ("ті", ""), ("ны", ""),
    ("ні", ""), ("н", ""),
    ("бен", ""), ("пен", ""), ("мен", ""),
    # possessive (1sg/1pl/2fam/2form/3 with consonant-restoring variants)
    ("м", ""), ("ым", ""), ("ім", ""),
    ("бым", "п"), ("ғым", "қ"), ("гым", "к"), ("бім", "п"), ("гім", "к"),
    ("мыз", ""), ("ымыз", ""), ("міз", ""), ("іміз", ""),
    ("бымыз", "п"), ("ғымыз", "қ"), ("гымыз", "к"), ("біміз", "п"),
    ("гіміз", "к"),
    ("ң", ""), ("ың", ""), ("ің", ""),
    ("бың", "п"), ("ғың", "қ"), ("гың", "к"), ("бің", "п"), ("гің", "к"),
    ("ңыз", ""), ("ыңыз", ""), ("ңіз", ""), ("іңіз", ""),
    ("быңыз", "п"), ("ғыңыз", "қ"), ("гыңыз", "к"), ("біңіз", "п"),
    ("гіңіз", "к"),
    ("ы", ""), ("сы", ""), ("і", ""), ("сі", ""),
    ("бы", "п"), ("ғы", "қ"), ("гы", "к"), ("бі", "п"), ("гі", "к"),
    # possessive vowel-drop exceptions
    ("орн", "орын"), ("қарн", "қарын"), ("көрк", "көрік"),
    ("ерк", "ерік"), ("әрп", "әріп"),
    # number (plural)
    ("дар", ""), ("дер", ""), ("тар", ""), ("тер", ""), ("лар", ""),
    ("лер", ""),
)


def kk_lemma(word: str) -> str:
    """First-matching suffix substitution over the ordered table."""
    for old, new in _KK_SUBSTITUTIONS:
        if word.endswith(old) and len(word) > len(old):
            return word[: -len(old)] + new
    return word


def kazakh_lemma_tokenize(sentence: str) -> list[str]:
    from knowledgegraphgenerator_spark.core.textnorm import tokenize

    return [kk_lemma(t) for t in tokenize(sentence)]


def lemmatize_for_lang(sentence: str, lang: str) -> list[str]:
    """N3 dispatch (Lemmatize.py:140-194): language -> token lemmas.
    en falls through to the WordNet-style noun lemmatizer; unknown
    languages tokenize only (the reference's ko/fi/pl/uk branches)."""
    from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma
    from knowledgegraphgenerator_spark.core.textnorm import tokenize

    if lang in ("zh", "zh_cn", "zh_tw", "chinese"):
        return chinese_char_tokenize(sentence)
    if lang in ("nl", "dutch"):
        return dutch_lemmatize(sentence)
    if lang in ("id", "bhasa", "ms", "malay", "indonesian"):
        return indonesian_stem(sentence)
    if lang in ("ja", "japanese"):
        return japanese_segment(sentence)
    if lang in ("kk", "kazakh"):
        return kazakh_lemma_tokenize(sentence)
    stem = {
        "es": stem_es, "spanish": stem_es,
        "fr": stem_fr, "french": stem_fr,
        "de": stem_de, "german": stem_de,
        "pt": stem_pt, "portugese brazalian": stem_pt,
        "it": stem_it, "italian": stem_it,
        "ru": stem_ru, "russian": stem_ru,
        "sv": stem_sv, "swedish": stem_sv,
        "ar": stem_ar, "arabic": stem_ar,
    }.get(lang)
    if stem is not None:
        return [stem(t) for t in tokenize(sentence)]
    if lang in ("en", "english"):
        return [noun_lemma(t) for t in tokenize(sentence)]
    return tokenize(sentence)
