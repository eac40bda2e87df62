"""Stop-word sources (S8/S9 in SURVEY.md §2.1).

The reference ships per-language static stop sets as class attributes
(/root/reference/StopWords.py:5-331) and, for ``en``, unions a question-word
set (StopWords.py:344-347). Input-provided stop words override the built-in
set entirely (/root/reference/request_type/JSONExportParser.py:36-50).

``ENGLISH_STOP_WORDS`` / ``ENGLISH_QUESTION_WORDS`` reproduce the
reference's ``en`` and ``english_question_words`` sets VERBATIM — they are
plain data with no dependency constraint, and stop filtering feeds
unigrams/phrases/verb tags/single-word fallback tags, so default-config
outputs must not diverge from upstream (tests/test_stopwords_parity.py
asserts set equality against the reference file when it is present). The
previously-shipped NLTK-style list is kept as an opt-in
(``ENGLISH_STOP_WORDS_NLTK``) for corpora tuned to it.

At scale these are driver-side frozensets shipped to executors via
closure/broadcast (a few KB); never a join side.
"""

from __future__ import annotations

# Verbatim reference data: /root/reference/StopWords.py:5-29 (class attr
# ``en``). 242 words, includes content-ish words ('help', 'go', 'take',
# 'keep', 'give', 'move', 'found', 'done', 'part', 'top', 'fire', ...) —
# the reference's Glasgow-IDF-style list, NOT the NLTK list.
ENGLISH_STOP_WORDS: frozenset[str] = frozenset("""
a about above across after afterwards again against all almost alone
along already also although always among amongst amoungst an and another
any anyhow anyone anything anyway are around as at be became because
become becomes becoming been before beforehand being below beside
besides between beyond both but by can co con could couldnt de do done
down each eg either else elsewhere empty enough etc even ever every
everyone everything everywhere except few fire for found from full
further give go had has hasnt have he help hence her here hereafter
hereby herein hereupon hers herself him himself his however i ie if in
inc indeed into it its itself keep latter latterly ltd may meanwhile
might mine more moreover most mostly move must my myself namely neither
nevertheless next nobody now nowhere of off often on once only onto or
other others otherwise our ours ourselves out over part per perhaps
please put rather re same see seem seemed seeming seems several shall
she since sincere so some somehow someone something sometime sometimes
somewhere still such take than that the their them themselves then
thence there thereafter thereby therefore therein thereupon these they
this those though through throughout thru thus to too top toward towards
under until up upon us very via we well were what whatever whenever
whereafter whereas whereby wherein whereupon wherever whether while
whither whoever whole whose will with without would yet you your yours
yourself yourselves
""".split())

# Verbatim reference data: /root/reference/StopWords.py:31-32
# (``english_question_words``). Unioned into the en set at
# StopWords.py:344-347 and into input-provided en sets (# NLP-7736,
# JSONExportParser.py:40-41).
ENGLISH_QUESTION_WORDS: frozenset[str] = frozenset("""
describe detail during how i is many me much my should was when where
which who whom why will within
""".split())

# Opt-in alternative: the classic NLTK-style list shipped in round 1.
# NOT used by default — kept for corpora whose dictionaries were tuned
# against it (pass ``stop_words=sorted(ENGLISH_STOP_WORDS_NLTK)``).
ENGLISH_STOP_WORDS_NLTK: frozenset[str] = frozenset("""
a about above after again against all am an and any are aren as at be
because been before being below between both but by can cannot could
couldn d did didn do does doesn doing don down during each few for from
further had hadn has hasn have haven having he her here hers herself him
himself his how i if in into is isn it its itself just ll m ma me mightn
more most mustn my myself needn no nor not now o of off on once only or
other our ours ourselves out over own re s same shan she should shouldn so
some such t than that the their theirs them themselves then there these
they this those through to too under until up ve very was wasn we were
weren what when where which while who whom why will with won wouldn y you
your yours yourself yourselves
""".split())

# Small function-word seeds for the non-en languages the reference lists
# (its README scopes generation to en; these gate the lang dispatch only —
# the reference's full per-language sets live at StopWords.py:34-331).
_NON_EN: dict[str, frozenset[str]] = {
    "es": frozenset({"el", "la", "los", "las", "de", "que", "y", "en", "un",
                     "una", "es", "por", "con", "para", "no", "se", "su"}),
    "fr": frozenset({"le", "la", "les", "de", "des", "et", "en", "un",
                     "une", "est", "que", "pour", "dans", "ne", "pas", "au"}),
    "de": frozenset({"der", "die", "das", "und", "in", "den", "von", "zu",
                     "mit", "ist", "des", "ein", "eine", "nicht", "auf"}),
    "nl": frozenset({"de", "het", "een", "en", "van", "in", "is", "dat",
                     "op", "te", "niet", "met", "voor", "zijn"}),
    "it": frozenset({"il", "la", "le", "di", "che", "e", "in", "un", "una",
                     "per", "non", "con", "sono", "del"}),
    "pt": frozenset({"o", "a", "os", "as", "de", "que", "e", "em", "um",
                     "uma", "para", "com", "nao", "por", "do", "da"}),
}

# Language alias normalization (reference: StopWords.get_stop_words,
# /root/reference/StopWords.py:334-343).
_LANG_ALIASES: dict[str, str] = {
    "zh": "zh_tw", "zh_cn": "zh_tw",
    "japanese": "ja",
    "ms": "bahasa", "id": "bahasa",
}


def get_stop_words(lang: str = "en") -> frozenset[str]:
    """Built-in stop set for ``lang``; en unions question words
    (reference: StopWords.get_stop_words, /root/reference/StopWords.py:334-351).
    Unknown languages return the empty set (reference raises AttributeError
    for unlisted langs; empty set is the graceful web-corpus behavior)."""
    lang = _LANG_ALIASES.get(lang, lang)
    if lang == "en":
        return ENGLISH_STOP_WORDS | ENGLISH_QUESTION_WORDS
    return _NON_EN.get(lang, frozenset())


def resolve_stop_words(lang: str = "en",
                       provided: list[str] | None = None) -> frozenset[str]:
    """Input-provided stop words replace the built-ins; for en the question
    words are still unioned in (reference `# NLP-7736`,
    /root/reference/request_type/JSONExportParser.py:36-50)."""
    if provided is not None:
        base = frozenset(w.lower() for w in provided)
        if lang == "en":
            return base | ENGLISH_QUESTION_WORDS
        return base
    return get_stop_words(lang)
