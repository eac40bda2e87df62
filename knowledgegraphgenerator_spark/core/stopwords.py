"""Stop-word sources (S8/S9 in SURVEY.md §2.1).

The reference ships per-language static stop sets as class attributes
(/root/reference/StopWords.py:5-331) and, for ``en``, unions a question-word
set (StopWords.py:344-347). Input-provided stop words override the built-in
set entirely (/root/reference/request_type/JSONExportParser.py:36-50).

The word lists here are standard public English stop words (the classic
NLTK-style list) plus English question words; they are data, not code, and
are kept deliberately compact. Non-``en`` languages get small function-word
seed sets — the README scopes the pipeline to English
(/root/reference/README.md:113-126) and the ``lang`` column gates the rest.

At scale these are driver-side frozensets shipped to executors via
closure/broadcast (a few KB); never a join side.
"""

from __future__ import annotations

ENGLISH_STOP_WORDS: frozenset[str] = frozenset("""
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

ENGLISH_QUESTION_WORDS: frozenset[str] = frozenset(
    {"what", "which", "who", "whom", "whose", "why", "when", "where", "how",
     "is", "are", "am", "was", "were", "do", "does", "did", "can", "could",
     "shall", "should", "will", "would", "may", "might", "must", "have",
     "has", "had"}
)

# Small function-word seeds for the non-en languages the reference lists
# (its README scopes generation to en; these gate the lang dispatch only).
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


def get_stop_words(lang: str = "en") -> frozenset[str]:
    """Built-in stop set for ``lang``; en unions question words
    (reference: StopWords.get_stop_words, /root/reference/StopWords.py:334-351).
    Unknown languages return the empty set (reference returns [] →
    effectively empty)."""
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
