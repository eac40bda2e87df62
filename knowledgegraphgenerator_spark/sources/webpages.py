"""Deterministic synthetic web_pages corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    web_pages(url string, warc_ts timestamp, html binary, text string,
              lang string)

Generation is pure SQL over ``spark.range(n)`` — no Python RNG, no UDFs —
so the corpus is a deterministic function of (doc_id, seed) at ANY
parallelism and any scale: doc i is identical whether generated on 1 core
or 1000 executors. Multiplicative-hash arithmetic picks a question
template and fills noun-phrase/verb slots from fixed pools sized so that
phrase counts cross the reference thresholds (>2 phrases, >5 unigrams) at
a few hundred documents.

``html`` wraps the text in constant boilerplate (nav/footer/script) so the
extract_text stage has real work; the byte-identical-per-url invariant is
asserted over extract→normalize in tests/test_webpages.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NOUN_PHRASES = [
    "neft service", "credit card", "account balance", "fund transfer",
    "mobile app", "savings account", "debit card", "internet banking",
    "account statement", "exchange rate", "wire transfer", "branch office",
    "interest rate", "transaction fee", "billing cycle", "customer support",
    "payment gateway", "routing number", "overdraft limit", "cash deposit",
    "atm network", "security question", "login password", "monthly statement",
]

VERBS = [
    "check", "transfer", "update", "cancel", "activate", "block",
    "register", "download", "apply", "close", "open", "verify",
]

TEMPLATES = [
    "How do I {v} my {np1} using the {np2}?",
    "What happens when I {v} a {np1} after the {np2} is closed?",
    "Can I {v} the {np1} and the {np2} on the same day?",
    "Why can't I {v} my {np1} through {np2}?",
    "What's the fee to {v} a {np1} with a {np2}?",
    "Is it possible to {v} my {np1} without a {np2}?",
    "When should I {v} the {np1} linked to my {np2}?",
    "How long does it take to {v} a {np1} from the {np2}?",
]

_HTML_PREFIX = (
    "<html><head><title>FAQ</title><script>var x=1;</script>"
    "<style>body{font:serif}</style></head><body>"
    "<nav><ul><li>Home</li><li>Products</li></ul></nav>"
    "<div class=\"content\"><h1>Question</h1><p>"
)
_HTML_SUFFIX = (
    "</p></div><footer>&copy; 2026 Example Bank</footer></body></html>"
)


def _pick(pool: list[str], expr: str) -> F.Column:
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, (F.expr(expr) % len(pool) + 1).cast("int"))


def synthetic_web_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    lang: str = "en",
    n_partitions: int | None = None,
    sentences_per_doc: int = 1,
) -> DataFrame:
    base = spark.range(0, n_docs, 1, n_partitions or spark.sparkContext.defaultParallelism)
    sentence_cols = []
    for s in range(sentences_per_doc):
        # splitmix-style mixes; all mod-arithmetic on non-negative longs;
        # each sentence slot gets an independent stream
        h = f"(id * 2654435761 + {seed * 97 + 13 + s * 7919})"
        base = (
            base.withColumn(f"np1_{s}", _pick(NOUN_PHRASES, f"pmod({h}, 1000000007)"))
            .withColumn(f"np2_{s}", _pick(NOUN_PHRASES, f"pmod({h} * 31 + 7, 999999937)"))
            .withColumn(f"v_{s}", _pick(VERBS, f"pmod({h} * 17 + 3, 982451653)"))
            .withColumn(f"tmpl_idx_{s}",
                        F.expr(f"pmod({h} * 13 + 11, {len(TEMPLATES)})").cast("int"))
        )
        text = F.lit(None).cast("string")
        for i, tmpl in enumerate(TEMPLATES):
            text = F.when(
                F.col(f"tmpl_idx_{s}") == i, _fill_template(tmpl, s)
            ).otherwise(text)
        sentence_cols.append(text)
    df = base.withColumn("text", F.concat_ws(" ", *sentence_cols))
    return df.select(
        F.concat(F.lit(f"https://fixture.test/{lang}/"), F.col("id")).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        F.encode(
            F.concat(F.lit(_HTML_PREFIX), F.col("text"), F.lit(_HTML_SUFFIX)),
            "utf-8",
        ).alias("html"),
        "text",
        F.lit(lang).alias("lang"),
        F.col("id").alias("doc_id"),
    )


def _fill_template(tmpl: str, s: int = 0) -> F.Column:
    """Template string -> concat Column substituting {v}/{np1}/{np2}."""
    import re as _re

    pieces: list[F.Column] = []
    pos = 0
    for m in _re.finditer(r"\{(v|np1|np2)\}", tmpl):
        if m.start() > pos:
            pieces.append(F.lit(tmpl[pos:m.start()]))
        pieces.append(F.col(f"{m.group(1)}_{s}"))
        pos = m.end()
    if pos < len(tmpl):
        pieces.append(F.lit(tmpl[pos:]))
    return F.concat(*pieces)
