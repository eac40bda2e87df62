"""FAQ input parsers S3-S7, S9-S10 (SURVEY.md §2.1).

Each parser normalizes one reference input format to the canonical FAQ
DataFrame:

    faq(ques_id long, question string, norm_question string,
        answer array<struct<text,type,channel:string>>,
        sub_answers array<array<struct<text,type,channel:string>>>,
        response_type string, is_primary boolean, primary_id long)

plus driver-side (stop_words, synonyms) config. Ids are 10001.. in file
order with alternates interleaved after their primary, exactly
reproducing the itertools.count order of the reference
(/root/reference/request_type/CSVParser.py:40,
JSONExportParser.py:57-74, CSVExportParser.py:51-69).

DESIGN NOTE (Spark-first, deliberately): FAQ exports are CONFIG-sized
documents (one JSON/CSV file with ordered rows whose order is semantic),
not corpora — they are parsed on the driver with stdlib csv/json and
handed to Spark as a small DataFrame. The 100 TB path is the web_pages
corpus (sources/webpages.py + pipeline.py); conflating a config parser
with a corpus scan would force a meaningless file-order shuffle contract
onto the distributed reader.
"""

from __future__ import annotations

import csv
import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from knowledgegraphgenerator_spark.core.stopwords import (
    ENGLISH_QUESTION_WORDS,
    get_stop_words,
)
from knowledgegraphgenerator_spark.core.textnorm import normalize_text

_ANSWER = StructType(
    [
        StructField("text", StringType()),
        StructField("type", StringType()),
        StructField("channel", StringType()),
    ]
)

FAQ_SCHEMA = StructType(
    [
        StructField("ques_id", LongType(), False),
        StructField("question", StringType()),
        StructField("norm_question", StringType()),
        StructField("answer", ArrayType(_ANSWER)),
        StructField("sub_answers", ArrayType(ArrayType(_ANSWER))),
        StructField("response_type", StringType()),
        StructField("is_primary", BooleanType(), False),
        StructField("primary_id", LongType()),
    ]
)


@dataclass
class ParsedFaqs:
    rows: list[tuple]
    stop_words: frozenset[str]
    synonyms: dict[str, list[str]] = field(default_factory=dict)

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, FAQ_SCHEMA)


def _row(qid, question, lang, answer, sub_answers, response_type,
         is_primary, primary_id):
    return (
        qid, question, normalize_text(question, lang), answer,
        sub_answers, response_type, is_primary, primary_id,
    )


def parse_csv(path: str, lang: str = "en") -> ParsedFaqs:
    """S5: 2-column CSV — col0 question, col1 answer
    (CSVParser.create_question_maps, CSVParser.py:35-55)."""
    rows: list[tuple] = []
    qid = 10001
    with open(path, newline="") as f:
        for rec in csv.reader(f):
            if not rec:
                continue
            answer = [(rec[1] if len(rec) > 1 else None, "basic", "default")]
            rows.append(
                _row(qid, rec[0], lang, answer, [], "message", True, qid)
            )
            qid += 1
    return ParsedFaqs(rows, get_stop_words(lang))


def parse_json_export(
    path: str, lang: str = "en", synonyms_csv_path: str | None = None
) -> ParsedFaqs:
    """S6: JSON export — primary + alternates interleaved id order
    (JSONExportParser.py:52-79); stop words from kgParams override
    built-ins, en re-unions question words (# NLP-7736,
    JSONExportParser.py:36-50); synonyms from the export merged with the
    generated-synonyms CSV (S10, JSONExportParser.py:81-102)."""
    with open(path) as f:
        payload = json.load(f)

    rows: list[tuple] = []
    qid = 10001
    for faq in payload.get("faqs", []):
        primary_id = qid
        answer = [
            (a.get("text", "test"), a.get("type"), a.get("channel"))
            for a in faq.get("answer", [])
        ]
        subs = [
            [
                (a.get("text", "test"), a.get("type"), a.get("channel"))
                for a in alt
            ]
            for alt in faq.get("alternateAnswers", [])
        ]
        rows.append(
            _row(qid, faq["question"], lang, answer, subs,
                 faq.get("responseType"), True, primary_id)
        )
        qid += 1
        for alt in faq.get("alternateQuestions", []):
            rows.append(
                _row(qid, alt.get("question"), lang, [], [], "", False,
                     primary_id)
            )
            qid += 1

    kg_params = payload.get("kgParams", {})
    if kg_params.get("stopWords"):
        stops = set(kg_params["stopWords"])
        if lang == "en":
            stops |= ENGLISH_QUESTION_WORDS
        stop_words = frozenset(stops)
    else:
        stop_words = get_stop_words(lang)

    synonyms = {k: list(v) for k, v in payload.get("synonyms", {}).items()}
    if synonyms_csv_path:
        merge_generated_synonyms(synonyms, synonyms_csv_path)
    return ParsedFaqs(rows, stop_words, synonyms)


def parse_csv_export(path: str, lang: str = "en") -> ParsedFaqs:
    """S7: row-typed CSV — ['faq', _, 'primary'|'alternate', ques, ans];
    alternates bind to the MOST RECENT primary; parsing stops at the
    first non-'faq' row; kgParams row (cols 4+) supplies stop words
    (CSVExportParser.py:30-41,43-76)."""
    with open(path, newline="") as f:
        records = list(csv.reader(f))

    rows: list[tuple] = []
    qid = 10001
    prev_primary: int | None = None
    faq_row_count = 0
    for rec in records:
        if not rec or rec[0] != "faq":
            break
        if rec[2] == "primary":
            prev_primary = qid
            answer = [(rec[4] if len(rec) > 4 else None, "basic", "default")]
            rows.append(
                _row(qid, rec[3], lang, answer, [], "message", True, qid)
            )
            qid += 1
        elif rec[2] == "alternate":
            rows.append(
                _row(qid, rec[3], lang, [], [], "", False, prev_primary)
            )
            qid += 1
        faq_row_count += 1

    stop_words = None
    for rec in records[faq_row_count + 1:]:
        if rec and rec[0] == "kgParams":
            stops = set(rec[4:])
            if lang == "en":
                stops |= ENGLISH_QUESTION_WORDS
            stop_words = frozenset(stops)
            break
    if stop_words is None:
        stop_words = get_stop_words(lang)
    return ParsedFaqs(rows, stop_words)


def merge_generated_synonyms(
    synonyms: dict[str, list[str]], csv_path: str
) -> dict[str, list[str]]:
    """S10: rows ``term,"a/b/c"`` split on '/', trimmed, appended
    (JSONExportParser.update_generated_synonyms, :81-102)."""
    with open(csv_path, newline="") as f:
        for rec in csv.reader(f):
            if len(rec) > 1:
                vals = [v.strip() for v in rec[1].split("/")]
                synonyms.setdefault(rec[0], []).extend(v for v in vals if v)
    return synonyms


PARSERS: dict[str, Any] = {
    "csv": parse_csv,
    "json_export": parse_json_export,
    "csv_export": parse_csv_export,
}


def get_input_parser(request_type: str):
    """S4 dispatch (KnowledgeGraphGenerator.py:22-29)."""
    try:
        return PARSERS[request_type]
    except KeyError:
        raise ValueError(
            f"unsupported request_type {request_type!r}; "
            f"expected one of {sorted(PARSERS)}"
        ) from None
