"""Export assembly: ontology + FAQ metadata -> importable JSON docs.

DataFrame re-expression of JSONGenerator.create_response
(/root/reference/response_type/JSONGenerator.py:26-72):

  * one output doc per PRIMARY question (iteration over altq_map keys);
  * terms/tags come from the (optimised) ontology rows;
  * alternates: tags = alt.tags + (alt.terms − primary.terms)
    (set difference at JSONGenerator.py:52 — CPython set order is
    nondeterministic, so ``array_except``'s deterministic order is
    compared as a SET in golden tests, SURVEY.md Appendix A.6);
    alt.terms in the export are the PRIMARY's terms (JSONGenerator.py:54);
  * answers pass through with text defaulting to 'test'
    (JSONGenerator.py:42,62);
  * responseType == 'dialog' adds an empty dialogRefId
    (JSONGenerator.py:67-68).

Joins: J2 (ontology ⋈ faq on ques_id), J3 (alt rows ⋈ primary id +
collect_list), J4 (array_except) — all equi-joins on ques_id; the alt
aggregation is the only shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_export(onto: DataFrame, faq: DataFrame) -> DataFrame:
    """-> one row per primary with the export JSON fields.

    ``onto``: (doc_id, question, terms, tags) for ALL questions
    (alternates included, un-optimised — the reference optimises
    primaries only). ``faq``: canonical parser output (sources/faq.py).
    """
    o = onto.select(
        F.col("doc_id").alias("ques_id"), "terms", "tags"
    )
    primary = (
        faq.where("is_primary")
        .join(o, "ques_id")
        .select(
            "ques_id", "question", "terms", "tags", "answer",
            "sub_answers", "response_type",
        )
    )
    alts = (
        faq.where("NOT is_primary")
        .select("ques_id", "primary_id", F.col("question").alias("alt_question"))
        .join(
            o.select(
                F.col("ques_id"),
                F.col("terms").alias("alt_terms"),
                F.col("tags").alias("alt_tags"),
            ),
            "ques_id",
        )
    )
    p_terms = primary.select(
        F.col("ques_id").alias("primary_id"),
        F.col("terms").alias("p_terms"),
    )
    alt_structs = (
        alts.join(p_terms, "primary_id")
        .withColumn(
            "tags_out",
            F.concat(
                "alt_tags", F.array_except("alt_terms", "p_terms")
            ),
        )
        .groupBy("primary_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(ques_id,"
                " alt_question, tags_out, p_terms))),"
                " x -> struct(x.alt_question AS question,"
                " x.tags_out AS tags, x.p_terms AS terms))"
            ).alias("alternateQuestions")
        )
    )
    # No text default here: the 'test' default is a KEY-MISSING default
    # applied once by the parsers (JSONGenerator.py:43 semantics — an
    # explicit "text": null passes through as null; ADVICE r1 item 4).
    answers = F.expr(
        "transform(answer, a -> struct("
        "a.text AS text, a.type AS type, a.channel AS channel))"
    )
    sub_answers = F.expr(
        "transform(sub_answers, alt -> transform(alt, a -> struct("
        "a.text AS text, a.type AS type, a.channel AS channel)))"
    )
    return (
        primary.join(alt_structs,
                     primary.ques_id == alt_structs.primary_id, "left")
        .select(
            "question",
            F.coalesce(
                "alternateQuestions",
                F.array().cast(
                    "array<struct<question:string,tags:array<string>,"
                    "terms:array<string>>>"
                ),
            ).alias("alternateQuestions"),
            "terms",
            "tags",
            F.lit("").alias("refId"),
            F.col("response_type").alias("responseType"),
            answers.alias("answer"),
            sub_answers.alias("alternateAnswers"),
            F.when(F.coalesce("response_type", F.lit("message")) == "dialog",
                   F.lit("")).alias("dialogRefId"),
            F.col("ques_id").alias("_ques_id"),
        )
    )


def write_export_json(
    export: DataFrame, synonyms: dict[str, list[str]], path: str
) -> None:
    """Emit the reference's single-document export
    ({faqs: [...], synonyms: {...}}) — S11 sink (JSONGenerator.py:14-23).
    The faq list is small (config-scale); the corpus-scale sink is the
    per-row JSON/parquet triple tables."""
    import json

    rows = [r.asDict(recursive=True) for r in
            export.orderBy("_ques_id").collect()]
    faqs = []
    for r in rows:
        r.pop("_ques_id")
        if r.get("dialogRefId") is None:
            r.pop("dialogRefId")
        faqs.append(r)
    with open(path, "w") as f:
        json.dump({"faqs": faqs, "synonyms": synonyms}, f)
