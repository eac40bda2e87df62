"""S14 (PDF/ZIP corpus source) and S15 (pretrained vectors) coverage."""

from __future__ import annotations

import struct
import zipfile

import pytest

from knowledgegraphgenerator_spark.sources.docs import (
    extract_pdf_text,
    read_document_corpus,
)
from knowledgegraphgenerator_spark.sources.pretrained import (
    fetch_synonyms_pretrained,
    load_word2vec_binary,
    load_word2vec_text,
    topk_from_vector_table,
)

VECS = {
    # 2-d toy space: transfer/payment/wire cluster vs fruit cluster
    "transfer": [1.0, 0.1],
    "payment": [0.9, 0.2],
    "wire": [0.95, 0.05],
    "apple": [0.1, 1.0],
    "banana": [0.05, 0.9],
}


def _write_text_format(path):
    with open(path, "w") as f:
        f.write(f"{len(VECS)} 2\n")
        for w, v in VECS.items():
            f.write(f"{w} {v[0]} {v[1]}\n")


def _write_binary_format(path):
    with open(path, "wb") as f:
        f.write(f"{len(VECS)} 2\n".encode())
        for w, v in VECS.items():
            f.write(w.encode() + b" " + struct.pack("<2f", *v))


def test_load_word2vec_text(spark, tmp_path):
    p = str(tmp_path / "vecs.txt")
    _write_text_format(p)
    got = {r["word"]: r["vector"] for r in load_word2vec_text(spark, p).collect()}
    assert set(got) == set(VECS)
    assert got["transfer"] == pytest.approx([1.0, 0.1])


def test_load_word2vec_binary(spark, tmp_path):
    p = str(tmp_path / "vecs.bin")
    _write_binary_format(p)
    got = {r["word"]: r["vector"]
           for r in load_word2vec_binary(spark, p).collect()}
    assert set(got) == set(VECS)
    assert got["apple"] == pytest.approx([0.1, 1.0], abs=1e-6)


def test_topk_neighbors_and_reference_output_protocol(spark, tmp_path):
    p = str(tmp_path / "vecs.txt")
    _write_text_format(p)
    vectors = load_word2vec_text(spark, p)
    top = {
        (r["word"], r["rnk"]): r["synonym"]
        for r in topk_from_vector_table(vectors, ["transfer", "apple"], 2)
        .collect()
    }
    assert top[("transfer", 1)] == "wire"   # cos > payment
    assert top[("transfer", 2)] == "payment"
    assert top[("apple", 1)] == "banana"
    # reference protocol: rows ordered by best similarity desc,
    # synonyms '/'-joined (syn_gen_with_googlenews.py:49-55)
    rows = fetch_synonyms_pretrained(vectors, ["transfer", "apple"], 2)
    assert [w for w, _ in rows] == sorted(
        ["transfer", "apple"],
        key=lambda w: -max(
            _cos(VECS[w], VECS[o]) for o in VECS if o != w
        ),
    )
    assert dict(rows)["transfer"] == "wire/payment"


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb)


def test_pretrained_feeds_s10_synonym_merge(spark, tmp_path):
    """Close the reference feedback loop: S15 pretrained top-k ->
    generated_synonyms.csv -> S10 merge into graph synonyms
    (synonym_generator output consumed by --synonyms_file_path)."""
    import csv

    from knowledgegraphgenerator_spark.sources.faq import (
        merge_generated_synonyms,
    )

    p = str(tmp_path / "vecs.txt")
    _write_text_format(p)
    rows = fetch_synonyms_pretrained(
        load_word2vec_text(spark, p), ["transfer"], 2
    )
    out = tmp_path / "generated_synonyms.csv"
    with open(out, "w", newline="") as f:
        w = csv.writer(f, delimiter=",", quotechar='"')
        for word, syns in rows:
            w.writerow([word, syns])
    merged = merge_generated_synonyms({"transfer": ["remittance"]}, str(out))
    assert merged["transfer"] == ["remittance", "wire", "payment"]


def test_zip_corpus_fanout(spark, tmp_path):
    zp = tmp_path / "corpus.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("a.txt", "wire transfer limits explained")
        zf.writestr("sub/b.txt", "how to open an account")
        zf.writestr("notes/", "")  # directory entry: skipped
        zf.writestr("img.bin", b"\x00\x01")  # non-text member: skipped
    df = read_document_corpus(spark, str(tmp_path))
    rows = {r["member"]: r["text"] for r in df.collect()}
    assert rows["a.txt"] == "wire transfer limits explained"
    assert rows["sub/b.txt"] == "how to open an account"
    assert "img.bin" not in rows and "notes/" not in rows


def test_plain_text_files(spark, tmp_path):
    (tmp_path / "doc.txt").write_text("hello corpus")
    df = read_document_corpus(spark, str(tmp_path / "doc.txt"))
    assert df.collect()[0]["text"] == "hello corpus"


def test_pdf_stub_policy(spark, tmp_path):
    # no PDF parser in this sandbox: NotImplementedError without the
    # disclosed deterministic fake; stable placeholder with it
    with pytest.raises(NotImplementedError):
        extract_pdf_text(b"%PDF-1.4 fake")
    t1 = extract_pdf_text(b"%PDF-1.4 fake", deterministic_fake=True)
    t2 = extract_pdf_text(b"%PDF-1.4 fake", deterministic_fake=True)
    assert t1 == t2 and t1.startswith("fake pdf text")
    zp = tmp_path / "with_pdf.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("x.pdf", b"%PDF-1.4 fake")
    df = read_document_corpus(spark, str(zp), deterministic_fake=True)
    assert df.collect()[0]["text"].startswith("fake pdf text")
