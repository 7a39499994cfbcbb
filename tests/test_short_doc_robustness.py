"""Short-document robustness for the shingle/fingerprint family.

The driver-generated fixture happens to have a 10-whitespace-token
minimum, which masked a crash class: Spark's ``sequence(1, 0, 1)``
THROWS (illegal bounds), so any unguarded ``sequence(1, size - 7)``
start-position expression kills the whole job on the first <8-token
document — and real corpora are full of short documents. These tests
run the affected queries on a corpus deliberately stacked with 0..9
token documents and check full oracle parity via the same differential
harness the registry-wide sweep uses (tools/check_oracle.run_sweep on a
synthetic sf dir), so the short-doc semantics (empty shingle set) are
pinned cross-engine, not just "does not crash".
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from etl_pipeline_orchestration_spark.plans import registry

registry.load_all()

REAL_SF = "/root/testdata/sf0.001"

# Every registered query over `documents` that shingles or builds
# bigrams; the fingerprint four crashed outright pre-fix, the bigram
# three are the row-set-parity edge (1-word docs must emit no grams).
AFFECTED = {
    "doc_fingerprints_poly",
    "doc_fingerprints_winnow",
    "shingle_novelty_scores",
    "fingerprint_contamination_pairs",
    "boilerplate_bigram_flags",
    "pmi_collocations",
    "conditional_entropy_by_lang",
}

SHORT_TEXTS = [
    "one",
    "two words",
    "three tiny words",
    "a b c d",
    "a b c d e",
    "a b c d e f",
    "seven words right here in this doc",
    "exactly eight whitespace tokens sit in this one",
    "nine tokens a b c d e f g",
    # >= 11 tokens so winnowing emits fingerprints; duplicated across
    # even/odd ids so novelty + contamination produce non-empty output.
    "the quick brown fox jumps over the lazy dog again and again today",
    "the quick brown fox jumps over the lazy dog again and again today",
    "completely different sentence with enough tokens to produce several "
    "winnowed fingerprints for the join",
    "completely different sentence with enough tokens to produce several "
    "winnowed fingerprints for the join",
]


@pytest.fixture(scope="module")
def short_sf_dir(tmp_path_factory):
    """A synthetic sf dir: real sf0.001 tables symlinked, documents
    replaced by the short-doc corpus (single parquet FILE, like the
    driver's layout, so DuckDB's read_parquet sees it too)."""
    d = tmp_path_factory.mktemp("sf_short")
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(f"{REAL_SF}/{t}.parquet", str(d / f"{t}.parquet"))
    texts = SHORT_TEXTS
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(
                ["en" if i % 3 else "de" for i in range(len(texts))],
                type=pa.string(),
            ),
            "source": pa.array(
                ["web" if i % 2 else "books" for i in range(len(texts))],
                type=pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_shingle_queries_survive_short_docs_and_match_oracle(
    spark, short_sf_dir
):
    from tools.check_oracle import run_sweep

    result = run_sweep(short_sf_dir, only=set(AFFECTED), spark=spark)
    assert result["fail"] == 0, f"short-doc mismatches: {result['failures']}"
    assert result["pass"] == len(AFFECTED)


def test_short_doc_fingerprint_semantics(spark, short_sf_dir):
    # <8-token docs contribute NO shingles; >= 8-token docs still do.
    rows = registry.QUERIES["doc_fingerprints_poly"](
        spark, short_sf_dir
    ).collect()
    short_ids = {i for i in range(1, 10)}  # docs 1..9 have < 8 tokens... doc 8 has 8
    with_fps = {r["doc_id"] for r in rows}
    assert with_fps.isdisjoint(short_ids - {8, 9}), (
        "sub-8-token documents must produce zero shingles"
    )
    # 1-word docs emit zero bigrams (no spurious self-gram).
    bo = {
        r["doc_id"]: r
        for r in registry.QUERIES["boilerplate_bigram_flags"](
            spark, short_sf_dir
        ).collect()
    }
    assert 1 not in bo, "1-word doc must not appear in the bigram relation"
    assert bo[2]["n_grams"] == 1  # "two words" -> exactly one bigram
