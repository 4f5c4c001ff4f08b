"""Semantic unit tests for the round-2 curation operators (PII redaction,
benchmark contamination, temperature-scaled domain mix) on tiny in-memory
frames — the oracle gate (tools/check_oracles.py) covers value equality vs
DuckDB at sf0.01; these pin the SEMANTICS on hand-built edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_spark.ops import textops


@pytest.fixture(scope="module")
def docs_df(spark, tmp_path_factory):
    rows = [
        # doc 0: benchmark member (0 % 50 == 0); shares its 5-gram with doc 3
        (0, "alpha beta gamma delta epsilon zeta", "en", "s", 34),
        (1, "reach me at bob@corp.io or 555-1234 now", "en", "s", 40),
        (2, "tiny", "de", "s", 4),
        (3, "alpha beta gamma delta epsilon other words", "en", "s", 43),
        (4, "totally unrelated text with many unique words", "de", "s", 45),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path_factory.mktemp("curation") / "documents.parquet")
    df.write.parquet(path)
    return path.rsplit("/documents.parquet", 1)[0]


def test_pii_redact_masks_emails_and_phones(spark, docs_df):
    out = {
        r["doc_id"]: r
        for r in textops.doc_pii_redact(spark, docs_df).collect()
    }
    # every doc gets one salted email + one salted phone; doc 1 has one more
    # of each in its own text
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 2
    # redacted text contains no surviving address (md5 differs across docs)
    assert len({r["redacted_md5"] for r in out.values()}) == len(out)


def test_contamination_flags_shared_ngram(spark, docs_df):
    out = {
        r["doc_id"]: r
        for r in textops.doc_contamination(spark, docs_df).collect()
    }
    assert 0 not in out  # benchmark docs are not candidates
    assert out[3]["contaminated"] and out[3]["n_hits"] == 1
    assert not out[1]["contaminated"]
    assert not out[2]["contaminated"]  # < 5 words -> no n-grams
    assert set(out) == {1, 2, 3, 4}  # every candidate appears


def test_domain_mix_quota_is_temperature_scaled(spark, docs_df):
    out = textops.doc_domain_mix(spark, docs_df).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["mix_rank"])
    # s_en = floor(sqrt(3)) = 1, s_de = floor(sqrt(2)) = 1, S = 2 ->
    # quota = floor(200 * 1 / 2) = 100 each, capped by group size
    assert len(by_lang["en"]) == 3 and len(by_lang["de"]) == 2
    for ranks in by_lang.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
