"""Batched shingle/MinHash kernel == the pure-SQL plan, bit for bit.

The driver's DuckDB oracles for minhash_lsh / ngram_jaccard /
dedup_groups are written against the SQL formulation (explode +
mix_col aggregates); ops/text.py now runs the Arrow kernel by
default, so this battery pins kernel(int64) == SQL(int64) on the real
documents table plus adversarial strings (short docs, empty, repeated
chars, non-ascii codepoints)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2spark.kernels import shingle as sh
from s2spark.ops import text as t
from s2spark.sources import geo


def _naive_codes(s: str) -> list[int]:
    return [sum(ord(s[i + k]) * 128 ** k for k in range(sh.SHINGLE))
            for i in range(max(len(s) - sh.SHINGLE + 1, 0))]


ADVERSARIAL = [
    "", "a", "abcd", "abcde", "abcdef",
    "aaaaaaaaaa",
    "the quick brown fox jumps over the lazy dog",
    "x" * 4 + "y",
    "café con leche ééé",      # latin-1 accents
    "中文文本测试字符",  # CJK (BMP)
    "\U0001f600\U0001f601 emoji pair body text",   # non-BMP
]


def test_codes_match_naive():
    codes, n_sh = sh.shingle_codes_batch(ADVERSARIAL)
    want = [c for s in ADVERSARIAL for c in _naive_codes(s)]
    assert codes.tolist() == want
    assert n_sh.tolist() == [max(len(s) - 4, 0) for s in ADVERSARIAL]


def test_minhash_matches_naive():
    sig = sh.minhash_batch(ADVERSARIAL, t.MINHASH_SALT, t.N_HASHES)
    for i, s in enumerate(ADVERSARIAL):
        cs = np.array(_naive_codes(s), dtype=np.int64)
        if not len(cs):
            continue
        for j in range(t.N_HASHES):
            want = int(geo.mix_np(cs, t.MINHASH_SALT + j).min())
            assert sig[i, j] == want, (i, j, s)


def test_sets_match_naive():
    sets = sh.shingle_sets_batch(ADVERSARIAL)
    for s, got in zip(ADVERSARIAL, sets):
        assert got.tolist() == sorted(set(_naive_codes(s)))


def test_sets_fallback_wide_codepoints():
    # non-BMP codepoints push codes past 2^36: the packed-key unique
    # must fall back to the per-doc path with identical results
    texts = ["\U0010fffd" * 8, "plain ascii text", "\U0001f600abcd"]
    sets = sh.shingle_sets_batch(texts)
    for s, got in zip(texts, sets):
        assert got.tolist() == sorted(set(_naive_codes(s)))


def test_sorted_inter_counts():
    rng = np.random.default_rng(7)
    sa, sb, want = [], [], []
    for i in range(300):
        a = np.unique(rng.integers(0, 500, size=rng.integers(0, 40)))
        b = np.unique(rng.integers(0, 500, size=rng.integers(0, 40)))
        sa.append(a.astype(np.int64))
        sb.append(b.astype(np.int64))
        want.append(len(set(a.tolist()) & set(b.tolist())))
    got = sh.sorted_inter_counts(sa, sb)
    assert got.tolist() == want
    # wide-value fallback path
    big = np.array([1 << 40, 1 << 41], dtype=np.int64)
    got = sh.sorted_inter_counts([big, np.array([], np.int64)],
                                 [big[:1], np.array([], np.int64)])
    assert got.tolist() == [1, 0]


@pytest.mark.usefixtures("spark")
def test_signatures_kernel_equals_sql(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    k = t.minhash_signatures(docs, use_kernel=True)
    s = t.minhash_signatures(docs, use_kernel=False)
    cols = ["doc_id"] + [f"m{j}" for j in range(t.N_HASHES)]
    krows = sorted(tuple(r) for r in k.select(*cols).collect())
    srows = sorted(tuple(r) for r in s.select(*cols).collect())
    assert krows == srows and len(krows) > 0


@pytest.mark.usefixtures("spark")
def test_ngram_jaccard_sets_on_table(spark):
    # end-to-end: the kernel-built sets reproduce the SQL shingle sets
    # (distinct codes per doc) on the first 200 documents
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(200))
    pdf = docs.toPandas()
    got = sh.shingle_sets_batch(pdf["text"].tolist())
    sql = (t._shingle_codes(docs).distinct().groupBy("doc_id")
           .agg(F.collect_set("code").alias("codes"))
           .collect())
    by_id = {r["doc_id"]: sorted(r["codes"]) for r in sql}
    for doc_id, txt, arr in zip(pdf["doc_id"], pdf["text"], got):
        want = by_id.get(doc_id, [])
        assert arr.tolist() == want, doc_id
