"""Driver-mirror: every queries() entry must value-match its oracle_sql()
on the same parquet tables (the driver does this at sf0.01; we use
sf0.001 for speed).  Doubles are compared bit-exactly — the engine's
geo derivation is specified to be IEEE-identical across dialects."""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = _canon(q(spark, SF_DIR).toPandas())
    if sql is None:
        assert len(got) >= 0  # rows-only check (driver does the same)
        return
    want = _canon(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f":
            assert np.array_equal(g, w), f"{name}.{c} float mismatch"
        else:
            assert (g == w).all(), f"{name}.{c} mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def _synthetic_near_dup_corpus(n_base=60, dim=64):
    """Deterministic corpus with planted near-dup pairs: each base
    vector (integer mix values, centered) gets a perturbed twin whose
    cosine is >= ~0.99 (one coordinate nudged by ~1% of its scale)."""
    from s2spark.sources import geo
    base = np.stack([
        geo.mix_np(np.arange(dim, dtype=np.int64) + i * dim, 7)
        .astype(np.float64) - (geo.P - 1) / 2.0
        for i in range(n_base)])
    twin = base.copy()
    twin[:, 0] += np.abs(base).mean() * 0.1
    vecs = np.concatenate([base, twin])
    ids = np.arange(2 * n_base)
    return ids, vecs.astype(np.float32)


def test_near_dup_banding_recall(spark):
    """VERDICT r4 #1: the widened 16-bit bands must still catch true
    near-dups.  On a corpus with planted cos>=0.99 twins, banded-LSH
    recall of the twin pairs must be high; no false positives ever
    (exact rerank)."""
    from s2spark.ops import ann
    ids, vecs = _synthetic_near_dup_corpus()
    n_base = len(ids) // 2
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids,
                      "embedding": [v.tolist() for v in vecs]}))
    exact = {(r["id_a"], r["id_b"])
             for r in ann.cosine_pairs_exact(emb, 0.99).collect()}
    banded = {(r["id_a"], r["id_b"])
              for r in ann.cosine_pairs(emb, 0.99).collect()}
    assert banded <= {(r["id_a"], r["id_b"])
                      for r in ann.cosine_pairs_exact(emb, 0.0).collect()}
    planted = {(i, i + n_base) for i in range(n_base)} & exact
    assert len(planted) >= n_base * 0.9  # perturbation really is a near-dup
    recall = len(banded & planted) / len(planted)
    assert recall >= 0.8, recall


def test_pair_band_candidate_shrink(spark):
    """VERDICT r4 #1 'done' criterion: the candidate-pair count under
    the widened bands must shrink by orders of magnitude versus the old
    16-key (4 bands x 2 bits) banding, which emitted ~n^2/16 pairs."""
    import itertools
    import pyarrow.parquet as pq
    from s2spark.ops import ann
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    E = np.stack([np.asarray(x, dtype=np.float64)
                  for x in t["embedding"].to_pylist()])

    def n_candidates(bands, bits):
        W = np.stack([np.asarray(ann.plane_weights(p), dtype=np.float64)
                      for p in range(bands * bits)])
        S = (E @ W.T) > 0
        cand = set()
        for b in range(bands):
            vals = np.zeros(len(E), dtype=np.int64)
            for j in range(bits):
                vals |= S[:, b * bits + j].astype(np.int64) << j
            for v in np.unique(vals):
                idx = np.where(vals == v)[0]
                cand.update(itertools.combinations(idx.tolist(), 2))
        return len(cand)

    old = n_candidates(4, 2)       # the r4 16-key scale-killer
    new = n_candidates(ann.N_PAIR_BANDS, ann.BAND_BITS)
    assert new * 100 <= old, (old, new)


def test_pair_bands_tri_dialect(spark, duck):
    """pair_band_values_np == Spark Arrow UDF == DuckDB
    list_dot_product signs — the fold-order contract for the banding
    kernel (CLAUDE.md tri-dialect invariant)."""
    from pyspark.sql import functions as F
    from s2spark.ops import ann
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    E = np.stack([np.asarray(x, dtype=np.float64)
                  for x in t["embedding"].to_pylist()])
    want = ann.pair_band_values_np(E)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", F.col("embedding").alias("_e"))
    got = {r["vec_id"]: r["b"] for r in emb.withColumn(
        "b", ann._pair_bands_udf()(F.col("_e"))).collect()}
    for i, vid in enumerate(ids):
        assert got[int(vid)] == want[i].tolist()

    band_sqls = []
    for b in range(ann.N_PAIR_BANDS):
        terms = []
        for j in range(ann.BAND_BITS):
            w = ", ".join("%.1f" % float(x)
                          for x in ann.plane_weights(
                              b * ann.BAND_BITS + j))
            terms.append(f"(CASE WHEN list_dot_product(e, [{w}]) > 0 "
                         f"THEN {1 << j} ELSE 0 END)")
        band_sqls.append("(" + " + ".join(terms) + ")")
    rows = duck.execute(
        "SELECT vec_id, " + ", ".join(
            f"{s} AS b{i}" for i, s in enumerate(band_sqls)) +
        " FROM (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS e FROM embeddings)").fetchall()
    duck_vals = {r[0]: list(r[1:]) for r in rows}
    for i, vid in enumerate(ids):
        assert duck_vals[int(vid)] == want[i].tolist()


def test_dedup_groups_components(spark):
    """Connected components: transitive closure property + canonical
    representative = component min."""
    import pandas as pd
    from s2spark.ops import text
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": ["a", "b", "x", "m"],
                      "doc_b": ["b", "c", "y", "a"]}))
    got = {r["doc_id"]: (r["group_id"], r["group_size"])
           for r in text.dedup_groups(pairs).collect()}
    assert got == {"a": ("a", 4), "b": ("a", 4), "c": ("a", 4),
                   "m": ("a", 4), "x": ("x", 2), "y": ("x", 2)}


def test_dedup_groups_lazy_convergence_probe(spark):
    """check_every>1 halves the driver job barriers (VERDICT r2 #4)
    and produces identical components; stats expose the counts."""
    import pandas as pd
    from s2spark.ops import text
    # a path graph (diameter 6 -> several rounds) + an isolated pair
    edges = [(i, i + 1) for i in range(7)] + [(100, 101)]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
    s1, s3 = {}, {}
    r1 = {(r["doc_id"], r["group_id"], r["group_size"])
          for r in text.dedup_groups(pairs, check_every=1,
                                     stats=s1).collect()}
    r3 = {(r["doc_id"], r["group_id"], r["group_size"])
          for r in text.dedup_groups(pairs, check_every=3,
                                     stats=s3).collect()}
    assert r1 == r3
    assert s3["convergence_checks"] < s1["convergence_checks"]
    assert all(g == 0 for (_, g, n) in r1 if n == 8)  # path comp root


def test_lsh_bits_ladder():
    """Corpus-calibrated key width: integer ladder, clamped to
    [4, 16], monotone in n (r4 verdict: 256 fixed buckets degenerate
    at 10^9 rows)."""
    from s2spark.ops import ann
    assert ann.lsh_bits(0) == 4
    assert ann.lsh_bits(256 << 4) == 4          # boundary: n == 256*2^4
    assert ann.lsh_bits((256 << 4) + 1) == 5    # just past it
    assert ann.lsh_bits(10 ** 6) == 12
    assert ann.lsh_bits(10 ** 9) == 16          # saturates at BAND_BITS
    assert ann.lsh_bits(10 ** 12) == 16
    prev = 0
    for n in (10, 10 ** 3, 10 ** 5, 10 ** 7, 10 ** 9):
        b = ann.lsh_bits(n)
        assert b >= prev
        prev = b


def test_lsh_bits_sql_matches_python(duck):
    from s2spark.ops import ann
    n = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    got = duck.execute("SELECT " + ann.lsh_bits_sql()).fetchone()[0]
    assert got == ann.lsh_bits(n)


def test_lsh_ann_multitable_recall(spark):
    """The multi-table LSH must rank a planted cos>=0.99 twin first
    for most queries, and per-query cos_sim must be non-increasing in
    rank (exact rerank of the banded candidates)."""
    from s2spark.ops import ann
    ids, vecs = _synthetic_near_dup_corpus()
    n_base = len(ids) // 2
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids,
                      "embedding": [v.tolist() for v in vecs]}))
    qs = emb.where(emb.vec_id < 40) \
        .select(emb.vec_id.alias("qid"), "embedding")
    out = ann.lsh_ann(emb, qs, k=3).toPandas()
    hits = 0
    for qid, grp in out.groupby("qid"):
        grp = grp.sort_values("rank")
        sims = grp["cos_sim"].to_numpy()
        assert (np.diff(sims) <= 1e-15).all()
        if int(qid) + n_base in set(grp["vec_id"].astype(int)):
            hits += 1
    assert hits >= 0.8 * 40, hits
