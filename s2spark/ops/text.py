"""Training-data text operators over the `documents` table.

Deduplication + text analysis as first-class engine ops, each a pure
DataFrame plan with a value-exact DuckDB oracle in __spark_entry__.
Everything stays in whole-stage codegen except the shingle/MinHash
hot loop, which runs as a batched Arrow kernel
(kernels/shingle.py) producing the SAME int64s as the SQL
formulation — the SQL path is kept behind use_kernel=False and
pinned equal by tests/test_text_kernel.py:

- exact_dedup        md5 hash-groupBy with representative selection
- token_stats        whitespace tokenization counts/ratios
- quality_score      type-token ratio + length heuristics
- lang_id            vocabulary-overlap scoring (NB: the synthetic
                     corpus draws `lang` independently of text, so this
                     demonstrates the operator, not label recovery)
- doc_fingerprint    shingle-set fingerprint (distinct/min/max hash)
- minhash_signatures 12-perm MinHash over 5-gram shingles
- lsh_candidate_pairs  banded LSH (4 bands x 3 rows) self-join
- simhash            16-bit SimHash over tokens

Hashing is the engine's tri-dialect LCG mix (s2spark.sources.geo) over
small-integer encodings of shingles/tokens (5 x 7-bit ascii), so Spark
and DuckDB compute identical signatures — no engine-specific hash().

Scale: shingling explodes ~|text| rows per doc; signatures reduce back
to one row per doc with a single map-side-combined aggregation.  The
LSH self-join keys are (band, 3 x minhash) — bounded bucket sizes by
construction; for skewed corpora the salting helper from ops.joins
applies unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sources import geo

SHINGLE = 5
N_HASHES = 12
BANDS = 4
ROWS_PER_BAND = 3
MINHASH_SALT = 100
SIMHASH_SALT = 7
SIMHASH_BITS = 16

LANG_MARKERS = {
    "en": ["the", "a", "fast"],
    "de": ["agg", "sort", "merge"],
    "fr": ["window", "query", "line"],
    "es": ["data", "stream", "row"],
    "zh": ["join", "batch", "big"],
}


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Hash-groupBy dedup: one row per distinct text with the kept
    representative (min doc_id) and the duplicate count."""
    return (docs
            .withColumn("text_hash", F.md5(F.encode(F.col("text"), "UTF-8")))
            .groupBy("text_hash")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id")))


def token_stats(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    return docs.select(
        "doc_id", n.alias("n_tokens"),
        F.length("text").alias("len_chars"),
        (F.length("text").cast("double") / n).alias("chars_per_token"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/diversity heuristics: type-token ratio + bucket."""
    toks = docs.select("doc_id",
                       F.explode(F.split(F.col("text"), " ")).alias("tok"))
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("tok").alias("n_distinct"))
    ttr = F.col("n_distinct").cast("double") / F.col("n_tokens")
    return agg.select(
        "doc_id", "n_tokens", "n_distinct", ttr.alias("ttr"),
        F.when((F.col("n_tokens") >= 32) & (ttr >= 0.25), "high")
         .when(F.col("n_tokens") >= 16, "medium")
         .otherwise("low").alias("quality"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Vocabulary-overlap language scorer (deterministic argmax)."""
    cols = [F.col("doc_id")]
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            token = f" {w} "
            occ = ((F.length(padded)
                    - F.length(F.replace(padded, F.lit(token), F.lit(""))))
                   / len(token)).cast("long")
            score = occ if score is None else score + occ
        cols.append(score.alias(f"score_{lang}"))
    scored = docs.select(*cols)
    pred = None
    best = None
    for lang in LANG_MARKERS:  # deterministic argmax, first-wins on ties
        s = F.col(f"score_{lang}")
        if pred is None:
            pred, best = F.lit(lang), s
        else:
            pred = F.when(s > best, F.lit(lang)).otherwise(pred)
            best = F.when(s > best, s).otherwise(best)
    return scored.select("doc_id", *[f"score_{lg}" for lg in LANG_MARKERS],
                         pred.alias("pred_lang"))


def _shingle_hash(col) -> F.Column:
    """5-gram -> int < 2^35 via 7-bit ascii positional code, then the
    tri-dialect LCG mix.  Identical arithmetic in the DuckDB oracle."""
    code = None
    for k in range(SHINGLE):
        a = F.ascii(F.substring(col, k + 1, 1)).cast("long")
        code = a if code is None else code + a * F.lit(128 ** k)
    return code


def _shingle_codes(docs: DataFrame) -> DataFrame:
    """(doc_id, code) — one row per 5-char shingle, stride 1."""
    pos = F.explode(F.sequence(F.lit(1), F.length("text") - (SHINGLE - 1)))
    g = (docs.where(F.length("text") >= SHINGLE)
         .select("doc_id", F.col("text"), pos.alias("pos")))
    return g.select(
        "doc_id",
        _shingle_hash(F.expr(f"substring(text, pos, {SHINGLE})"))
        .alias("code"))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    codes = _shingle_codes(docs)
    h = geo.mix_col(F.col("code"), MINHASH_SALT)
    return (codes.select("doc_id", h.alias("h"))
            .groupBy("doc_id")
            .agg(F.count_distinct("h").alias("n_shingles"),
                 F.min("h").alias("min_hash"),
                 F.max("h").alias("max_hash")))


def minhash_signatures(docs: DataFrame,
                       use_kernel: bool = True) -> DataFrame:
    """(doc_id, m0..m11): minhash_j = min over shingles of
    mix(code, MINHASH_SALT + j).

    Default path is the batched NumPy kernel
    (kernels/shingle.minhash_batch): one Arrow UDF per doc row instead
    of |text| exploded rows x 12 mix aggregate expressions — same
    int64s (integer arithmetic, tri-dialect mix), ~5x less wall on the
    sf0.1 corpus, and at 100 TB it removes the (corpus-length x 12)
    shuffle-side aggregation entirely (signatures reduce inside the
    scan stage).  use_kernel=False keeps the pure-SQL plan for
    cross-checks (tests/test_text_kernel.py pins both paths equal)."""
    if not use_kernel:
        codes = _shingle_codes(docs)
        aggs = [F.min(geo.mix_col(F.col("code"), MINHASH_SALT + j))
                .alias(f"m{j}") for j in range(N_HASHES)]
        return codes.groupBy("doc_id").agg(*aggs)

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from ..kernels import shingle as _sh

    @pandas_udf(ArrayType(LongType()))
    def _mh(texts: pd.Series) -> pd.Series:
        sig = _sh.minhash_batch(texts.fillna("").tolist(),
                                MINHASH_SALT, N_HASHES)
        return pd.Series(list(sig))

    sig = (docs.where(F.length("text") >= SHINGLE)
           .select("doc_id", _mh(F.col("text")).alias("_sig")))
    return sig.select("doc_id",
                      *[F.col("_sig")[j].alias(f"m{j}")
                        for j in range(N_HASHES)])


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Near-duplicate candidates: docs agreeing on all rows of any
    band, plus the signature-match fraction (integer arithmetic, so
    value-exact vs the oracle).  doc_a < doc_b."""
    sig = minhash_signatures(docs).cache()
    pairs = None
    for b in range(BANDS):
        ks = [f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        left = sig.select(F.col("doc_id").alias("doc_a"),
                          *[F.col(k) for k in ks],
                          *[F.col(f"m{j}").alias(f"a{j}")
                            for j in range(N_HASHES)])
        right = sig.select(F.col("doc_id").alias("doc_b"),
                           *[F.col(k) for k in ks],
                           *[F.col(f"m{j}").alias(f"b{j}")
                             for j in range(N_HASHES)])
        p = (left.join(right, ks)
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b",
                     sum((F.col(f"a{j}") == F.col(f"b{j}")).cast("int")
                         for j in range(N_HASHES)).alias("sig_matches")))
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.max("sig_matches").alias("sig_matches"))


def ngram_jaccard(docs: DataFrame, threshold: float = 0.5,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact 5-gram Jaccard for the LSH candidate pairs (the verify
    stage of MinHash near-dup): (doc_a, doc_b, inter, union_n,
    jaccard >= threshold).  Set sizes/intersections are integer joins;
    the final division is one exact double op — value-exact vs the
    oracle.

    Scale: the expensive set intersection only runs on LSH survivors
    — the shingle-set table is semi-joined down to candidate doc ids
    BEFORE aggregation, so its size is O(|survivor docs|), not
    O(corpus); AQE then picks broadcast vs shuffle join on its own.
    Callers that already ran the LSH stage pass `candidates` to avoid
    recomputing it."""
    cand = (candidates if candidates is not None
            else lsh_candidate_pairs(docs)).select("doc_a", "doc_b")
    # the pair frame feeds BOTH the id semi-join and the final join —
    # materialize once so the LSH stage doesn't execute twice
    cand = cand.localCheckpoint(eager=True)
    cand_ids = (cand.select(F.col("doc_a").alias("doc_id"))
                .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
                .distinct())
    # per-doc shingle SET as an array column; joining the (survivors
    # only) set table to both pair sides and intersecting JVM-side
    # beats the exploded (pair x shingle) join, whose intermediate is
    # |pairs| * |shingles/doc| rows (~10^8 at sf0.1).  The set is
    # built by the batched NumPy kernel on the semi-joined survivors —
    # no exploded-shingle shuffle at all (collect_set over corpus
    # length was the old plan's one big exchange)
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from ..kernels import shingle as _sh

    @pandas_udf(ArrayType(LongType()))
    def _codes(texts: pd.Series) -> pd.Series:
        return pd.Series(_sh.shingle_sets_batch(texts.fillna("")
                                                .tolist()))

    sets = (docs.where(F.length("text") >= SHINGLE)
            .join(cand_ids, "doc_id", "left_semi")
            .select("doc_id", _codes(F.col("text")).alias("codes")))

    # |a ∩ b| via the packed-sort batch kernel: one global sort per
    # Arrow batch instead of JVM array_intersect's per-pair hash set
    # (measured 2.6x on the 160k-pair sf0.1 stage)
    @pandas_udf(LongType())
    def _inter(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(_sh.sorted_inter_counts(sa.tolist(),
                                                 sb.tolist()))

    out = (cand
           .join(sets.select(F.col("doc_id").alias("doc_a"),
                             F.col("codes").alias("_sa")), "doc_a")
           .join(sets.select(F.col("doc_id").alias("doc_b"),
                             F.col("codes").alias("_sb")), "doc_b")
           .withColumn("inter", _inter("_sa", "_sb"))
           .withColumn("union_n",
                       (F.size("_sa") + F.size("_sb")).cast("long")
                       - F.col("inter"))
           .withColumn("jaccard", F.col("inter").cast("double")
                       / F.col("union_n"))
           .where(F.col("jaccard") >= threshold))
    return out.select("doc_a", "doc_b", "inter", "union_n", "jaccard")


def dedup_groups(pairs: DataFrame, max_iters: int = 20,
                 check_every: int = 2,
                 stats: dict | None = None) -> DataFrame:
    """Connected components over near-duplicate pairs -> dedup groups:
    (doc_id, group_id, group_size) where group_id is the component's
    minimum doc id (the canonical representative).

    Iterative min-label propagation — the classic Spark pattern for
    training-data dedup at scale: each round is one equi-join + one
    map-side-combinable min aggregation over the (small) node frame;
    rounds = O(component diameter), with an eager checkpoint per round
    so lineage stays flat.  Convergence (a changed-label count — a
    driver job barrier) is probed only every `check_every` rounds
    (VERDICT r2 #4): labels are monotone non-increasing, so a
    converged state stays converged and the probe can lag at the cost
    of <= check_every-1 extra (cheap) propagation rounds while halving
    the number of full-job barriers.  `stats`, when given, receives
    {"rounds", "convergence_checks"} for tests/telemetry.
    """
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                       F.col("doc_a").alias("dst")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id"))
              .localCheckpoint(eager=True))
    rounds = checks = 0
    for it in range(max_iters):
        prop = (edges.join(labels,
                           edges["src"] == labels["doc_id"])
                .select(F.col("dst").alias("doc_id"), "label"))
        new_labels = (labels.select("doc_id", "label")
                      .unionByName(prop)
                      .groupBy("doc_id")
                      .agg(F.min("label").alias("label"))
                      .localCheckpoint(eager=True))
        rounds += 1
        probe = ((it + 1) % max(1, check_every) == 0
                 or it == max_iters - 1)
        if probe:
            checks += 1
            changed = (new_labels.join(
                labels.withColumnRenamed("label", "_old"), "doc_id")
                .where(F.col("label") != F.col("_old")).count())
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    if stats is not None:
        stats["rounds"] = rounds
        stats["convergence_checks"] = checks
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("group_size"))
    return (labels.join(sizes, "label")
            .select("doc_id", F.col("label").alias("group_id"),
                    F.col("group_size").cast("long")
                    .alias("group_size")))


def phash_near_dup(images: DataFrame, id_col: str = "image_id",
                   phash_col: str = "phash", n_bands: int = 4,
                   band_bits: int = 16) -> DataFrame:
    """Perceptual-hash near-duplicate candidates for IMAGES: band the
    64-bit phash (4 x 16-bit), candidates share >= 1 band, report the
    full Hamming distance (bit_count of xor) — the banding trick from
    MinHash applied to the image modality.  Pure SQL bit math.

    Scale: each band join is a hash equi-join on a 16-bit key;
    per-band bucket sizes are |images| / 2^band_bits on average, and
    hot buckets fall under the usual salting helper.
    """
    sides = []
    for side in ("a", "b"):
        cols = [F.col(id_col).alias(f"id_{side}"),
                F.col(phash_col).alias(f"_h{side}")]
        cols += [(F.shiftrightunsigned(F.col(phash_col), b * band_bits)
                  .bitwiseAND((1 << band_bits) - 1)).alias(f"band{b}")
                 for b in range(n_bands)]
        sides.append(images.select(*cols))
    a, b = sides
    out = None
    for bd in range(n_bands):
        # join on the single band column by name to avoid ambiguity
        p = (a.selectExpr(f"id_a", f"_ha", f"band{bd} AS _bk")
             .join(b.selectExpr(f"id_b", f"_hb", f"band{bd} AS _bk"),
                   "_bk")
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
                     .cast("long").alias("hamming")))
        out = p if out is None else out.unionByName(p)
    return out.groupBy("id_a", "id_b").agg(
        F.min("hamming").alias("hamming"))


def simhash(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over whitespace tokens (token -> 5-char rpad ->
    7-bit code -> mix; bit b votes +/-1).

    The 16 per-bit vote sums are 16 aggregate expressions in ONE
    map-side-combined groupBy (no bit explode: 16x less shuffle)."""
    toks = docs.select("doc_id",
                       F.explode(F.split(F.col("text"), " ")).alias("tok"))
    code = _shingle_hash(F.rpad(F.col("tok"), SHINGLE, " "))
    h = geo.mix_col(code, SIMHASH_SALT)
    hv = toks.select("doc_id", h.alias("h"))
    aggs = [F.sum(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(1)
                  * 2 - 1).alias(f"s{b}")
            for b in range(SIMHASH_BITS)]
    per_doc = hv.groupBy("doc_id").agg(*aggs)
    out = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        out = term if out is None else out + term
    return per_doc.select("doc_id", out.cast("long").alias("simhash"))
