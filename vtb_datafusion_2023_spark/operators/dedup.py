"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard (north-star extensions; BASELINE.json).

Scale design (the whole point of these operators):

- Exact dedup is a hash-groupBy — one shuffle on the content hash.
- Naive near-dup is O(n^2) pairs; MinHash-LSH banding reduces it to
  candidates that collide in >= 1 band: shingle -> K permuted min-hashes ->
  B bands of R rows -> band-bucket join.  All hashing is JVM-side
  (xxhash64 + affine permutations under a Mersenne prime) over array
  columns — no Python, no UDF, one shuffle per band join.
- SimHash packs a document into one 64-bit signature; near-dup candidates
  share at least one of C chunk prefixes (pigeonhole: hamming <= k with C
  chunks guarantees a matching chunk when k < C), then exact hamming
  verifies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1  # 31-bit domain: affine products stay < 2^63 (ANSI-safe)


def exact_dedup(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Exact duplicate clustering: md5 over the content columns; keeps the
    minimum id as the cluster representative (hash-groupBy A-style)."""
    key = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    return (
        df.withColumn("content_key", key)
        .groupBy("content_key")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, " ")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(grams)


def minhash_signature(shingles: Column, num_perm: int = 64, seed: int = 1) -> Column:
    """K permuted min-hashes over the shingle set, fully JVM-side.

    h_i(s) = (a_i * h(s) + b_i) mod p with p = 2^31-1 (Mersenne), h(s) =
    xxhash64 folded into [0, p), and a_i, b_i derived deterministically
    from ``seed``.  The 31-bit domain keeps every product < 2^62, safe
    under Spark's default ANSI overflow checking.  Signature element i is
    min over shingles; nested array lambdas keep it one projection.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: F.pmod(
                    (F.pmod(i * 40503 + F.lit(seed * 7919 + 1), F.lit(MERSENNE_P)) + 1)
                    * F.pmod(F.xxhash64(s), F.lit(MERSENNE_P))
                    + (i * 2654435761 + 7) % MERSENNE_P,
                    F.lit(MERSENNE_P),
                ),
            )
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    The band join only ever touches colliding buckets — at 100 TB the
    candidate set is ~linear in true duplicates, not O(n^2).
    """
    rows = num_perm // bands
    # Consumed twice (signature aggregation + pair verification) but NOT
    # cached: materializing shingle arrays into the block manager measured
    # slower than recomputing the split (A/B at sf0.1: 3.0s cached vs 2.1s
    # recomputed).  Revisit for corpora where shingling dominates.
    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_n).alias("_sh"),
    )

    # Signatures via explode + 64 codegen'd min-aggregates: higher-order
    # array lambdas are interpreted row-at-a-time in Spark, so folding the
    # permutations inside an array-transform is ~10x slower than hashing
    # each shingle once (one exploded long column) and letting whole-stage
    # codegen evaluate the affine permutations columnar.  One shuffle on
    # the doc id (bounded groups).
    seed_ = 1  # matches minhash_signature's derivation
    hashed = base.select("_id", F.explode("_sh").alias("_s")).select(
        "_id", F.pmod(F.xxhash64("_s"), F.lit(MERSENNE_P)).alias("_h")
    )
    perms = []
    for i in range(num_perm):
        a_i = (i * 40503 + seed_ * 7919 + 1) % MERSENNE_P + 1
        b_i = (i * 2654435761 + 7) % MERSENNE_P
        perms.append(
            F.min(F.pmod(F.lit(a_i) * F.col("_h") + F.lit(b_i), F.lit(MERSENNE_P))).alias(
                f"_mh{i}"
            )
        )
    sigs = hashed.groupBy("_id").agg(*perms)

    # band rows carry only (id, band, bucket) — never the shingle arrays —
    # so the self-join shuffles narrow rows and candidate pairs dedupe on
    # two longs before any array work.
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(*[F.col(f"_mh{b * rows + j}") for j in range(rows)]).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("_id", F.explode(band_structs).alias("_b")).select(
        "_id", F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket")
    )

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    sh = base.select("_id", "_sh")
    pairs = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text: Column | str, bits: int = 64) -> Column:
    """64-bit SimHash of the token multiset: for each bit position, sum
    +/-1 over token hashes; the bit is set where the sum is positive.

    Bit positions are Python ints (shift amounts must be literals in the
    DataFrame API), so this generates ``bits`` aggregate expressions over
    one shared token-hash array — still a single projection, no shuffle.
    The signature assembles via bitwise OR (overflow-free for bit 63).
    """
    from functools import reduce as _reduce

    c = F.col(text) if isinstance(text, str) else text
    tok_hashes = F.transform(F.split(c, " "), lambda t: F.xxhash64(t))

    def bit_expr(b: int) -> Column:
        mask = F.shiftleft(F.lit(1).cast("long"), b)
        vote = F.aggregate(
            tok_hashes,
            F.lit(0).cast("long"),
            lambda a, h: a + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        return F.when(vote > 0, mask).otherwise(F.lit(0).cast("long"))

    return _reduce(lambda x, y: x.bitwiseOR(y), [bit_expr(b) for b in range(bits)])


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8, chunks: int = 4
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via the chunk
    pigeonhole: candidates must share one of ``chunks`` 16-bit chunks.
    (Guaranteed complete when max_hamming < chunks; here it is a recall
    heuristic matching common practice.)"""
    bits_per = 64 // chunks
    sh = df.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("_sh"))
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(cidx).alias("chunk"),
                F.shiftright(F.col("_sh"), cidx * bits_per)
                .bitwiseAND(F.lit((1 << bits_per) - 1))
                .alias("ckey"),
            )
            for cidx in range(chunks)
        ]
    )
    chunked = sh.select("_id", "_sh", F.explode(chunk_structs).alias("_c")).select(
        "_id", "_sh", F.col("_c.chunk").alias("chunk"), F.col("_c.ckey").alias("ckey")
    )
    l, r = chunked.alias("l"), chunked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.ckey") == F.col("r.ckey"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sh").alias("sh_a"),
            F.col("r._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above ``threshold``,
    via shingle explode + self-join (the exact/baseline path; MinHash-LSH
    is the scale path — this one is O(sum of posting-list^2)).
    """
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(word_shingles(text_col, n)).alias("_s")
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, (F.col("l._s") == F.col("r._s")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
