"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design:
- exact dedup = hash-groupBy on a content fingerprint, canonical row =
  min(id) — deterministic, one shuffle on the fingerprint;
- n-gram Jaccard = inverted-index join (explode shingles, equi-join on
  shingle, count shared) — never an O(n^2) cross join; the shingle join
  key distributes well because shingles are high-cardinality;
- MinHash-LSH = signature -> bands -> bucket equi-join -> exact verify.
  Candidate generation cost scales with bucket collisions, not n^2;
- SimHash = per-doc 32-bit signature; near-dup candidates via
  chunk-match (pigeonhole) equi-joins, verified by hamming distance.

All signatures are built from md5, which exists bit-identically in both
Spark and DuckDB, so MinHash/SimHash are fully oracle-checkable:
- MinHash permutation j of a shingle = md5(j || '|' || shingle); the
  per-permutation min is taken over the 32-char lowercase hex strings —
  lexicographic order on fixed-width lowercase hex equals numeric order
  on the 128-bit digests, so this is a valid min-wise hash family.
- SimHash token bits come from the md5 hex digits via ascii arithmetic
  (both engines: value = ascii < 58 ? ascii-48 : ascii-87), bit k of the
  hash = bit (k mod 4) of hex digit (k div 4).

Skew safety at 100-TB scale (both are recall trades, mirrored exactly in
the oracle SQL so parity is preserved):
- empty-shingle docs are dropped BEFORE MinHash banding (they can never
  pass the Jaccard verify, and a shared sentinel bucket would otherwise
  generate d*(d-1)/2 candidates over all short docs);
- ``max_band_df`` / ``max_chunk_df`` caps drop LSH buckets whose
  population exceeds the cap before the pair join, bounding per-bucket
  candidate work exactly like ``max_df`` does for the shingle posting
  join in ``ngram_jaccard_pairs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.functions.text import rolling_fingerprint


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by content fingerprint; keep canonical min(id) + dup count."""
    return (
        df.select(rolling_fingerprint(F.col(text_col)).alias("fingerprint"), id_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # two-step: materialize the token array, THEN build shingles from the
    # column reference (inline split would re-tokenize per element_at)
    from big_data_flight_analytics_spark.operators.text import shingle_expr, tokens

    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return toked.select(
        F.col(id_col), shingle_expr(F.col("__toks"), n).alias("shingles")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """All doc pairs (a < b) with n-gram-shingle Jaccard >= threshold.

    Inverted-index join: docs sharing zero shingles never meet, so the
    candidate set is sparse. Output: doc_a, doc_b, jaccard (4dp).

    ``max_df`` (scale lever): shingles occurring in more than ``max_df``
    documents are excluded from CANDIDATE GENERATION only — a hot
    shingle in d docs contributes d*(d-1)/2 candidate pairs (quadratic
    in corpus growth when the shingle space saturates, measured 25x
    runtime at 10x corpus) but almost no signal. Jaccard is then
    verified on the FULL shingle sets via array_intersect, so emitted
    values are exact; only pairs whose every shared shingle is hot can
    be missed (recall trade, standard in dedup pipelines).
    """
    sh = _shingled(df, id_col, text_col, n)
    posting = sh.select(F.col(id_col), F.explode("shingles").alias("sh"))

    if max_df is None:
        sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
        a = posting.select(F.col(id_col).alias("doc_a"), "sh")
        b = posting.select(F.col(id_col).alias("doc_b"), "sh")
        inter = (
            a.join(b, "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
        jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        return (
            inter.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("jaccard", F.round(jac, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    # all joins/shuffles run over 8-byte xxhash64 shingle ids instead of
    # ~20-byte strings (intersection COUNTS are identical — an in-pair
    # collision needs two distinct shingles at the same 64-bit value,
    # p ~ 80^2/2^64 — so Jaccard values and oracle parity are unchanged)
    hsh = sh.select(
        F.col(id_col),
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("shingles"),
    )
    posting_h = hsh.select(F.col(id_col), F.explode("shingles").alias("sh"))
    rare = (
        posting_h.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("sh")
    )
    capped = posting_h.join(rare, "sh")
    a = capped.select(F.col(id_col).alias("doc_a"), "sh")
    b = capped.select(F.col(id_col).alias("doc_b"), "sh")
    candidates = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(candidates, hsh, id_col, threshold)


def _verify_jaccard(
    candidates: DataFrame, sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard over full shingle arrays for candidate pairs.

    ``sh`` may carry raw shingle strings or hashed shingle ids — only
    intersection/union counts enter the result.
    """
    sh_a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("__sh_a"))
    sh_b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("__sh_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size("__sh_a") + F.size("__sh_b") - inter
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_signature(shingles: Column, num_perm: int) -> Column:
    """array<string> of ``num_perm`` min-hashes over the shingle set.

    Permutation j hashes each shingle with md5(j || '|' || shingle); the
    min is the lexicographic min of the 32-char lowercase hex digests,
    which equals the numeric min of the 128-bit values — a valid
    min-wise hash family that DuckDB reproduces bit-identically
    (list_min(list_transform(shingles, s -> md5(j || '|' || s)))).
    Callers must filter out empty shingle sets first (array_min of an
    empty array is NULL).
    """
    sigs = [
        F.array_min(
            F.transform(
                shingles,
                lambda s, j=j: F.md5(F.concat(F.lit(f"{j}|"), s)),
            )
        )
        for j in range(num_perm)
    ]
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    max_band_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    bands x rows layout (rows = num_perm / bands): docs agreeing on ALL
    rows of any band become candidates (equi-join on the band hash —
    never a cross join); candidates are then verified against the exact
    n-gram Jaccard so output precision is 100%.

    Skew safety: docs with zero shingles (< n tokens) are dropped before
    banding — they cannot pass the verify, and a shared empty-signature
    bucket would otherwise pair every short doc with every other.
    ``max_band_df`` additionally drops band buckets holding more than
    that many docs (a bucket of d docs costs d*(d-1)/2 candidate pairs;
    boilerplate-heavy corpora concentrate there) — a recall-only trade,
    emitted pairs stay exact.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    sh = _shingled(df, id_col, text_col, n).filter(F.size("shingles") > 0)
    sig = sh.select(
        F.col(id_col), _minhash_signature(F.col("shingles"), num_perm).alias("sig")
    )
    band_rows = []
    for bi in range(bands):
        band_key = F.md5(
            F.concat_ws(
                "|",
                F.lit(str(bi)),
                *[F.element_at("sig", bi * rows + r + 1) for r in range(rows)],
            )
        )
        band_rows.append(sig.select(F.col(id_col), band_key.alias("band_key")))
    posting = band_rows[0]
    for extra in band_rows[1:]:
        posting = posting.unionAll(extra)

    if max_band_df is not None:
        small = (
            posting.groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_band_df)
            .select("band_key")
        )
        posting = posting.join(small, "band_key")

    a = posting.select(F.col(id_col).alias("doc_a"), "band_key")
    b = posting.select(F.col(id_col).alias("doc_b"), "band_key")
    candidates = (
        a.join(b, "band_key").filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify ONLY the candidates: exact Jaccard over full shingle arrays
    # — candidate-count work, not the full inverted-index pair join
    return _verify_jaccard(candidates, sh, id_col, threshold)


def _hex_digit(h: Column, i: int) -> Column:
    """Value 0-15 of the (1-based) i-th char of a lowercase hex string.

    ascii arithmetic — '0'-'9' are 48-57, 'a'-'f' are 97-102 — so both
    Spark and DuckDB compute the identical integer without any
    engine-specific hex parser.
    """
    a = F.ascii(F.substring(h, i, 1))
    return F.when(a < 58, a - 48).otherwise(a - 87)


def simhash_signature(text_col: str = "text", bits: int = 32) -> Column:
    """SimHash: sign-sum of per-token hash bits -> integer signature.

    Token hash = md5(token); bit k of the hash is bit (k mod 4) of hex
    digit (k div 4) — cross-engine (see module docstring). For each bit
    k, sum +1/-1 over tokens; signature bit k = 1 iff the sum is
    positive. One aggregate pass per bit over the token-hash array
    (shift amounts must be Python ints for shiftright), all JVM-side.
    """
    from big_data_flight_analytics_spark.operators.text import tokens

    assert bits <= 128
    hashes = F.transform(tokens(text_col), lambda t: F.md5(t))

    def bit_merge(k: int):
        # binary lambda factory: pyspark counts lambda params, so the
        # bit index must be closed over, not a default arg
        def merge(acc: Column, h: Column) -> Column:
            bit = F.shiftright(_hex_digit(h, k // 4 + 1), k % 4).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return merge

    sig = F.lit(0).cast("long")
    for k in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0), bit_merge(k))
        sig = sig + F.when(bit_sum > 0, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(id, sim) signatures via explode + hash-aggregate — single pass.

    Equivalent to ``simhash_signature`` but token hashes are computed
    once (explode), the hex digits of each md5 are decoded once into
    ``bits/4`` small ints, and the per-bit sign-sums run as one
    vectorized hash aggregation instead of ``bits`` array-fold passes;
    one shuffle on the doc id. Duplicate tokens weigh by multiplicity,
    matching the per-token fold of the column-expression form.
    """
    from big_data_flight_analytics_spark.operators.text import tokens

    assert bits % 4 == 0 and bits <= 128
    n_digits = bits // 4
    toked = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
    hashed = toked.select(F.col(id_col), F.md5("__t").alias("__h"))
    digits = hashed.select(
        F.col(id_col),
        *[_hex_digit(F.col("__h"), i + 1).alias(f"__d{i}") for i in range(n_digits)],
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"__d{k // 4}"), k % 4).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"__b{k}")
        for k in range(bits)
    ]
    agg = digits.groupBy(id_col).agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for k in range(bits):
        sig = sig + F.when(
            F.col(f"__b{k}") > 0, F.lit(1 << k).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sig.alias("sim"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole: with ``chunks`` signature chunks and max_hamming <
    chunks, any qualifying pair agrees exactly on >= 1 chunk -> candidate
    generation is ``chunks`` equi-joins on chunk value, then an exact
    hamming verify via bit_count(xor).

    ``max_chunk_df`` (skew cap): near-zero signatures from short docs
    concentrate in few (chunk, value) buckets, and a bucket of d docs
    costs d*(d-1)/2 join pairs; buckets holding more than the cap are
    dropped before the pair join. Recall-only trade — a qualifying pair
    is missed only if EVERY chunk it agrees on is hot.
    """
    assert max_hamming < chunks
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    sig = simhash_signatures(df, id_col, text_col, bits)
    postings = []
    for ci in range(chunks):
        chunk_val = F.shiftright(F.col("sim"), ci * chunk_bits).bitwiseAND(F.lit(mask))
        postings.append(
            sig.select(
                F.col(id_col),
                "sim",
                F.lit(ci).alias("ck"),
                chunk_val.alias("cv"),
            )
        )
    posting = postings[0]
    for extra in postings[1:]:
        posting = posting.unionAll(extra)

    if max_chunk_df is not None:
        small = (
            posting.groupBy("ck", "cv")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_chunk_df)
            .select("ck", "cv")
        )
        posting = posting.join(small, ["ck", "cv"])

    a = posting.select(
        F.col(id_col).alias("doc_a"), F.col("sim").alias("sim_a"), "ck", "cv"
    )
    b = posting.select(
        F.col(id_col).alias("doc_b"), F.col("sim").alias("sim_b"), "ck", "cv"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["ck", "cv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
