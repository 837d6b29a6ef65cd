"""Distributed byte-pair-encoding vocabulary learning.

The tokenizer-training half of an LLM data pipeline: learn the merge
table from corpus statistics. Classic BPE (Sennrich et al., 2016) is
an inherently sequential loop — each round merges the most frequent
adjacent symbol pair — but each ROUND is embarrassingly parallel, and
that is what matters at 100 TB:

- the corpus collapses ONCE to the word-frequency vocab (one shuffle;
  at web scale the distinct-word table is millions of rows — big
  enough to want a cluster, small enough to iterate on);
- each round explodes adjacent pairs from the vocab's symbol arrays,
  aggregates pair counts weighted by word frequency (one shuffle over
  the VOCAB, never the corpus), takes the argmax via TakeOrdered, and
  rewrites only the vocab rows containing the merged pair;
- like k-means centers (``similarity.kmeans_centroids``), the single
  winning pair per round is inherently driver-side MODEL state — the
  one-row collect is the algorithm, not a driver funnel.

Determinism: ties break on (count desc, pair lexicographic), so the
learned merge table is a pure function of the corpus — verified
symbol-for-symbol against a reference implementation in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from big_data_flight_analytics_spark.cache import loop_checkpoint, loop_confs
from big_data_flight_analytics_spark.operators.text import tokens

# The tiny-loop conf pin lives in cache.loop_confs (shared with the
# exact-grain Lloyd trainer); kept under the old private name for the
# learner call sites and tests.
_loop_confs = loop_confs

END = "</w>"

# Separator for the wrapped-string word form: every symbol rides as
# "\x1fsym\x1f", so a merge of the ADJACENT pair (a, b) is the literal
# replace "\x1fa\x1f\x1fb\x1f" -> "\x1fab\x1f" — string replace scans
# left-to-right without overlap, which IS greedy BPE merging. The same
# encoding drives the DuckDB oracle (plans/extension_queries._bpe_sql),
# so Spark and the oracle execute literally the same algorithm.
SEP = "\x1f"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (symbol-array, frequency) vocab: the BPE working set.

    Words start as character sequences with the end-of-word marker —
    the standard formulation, so merges never cross word boundaries.
    Tokens containing the internal separator (U+001F, a control char no
    text corpus legitimately embeds) would corrupt the wrapped-string
    merge encoding, so they fail loud in-plan rather than merging
    wrongly.
    """
    guard = F.assert_true(
        ~F.contains(F.col("w"), F.lit(SEP)),
        F.lit(
            "word_vocab: token contains the U+001F separator reserved "
            "by the BPE merge encoding"
        ),
    )
    words = docs.select(
        F.explode(tokens(text_col)).alias("w")
    ).filter(F.col("w") != "")
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.when(
                guard.isNull(),
                F.concat(F.split(F.col("w"), ""), F.array(F.lit(END))),
            ).alias("syms"),
            "freq",
        )
    )


def _wrap(syms) -> "F.Column":  # noqa: F821
    """array<string> -> the sep-wrapped word string."""
    return F.concat(F.lit(SEP), F.concat_ws(SEP + SEP, syms), F.lit(SEP))


def _unwrap(ws) -> "F.Column":  # noqa: F821
    """Inverse of ``_wrap`` (ws is a Column)."""
    return F.split(
        F.substr(ws, F.lit(2), F.length(ws) - 2), SEP + SEP
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = vocab.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").alias("n")
    )


def _merge_pair(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite ``[.., a, b, ..] -> [.., ab, ..]`` — fully native.

    Left-to-right greedy merging looks like it needs imperative code
    (it is order-dependent, which ``transform()`` cannot express), but
    on the sep-wrapped string form it is ONE literal ``replace``:
    ``replace`` scans left-to-right and never re-matches inside a
    replacement, exactly the BPE merge semantics (equivalence to the
    sequential rewrite pinned by TestBpe's reference differential).
    Native string ops keep the whole learning loop JVM-side — the
    former Arrow mapInPandas paid a python-worker round-trip per merge
    round, the dominant per-round cost at small vocab sizes.
    """
    pat = F.lit(SEP + a + SEP + SEP + b + SEP)
    rep = F.lit(SEP + a + b + SEP)
    return vocab.select(
        _unwrap(F.replace(_wrap(F.col("syms")), pat, rep)).alias("syms"),
        "freq",
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Stops early when no pair reaches ``min_count``. Each round
    localCheckpoints the (small) vocab so the lineage never compounds
    across rounds — the same loop discipline as connected components
    and PageRank.

    Scale honesty: rounds are sequential (three tiny jobs each), so
    this shape suits vocabularies of hundreds-to-thousands of merges;
    a production 30k-merge tokenizer wants ``learn_bpe_merges_batched``
    (top-k DISJOINT pairs per round, cutting rounds ~k-fold at slight
    fidelity cost) — the per-round dataflow is identical.
    """
    vocab = word_vocab(docs, text_col).transform(loop_checkpoint)
    # pin loop-frame partitioning to the AQE-sized materialized vocab
    # (1 task at test scale, proportional at cluster scale) — without
    # this every round fans the tiny vocab across the default shuffle
    # width and pays 32x the task/python-worker startup for no work.
    # The pin covers the per-round SHUFFLE width too (the pair-count
    # aggregate), same discipline as the connected-components and
    # PageRank loops: the loop runs ~3 tiny jobs per merge, so
    # scheduling latency — not data volume — is the round cost, and
    # 32-way shuffles of a kilobyte-scale vocab tripled the measured
    # per-round time at sf0.1.
    spark = docs.sparkSession
    nparts = max(1, vocab.rdd.getNumPartitions())
    merges: list[tuple[str, str]] = []
    with _loop_confs(spark, nparts):
        for _ in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(
                    F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_count:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            vocab = (
                _merge_pair(vocab, a, b)
                .coalesce(nparts)
                .transform(loop_checkpoint)
            )
    return merges


def segment_with_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge table to one word (greedy, in merge order)
    — the reference tokenizer, used to validate learned tables and to
    spot-check segmentations. Production tokenization would ship the
    merge table to a tokenizer library; the TABLE is the artifact this
    module produces."""
    syms = list(word) + [END]
    for a, b in merges:
        res = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def tokenize_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to the corpus: the serving half.

    Output: (id_col, bpe_tokens array<string>, n_bpe_tokens). The merge
    table ships to executors inside the Arrow-batched closure (tables
    are KBs — broadcast-by-closure is the right size class), each
    batch memoizes per distinct word, and no shuffle is introduced —
    tokenization stays a map-only pass at any corpus size.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("bpe_tokens", ArrayType(StringType()), False),
            StructField("n_bpe_tokens", LongType(), False),
        ]
    )

    def apply(it):
        memo: dict[str, list[str]] = {}
        for pdf in it:
            toks_col, counts = [], []
            for text in pdf["__text"]:
                toks: list[str] = []
                for w in (text or "").lower().split():
                    seg = memo.get(w)
                    if seg is None:
                        seg = segment_with_merges(w, merges)
                        memo[w] = seg
                    toks.extend(seg)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pdf.assign(bpe_tokens=toks_col, n_bpe_tokens=counts)[
                [id_col, "bpe_tokens", "n_bpe_tokens"]
            ]

    return docs.select(
        F.col(id_col), F.col(text_col).alias("__text")
    ).mapInPandas(apply, schema=out_schema)


def _merge_disjoint_pairs(
    vocab: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Apply several SYMBOL-DISJOINT merges in one projection.

    Disjointness (no symbol appears in two selected pairs) means the
    pairs' occurrences cannot overlap, so a chain of literal replaces
    over the sep-wrapped form equals applying the pairs sequentially in
    any order (pinned by TestBpeBatched against per-pair application).
    A merged symbol cannot spawn a false match for a later pair in the
    chain: patterns align on the separator, merged symbols contain
    none, and this round's pairs predate the round's new symbols.
    Fully native — one map-only pass, no Python workers.
    """
    ws = _wrap(F.col("syms"))
    for a, b in pairs:
        ws = F.replace(
            ws,
            F.lit(SEP + a + SEP + SEP + b + SEP),
            F.lit(SEP + a + b + SEP),
        )
    return vocab.select(_unwrap(ws).alias("syms"), "freq")


def learn_bpe_merges_batched(
    docs: DataFrame,
    n_merges: int,
    batch_k: int = 8,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Batched BPE: merge the top-k DISJOINT pairs per round.

    The production variant named by ``learn_bpe_merges``: a 30k-merge
    tokenizer at 100 TB cannot afford 30k sequential rounds, but the
    counts of symbol-disjoint pairs don't interact within a round, so
    merging several at once cuts rounds ~k-fold while keeping every
    per-round dataflow identical (pair-count aggregate -> top-k to the
    driver as model state -> one vocab rewrite pass).

    Selection: scan the round's pairs in classic order (count desc,
    pair lexicographic) and keep each pair whose symbols are unseen in
    this round's selection — so batch_k=1 reduces EXACTLY to
    ``learn_bpe_merges`` (pinned by test), and larger k deviates from
    classic BPE only where classic would have re-counted between
    adjacent merges (the standard fidelity trade, cf. SentencePiece's
    queued variants; deviation measured in TestBpeBatched).

    Determinism: same corpus -> same merge list, any partitioning —
    selection is a pure function of the exact integer pair counts.
    """
    vocab = word_vocab(docs, text_col).transform(loop_checkpoint)
    spark = docs.sparkSession
    nparts = max(1, vocab.rdd.getNumPartitions())
    merges: list[tuple[str, str]] = []
    with _loop_confs(spark, nparts):
        while len(merges) < n_merges:
            # over-fetch: disjoint filtering can reject up to half the
            # scanned prefix (each kept pair blocks at most its own two
            # symbols), so 3x the remaining budget keeps one round from
            # starving without shipping the whole pair table
            want = min(n_merges - len(merges), batch_k)
            top = (
                _pair_counts(vocab)
                .filter(F.col("n") >= min_count)
                .orderBy(
                    F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .limit(3 * want)
                .collect()
            )
            if not top:
                break
            used: set[str] = set()
            picked: list[tuple[str, str]] = []
            for r in top:
                a, b = r["a"], r["b"]
                if a in used or b in used:
                    continue
                picked.append((a, b))
                used.update((a, b))
                if len(picked) == want:
                    break
            merges.extend(picked)
            vocab = (
                _merge_disjoint_pairs(vocab, picked)
                .coalesce(nparts)
                .transform(loop_checkpoint)
            )
    return merges
