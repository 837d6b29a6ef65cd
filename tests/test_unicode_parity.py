"""Cross-engine unicode parity study (r12 verdict stretch #8).

The hash-gate oracles mirror Spark's lower/trim/length/substring/md5
chain in DuckDB. All engine testdata is ASCII, where the chains are
trivially identical; this suite measures WHERE the agreement actually
ends on non-ASCII text and pins the boundary both ways:

AGREES (pinned to stay equal): code-point lengths, UTF-8 md5 bytes,
``\\s+`` tokenization, and char-trigram multisets for combining marks,
precomposed accents, Greek/Cyrillic, CJK (incl. no-space scripts),
Hangul, emoji with surrogate pairs / skin-tone modifiers / ZWJ
sequences, ligatures, fullwidth forms, and NBSP/ideographic spaces
(neither engine's ``\\s`` matches them — agreement by shared RE2/Java
ASCII-class behavior).

DIVERGES (pinned to keep diverging, so an engine upgrade that heals
it surfaces here): Spark ``lower`` is Java/ICU FULL case mapping —
context-sensitive and one-to-many; DuckDB ``lower`` is utf8proc
SIMPLE one-to-one mapping. Exactly two character classes differ:

1. Greek capital sigma in word-final position: Spark emits the final
   form (ς), DuckDB the medial (σ). Same length, different bytes.
2. Dotted capital I (U+0130, Turkish İ): Spark expands to ``i`` +
   combining dot (U+0307) — TWO code points; DuckDB maps to plain
   ``i`` — ONE. Lengths, grams, and hashes all shift.

Operational boundary (documented in operators/langid.py): every
text-family oracle is exact for text free of word-final Σ and U+0130.
Corpora containing them still produce deterministic results in each
engine — only the cross-engine differential weakens, and only on the
affected documents.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.langid import (
    LANGID_BUCKETS,
    _canonical,
    _grams_of,
)

AGREE_CASES = {
    "ascii": "Hello World",
    "accent_pre": "café au lait",          # precomposed é
    "accent_comb": "café au lait",        # e + combining acute
    "sharp_s": "STRASSE straße",           # ß lowers to itself
    "greek_medial": "Ελληνικά "
                    "κείμενο",
    "cyrillic": "русский "
                "текст",
    "cjk_no_spaces": "中文文本没有空格",
    "japanese": "日本語のテキスト",
    "korean": "한국어 텍스트",
    "emoji_modifier": "hello \U0001f44b\U0001f3fd world \U0001f30d",
    "emoji_zwj": "\U0001f468‍\U0001f469‍\U0001f467 family",
    "ligature": "ﬃ ligature",
    "fullwidth": "Ｓｐａｒｋ "
                 "ＦＵＬＬ",
    "nbsp_not_split": "a b c",
    "ideographic_space_not_split": "a　b c",
}
DIVERGE_CASES = {
    # word-final capital sigma: full mapping emits ς, simple emits σ
    "greek_final_sigma": "ΟΔΥΣΣΕΥΣ",
    # U+0130: full mapping expands to i + U+0307, simple maps to i
    "turkish_dotted_I": "İstanbul Iı İi",
}


@pytest.fixture(scope="module")
def parity(spark):
    """(name -> (len, canon, md5, ntok, trigrams)) per engine."""
    rows = sorted({**AGREE_CASES, **DIVERGE_CASES}.items())
    df = spark.createDataFrame(rows, "name string, text string")
    canon = df.select("name", _canonical("text").alias("s"))
    got_s = {}
    for r in canon.select(
        "name",
        F.length("s").alias("L"),
        F.col("s").alias("c"),
        F.md5("s").alias("h"),
        F.size(
            F.filter(F.split(F.col("s"), r"\s+"), lambda x: x != "")
        ).alias("ntok"),
        F.sort_array(_grams_of(F.col("s"), 3)).alias("g3"),
    ).collect():
        got_s[r["name"]] = (r["L"], r["c"], r["h"], r["ntok"], r["g3"])
    con = duckdb.connect()
    con.execute("CREATE TABLE t(name VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_d = {}
    for name, L, c, h, ntok, g3 in con.sql(r"""
        WITH n AS (SELECT name, trim(lower(coalesce(text, ''))) AS s FROM t)
        SELECT name, len(s), s, md5(s),
               len(list_filter(regexp_split_to_array(s, '\s+'),
                               x -> x <> '')),
               list_sort(CASE WHEN len(s) >= 3 THEN
                   list_transform(range(1, len(s) - 1), i -> s[i:i + 2])
                   ELSE [] END)
        FROM n
    """).fetchall():
        got_d[name] = (L, c, h, ntok, list(g3))
    return got_s, got_d


class TestUnicodeParity:
    def test_agreement_set_is_bit_exact(self, parity):
        got_s, got_d = parity
        diffs = {
            k: (got_s[k], got_d[k])
            for k in AGREE_CASES
            if got_s[k] != got_d[k]
        }
        assert diffs == {}, (
            "previously-agreeing unicode classes now diverge "
            f"(engine upgrade?): {diffs}"
        )

    def test_divergence_set_still_diverges_as_documented(self, parity):
        got_s, got_d = parity
        s, d = got_s["greek_final_sigma"], got_d["greek_final_sigma"]
        # same code-point length, different final character bytes
        assert s[0] == d[0]
        assert s[1].endswith("ς") and d[1].endswith("σ")
        assert s[2] != d[2]  # md5 differs -> hash gate would catch it
        s, d = got_s["turkish_dotted_I"], got_d["turkish_dotted_I"]
        # full mapping expands U+0130 -> 2 code points; simple -> 1
        assert s[0] == d[0] + 2  # the fixture has two U+0130
        assert "i̇" in s[1] and "i̇" not in d[1]
        assert s[4] != d[4]  # trigram multisets shift with the length

    def test_gram_hash_buckets_agree_on_the_agreement_set(
        self, spark, parity
    ):
        """The full langid feature chain (canonical -> trigram -> md5
        -> bucket) matches cross-engine on every agreeing class — the
        end-to-end contract the t20/i5 oracles rely on."""
        rows = sorted(AGREE_CASES.items())
        df = spark.createDataFrame(rows, "name string, text string")
        from big_data_flight_analytics_spark.operators.sampling import (
            md5_bucket,
        )

        canon = df.select("name", _canonical("text").alias("s"))
        got_s = {
            (r["name"], r["bucket"]): r["n"]
            for r in canon.select(
                "name", F.explode(_grams_of(F.col("s"), 3)).alias("g")
            )
            .groupBy(
                "name", md5_bucket(F.col("g"), LANGID_BUCKETS).alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t(name VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        got_d = {
            (name, bucket): n
            for name, bucket, n in con.sql(rf"""
                WITH n AS (
                    SELECT name, trim(lower(coalesce(text, ''))) AS s FROM t
                ), g AS (
                    SELECT name,
                           unnest(list_transform(range(1, len(s) - 1),
                                                 i -> s[i:i + 2])) AS g
                    FROM n WHERE len(s) >= 3
                )
                SELECT name,
                       CAST(('0x' || substring(md5(g), 1, 4)) AS BIGINT)
                           % {LANGID_BUCKETS} AS bucket,
                       COUNT(*) AS n
                FROM g GROUP BY 1, 2
            """).fetchall()
        }
        assert got_s == got_d


# ---------------------------------------------------------------------------
# NFC-lite (round 14): from pinned boundary to capability. The native
# literal-replace composition chain (functions/unicode.py) and its
# layered DuckDB mirror, pinned three ways: against unicodedata's NFC
# (ground truth on the covered subset), cross-engine by construction,
# and where it deliberately STOPS being NFC (non-ASCII bases, jamo).
# ---------------------------------------------------------------------------

import unicodedata

from big_data_flight_analytics_spark.functions.unicode import (
    NFC_LITE_PAIRS,
    nfc_lite,
    nfc_lite_sql_layers,
)

MULTILINGUAL_NFC = {
    "fra": "café déjà élève garçon être voilà",
    "deu": "über schön grüße mädchen läuft",
    "ces": "čaj děkuji žlutý přítel škola",
    "por": "ação õnibus irmã coração",
    "pol": "żółć gęślą jaźń łódź",  # ż/ó/ę/ą/ź via combining forms
    # capability step 2: non-Latin scripts with single-mark NFC pairs
    "rus": "ёлка подъём её семья",  # ё = е + diaeresis
    "ukr": "її українська мрія й",  # ї = і + diaeresis, й = и + breve
    "ell": "καφές ώρα εδώ ϊδέα",  # tonos + dialytika compositions
}


def _duck_nfc_lite(rows):
    """Run the layered DuckDB mirror over (id, text) rows."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    layers = nfc_lite_sql_layers("text")
    sql = f"WITH l0 AS (SELECT id, {layers[0]} AS s, nfc_normalize(text) AS fn FROM t)"
    for j, lay in enumerate(layers[1:], 1):
        sql += f", l{j} AS (SELECT id, {lay.format(col='s')} AS s, fn FROM l{j-1})"
    sql += f" SELECT id, s, fn FROM l{len(layers) - 1}"
    return {i: (s, fn) for i, s, fn in con.sql(sql).fetchall()}


class TestNfcLite:
    def test_pair_table_is_the_unicode_composition_data(self):
        # every pair round-trips through unicodedata; nothing invented
        for seq, composed in NFC_LITE_PAIRS:
            assert unicodedata.normalize("NFC", seq) == composed
            assert unicodedata.normalize("NFD", composed) == seq
        assert len(NFC_LITE_PAIRS) > 100  # the table stays generated

    def test_composes_nfd_text_to_nfc(self, spark):
        rows = [
            (i, unicodedata.normalize("NFD", t))
            for i, t in enumerate(sorted(MULTILINGUAL_NFC.values()))
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r["id"]: r["s"]
            for r in df.select(
                "id", nfc_lite(F.col("text")).alias("s")
            ).collect()
        }
        for i, nfd_text in rows:
            assert got[i] == unicodedata.normalize("NFC", nfd_text)

    def test_duckdb_mirror_is_bit_exact_and_full_nfc_on_the_subset(
        self, spark
    ):
        rows = [
            (i, unicodedata.normalize("NFD", t))
            for i, t in enumerate(sorted(MULTILINGUAL_NFC.values()))
        ] + [(99, "plain ascii stays put")]
        df = spark.createDataFrame(rows, "id long, text string")
        got_s = {
            r["id"]: r["s"]
            for r in df.select(
                "id", nfc_lite(F.col("text")).alias("s")
            ).collect()
        }
        for i, (mirror, full_nfc) in _duck_nfc_lite(rows).items():
            assert mirror == got_s[i]  # by-construction equality
            assert mirror == full_nfc  # == real NFC on the subset

    def test_outside_the_subset_diverges_from_full_nfc_as_documented(
        self, spark
    ):
        """Pinned NON-goals: composition onto non-ASCII bases (ä+macron
        -> ǟ) and Hangul jamo syllables are full-NFC territory; the
        lite chain must leave them alone (an engine/library change
        that starts composing them surfaces here)."""
        cases = [
            (0, "ǟ"),   # a+diaeresis+macron: NFC -> ǟ (1 cp)
            (1, "가"),    # jamo G+A: NFC -> 가 (1 cp)
        ]
        df = spark.createDataFrame(cases, "id long, text string")
        got = {
            r["id"]: r["s"]
            for r in df.select(
                "id", nfc_lite(F.col("text")).alias("s")
            ).collect()
        }
        # lite composes the FIRST mark (ä) but cannot reach ǟ
        assert got[0] == "ǟ"
        assert unicodedata.normalize("NFC", cases[0][1]) == "ǟ"
        # jamo untouched; full NFC composes the syllable
        assert got[1] == cases[1][1]
        assert unicodedata.normalize("NFC", cases[1][1]) == "가"
        # and the DuckDB mirror diverges from nfc_normalize the same way
        for i, (mirror, full_nfc) in _duck_nfc_lite(cases).items():
            assert mirror == got[i]
            assert mirror != full_nfc

    def test_langid_gram_chain_unifies_encodings(self, spark):
        """The payoff: after nfc_lite, NFD- and NFC-encoded text hash
        to identical gram buckets — one logical term, one bucket."""
        from big_data_flight_analytics_spark.operators.sampling import (
            md5_bucket,
        )

        nfc_text = MULTILINGUAL_NFC["fra"]
        rows = [(0, nfc_text), (1, unicodedata.normalize("NFD", nfc_text))]
        df = spark.createDataFrame(rows, "id long, text string")
        canon = df.select(
            "id", nfc_lite(_canonical("text")).alias("s")
        )
        buckets = (
            canon.select(
                "id", F.explode(_grams_of(F.col("s"), 3)).alias("g")
            )
            .groupBy("id", md5_bucket(F.col("g"), LANGID_BUCKETS).alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_id = {}
        for r in buckets:
            by_id.setdefault(r["id"], {})[r["b"]] = r["n"]
        assert by_id[0] == by_id[1]
        # without nfc_lite the same two encodings split apart (the
        # motivating failure, pinned so it stays demonstrated)
        raw = (
            df.select("id", _canonical("text").alias("s"))
            .select("id", F.explode(_grams_of(F.col("s"), 3)).alias("g"))
            .groupBy("id", md5_bucket(F.col("g"), LANGID_BUCKETS).alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        raw_by_id = {}
        for r in raw:
            raw_by_id.setdefault(r["id"], {})[r["b"]] = r["n"]
        assert raw_by_id[0] != raw_by_id[1]


class TestWidthFold:
    """Capability step 3 (r15 VERDICT #8): fullwidth ASCII variants —
    the next measured gap after canonical composition. NFC leaves them
    alone (they are COMPATIBILITY variants), so nfc_lite correctly
    ignores them; width_fold is the separate opt-in preproc."""

    def test_pair_table_is_the_unicode_width_data(self):
        from big_data_flight_analytics_spark.functions.unicode import (
            WIDTH_FOLD_PAIRS,
        )

        # every pair IS the NFKC fold of that single code point, and
        # NFC (canonical) leaves every wide form untouched
        for wide, narrow in WIDTH_FOLD_PAIRS:
            assert unicodedata.normalize("NFKC", wide) == narrow
            assert unicodedata.normalize("NFC", wide) == wide
        assert len(WIDTH_FOLD_PAIRS) == 95  # 94 forms + ideographic sp

    def test_folds_fullwidth_to_ascii(self, spark):
        from big_data_flight_analytics_spark.functions.unicode import (
            width_fold,
        )

        rows = [
            (0, "Ｓｐａｒｋ　ＦＵＬＬ！", "Spark FULL!"),
            (1, "ｈｅｌｌｏ， ｗｏｒｌｄ", "hello, world"),
            (2, "mixed Ｗｉｄｔｈ 123 ４５６", "mixed Width 123 456"),
            (3, "中文ｔｅｘｔ混合", "中文text混合"),  # CJK untouched
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "id long, text string"
        )
        got = {
            r["id"]: r["s"]
            for r in df.select(
                "id", width_fold(F.col("text")).alias("s")
            ).collect()
        }
        for i, _, want in rows:
            assert got[i] == want

    def test_duckdb_mirror_is_bit_exact(self, spark):
        from big_data_flight_analytics_spark.functions.unicode import (
            width_fold,
            width_fold_sql_layers,
        )

        rows = [
            (0, "Ｓｐａｒｋ　ＦＵＬＬ！"),
            (1, "quote ＇ and ＂ forms"),  # escaping path
            (2, "ascii stays put"),
            (3, "중문 ｈａｌｆ混合 ３．１４"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got_s = {
            r["id"]: r["s"]
            for r in df.select(
                "id", width_fold(F.col("text")).alias("s")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        layers = width_fold_sql_layers("text")
        sql = f"WITH l0 AS (SELECT id, {layers[0]} AS s FROM t)"
        for j, lay in enumerate(layers[1:], 1):
            sql += (
                f", l{j} AS (SELECT id, {lay.format(col='s')} AS s "
                f"FROM l{j-1})"
            )
        sql += f" SELECT id, s FROM l{len(layers) - 1}"
        for i, s in con.sql(sql).fetchall():
            assert s == got_s[i]

    def test_langid_gram_chain_needs_the_fold_for_fullwidth(self, spark):
        """The measured gap, fixture-backed: WITHOUT width_fold the
        langid gram chain buckets fullwidth Latin disjointly from its
        ASCII twin (zero shared buckets — unrecognizable to ASCII-gram
        profiles); WITH the fold the bucket histograms are identical."""
        from big_data_flight_analytics_spark.operators.sampling import (
            md5_bucket,
        )
        from big_data_flight_analytics_spark.functions.unicode import (
            width_fold,
        )

        ascii_text = "the quick brown fox jumps over the lazy dog"
        wide_text = "".join(
            chr(ord(c) + 0xFEE0) if "!" <= c <= "~" else c
            for c in ascii_text
        )
        rows = [(0, ascii_text), (1, wide_text)]
        df = spark.createDataFrame(rows, "id long, text string")

        def buckets(frame):
            out = (
                frame.select(
                    "id", F.explode(_grams_of(F.col("s"), 3)).alias("g")
                )
                .groupBy(
                    "id", md5_bucket(F.col("g"), LANGID_BUCKETS).alias("b")
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            by_id = {}
            for r in out:
                by_id.setdefault(r["id"], {})[r["b"]] = r["n"]
            return by_id

        folded = buckets(
            df.select("id", width_fold(_canonical("text")).alias("s"))
        )
        assert folded[0] == folded[1]
        raw = buckets(df.select("id", _canonical("text").alias("s")))
        assert raw[0] != raw[1]
        # the gap is total at GRAM granularity (bucket ids can still
        # collide by md5-mod): no shared gram contains any foldable
        # ASCII character — the two encodings are disjoint everywhere
        # the fold has work to do
        grams = (
            df.select(
                "id",
                F.explode(
                    _grams_of(_canonical("text"), 3)
                ).alias("g"),
            )
            .collect()
        )
        g0 = {r["g"] for r in grams if r["id"] == 0}
        g1 = {r["g"] for r in grams if r["id"] == 1}
        assert all(
            not any("!" <= ch <= "~" for ch in g) for g in g0 & g1
        )
