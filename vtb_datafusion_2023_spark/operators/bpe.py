"""Byte-pair encoding (Sennrich et al., ACL'16): a REAL trained subword
tokenizer for corpus token accounting — not the regex approximation in
``text.with_token_count``.

Training is the classic greedy loop: count adjacent symbol pairs over a
word-frequency dictionary, merge the most frequent pair (ties break to
the lexicographically smallest pair — fully deterministic, no RNG),
repeat.  It runs driver-side on a seeded hash-ordered sample
(`bpe_train`) or on an embedded seed vocabulary (`SEED_MERGES`) — a BPE
merge table is KBs of broadcast state however big the corpus is.

Applying a merge table is sequential non-overlapping left-to-right
replacement over a delimited symbol string, one ``replace`` per merge in
merge order.  Each symbol is wrapped in its OWN separator pair
(``\\x01 sym \\x01``) so adjacent pair patterns share no characters —
with a shared single separator, consecutive matches in a run eat each
other's boundary and ``aaaa`` mis-encodes as ``[aa, a, a]``; with
per-symbol wrapping, ``replace`` is exactly canonical greedy BPE
(``[aa, aa]``).  Both ``str.replace`` and SQL ``replace`` implement the
same scan, so the distributed apply (dictionary trick + Arrow batches)
is bitwise-replayable by a generated chain of ``replace`` calls in the
DuckDB oracle (suite ``text_bpe_tokens``).  The separator byte is
stripped from input words first (it does not occur in text).

Scale shape of ``bpe_token_count``: tokenize to words (codegen) ->
distinct words (ONE shuffle, vocabulary-sized) -> per-unique-word merge
loop in ``mapInPandas`` (each word encoded once, not once per
occurrence) -> broadcast the (word, n_subtokens) dictionary back onto
the long form -> per-doc integer sum.  At 100 TB the heavy operand is
the word explode; the Python stage touches only the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for symbols, n in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def bpe_train_from_counts(
    word_counts: dict[str, int], n_merges: int = 100
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a word-frequency dict.
    Deterministic: ties on pair frequency break to the smallest pair."""
    vocab = {tuple(w): int(n) for w, n in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best_n = max(counts.values())
        best_pair = min(p for p, n in counts.items() if n == best_n)
        if best_n < 2:
            break
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best_pair[0]
                    and symbols[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_sample: int = 2000,
    seed: int = 11,
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Train merges on a seeded hash-ordered document sample
    (partition-layout-independent, same device as ``pq_train_codebooks``)."""
    rows = (
        df.select(id_col, text_col)
        .orderBy(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), F.col(id_col))
        .limit(max_sample)
        .collect()
    )
    counts: dict[str, int] = {}
    for r in rows:
        for w in (r[1] or "").lower().split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return bpe_train_from_counts(counts, n_merges)


SEP = "\x01"


def bpe_apply_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with the replace-chain semantics (see module doc)."""
    word = word.replace(SEP, "")
    s = "".join(f"{SEP}{c}{SEP}" for c in word)
    for a, b in merges:
        s = s.replace(f"{SEP}{a}{SEP}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}")
    return [t for t in s.split(SEP) if t]


# An embedded seed vocabulary (common-English word frequencies) so a
# deterministic merge table exists WITHOUT data access — the suite oracle
# is generated from these merges at import time; real pipelines train on
# their corpus with `bpe_train`.
_SEED_TEXT = (
    "the of and to in is that it was for on are as with his they at be this have "
    "from or one had by word but not what all were when your can said there use an "
    "each which she do how their if will up other about out many then them these so "
    "some her would make like him into time has look two more write go see number "
    "way could people my than first water been call who oil its now find long down "
    "day did get come made may part over new sound take only little work know place "
    "year live me back give most very after thing our just name good sentence man "
    "think say great where help through much before line right too mean old any same "
    "tell boy follow came want show also around form three small set put end does "
    "another well large must big even such because turn here why ask went men read "
    "need land different home us move try kind hand picture again change off play "
    "spell air away animal house point page letter mother answer found study still "
    "learn should america world"
)
SEED_COUNTS: dict[str, int] = {}
for _rank, _w in enumerate(_SEED_TEXT.split()):
    SEED_COUNTS[_w] = len(_SEED_TEXT.split()) - _rank  # Zipf-ish ranks
SEED_MERGES: list[tuple[str, str]] = bpe_train_from_counts(SEED_COUNTS, 100)


def bpe_replace_chain_sql(word_expr: str, merges: list[tuple[str, str]]) -> str:
    """The merge loop as nested SQL ``replace`` calls over the
    separator-wrapped symbol string — identical semantics to
    ``bpe_apply_word`` in any engine with left-to-right non-overlapping
    ``replace`` (Spark, DuckDB, Postgres...).  Returns an expression
    whose value is the encoded string; each subword carries exactly two
    separator bytes, so the token count is
    ``(length(s) - length(replace(s, chr(1), ''))) / 2``."""
    w = f"replace({word_expr}, chr(1), '')"
    chain = (
        f"array_to_string(list_transform(range(1, length({w}) + 1), "
        f"i -> chr(1) || substr({w}, i, 1) || chr(1)), '')"
    )

    def lit(sym: str) -> str:
        return f"chr(1) || '{sym}' || chr(1)"

    for a, b in merges:
        chain = f"replace({chain}, {lit(a)} || {lit(b)}, {lit(a + b)})"
    return chain


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-document subword token counts under a trained merge table."""
    import pandas as pd
    from pyspark.sql import types as T

    mg = merges if merges is not None else SEED_MERGES
    words = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w")
    ).filter(F.col("_w") != "")
    per_word = words.groupBy(id_col, "_w").agg(F.count(F.lit(1)).alias("_n"))
    vocab = per_word.select("_w").distinct()
    b = df.sparkSession.sparkContext.broadcast(list(mg))
    schema = T.StructType(
        [
            T.StructField("_w", T.StringType(), False),
            T.StructField("_sub", T.LongType(), False),
        ]
    )

    def run(batches):
        merges_v = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "_w": pdf["_w"],
                    "_sub": [len(bpe_apply_word(w, merges_v)) for w in pdf["_w"]],
                }
            )

    encoded = vocab.mapInPandas(run, schema=schema)
    return (
        per_word.join(F.broadcast(encoded), "_w")
        .groupBy(id_col)
        .agg(F.sum(F.col("_n") * F.col("_sub")).cast("bigint").alias(out_col))
    )
