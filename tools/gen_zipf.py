"""Zipfian-vocabulary documents fixture for the RAW near-dup pair heads.

The driver's synthetic ``documents.parquet`` has a 31-word vocabulary, so
UNIGRAM containment/Jaccard over it is near-all-pairs — a data artifact
that left ``dd_containment`` / ``dd_ngram_jaccard`` correctness-only
(their benchable ``*_planted`` twins carry the bench).  This tool
generates a REALISTIC text corpus the raw heads can be timed on
(VERDICT r8 item 4): heavy-tailed zipfian token frequencies (the regime
the PPJoin prefix filter is designed for — a few stop-word-like tokens
in every posting list, a long tail of rare discriminative tokens) plus a
controlled planted near-duplicate rate so the true answer is known-shape
and linear in the corpus.

Deterministic (fixed numpy PCG64 seed): re-running produces byte-stable
token sequences, so recorded bench numbers stay comparable across
rounds and both engines read the identical corpus.

Corpus model:
  - vocabulary ``--vocab`` (default 20k) words ``w0..w{V-1}``, rank r
    drawn with p(r) proportional to 1/(r+1)^1.07 (measured-web-text-ish
    exponent; ~45% of tokens land in the top 100 ranks, ~20% past rank
    2000 — every doc shares stopwords, near-dup evidence lives in the
    tail, exactly the prefix-filter regime);
  - doc length lognormal(mean~110 tokens) clipped to [20, 400];
  - 10% of base docs (doc_id % 10 == 0) get a planted near-duplicate
    under ``doc_id + 10_000_000``: the first 92% of its tokens.  On
    DISTINCT unigrams that makes containment(copy->orig) = 1.0 and
    containment(orig->copy) / Jaccard ~ 0.93-1.0 — above both head
    thresholds (0.9 / 0.8), so every planted pair is a true positive;
  - lang/source columns follow the driver fixture's value sets so the
    schema is drop-in (``oracle_check.py --sf <dir>`` replays the heads'
    oracle SQL over the same parquet).

Usage:
    python tools/gen_zipf.py --dst /root/repo/.benchdata/zipf0.1 --docs 5000
    python tools/gen_zipf.py --dst /root/repo/.benchdata/zipf1 --docs 50000 --vocab 100000
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

PLANTED_OFFSET = 10_000_000
SEED = 20260816
# splittable-layout contract (guide §6): scans split at row-group
# granularity, so the fixture must carry many small row groups.  ensure()
# treats any existing file with a bigger first row group as stale.
_ROW_GROUP_SIZE = 256
ZIPF_S = 1.07
KEEP_FRAC = 0.92

LANGS = ["en", "zh", "de", "fr", "es", "ru"]
SOURCES = [f"src{i}" for i in range(8)]


def build(docs: int, vocab: int, seed: int = SEED):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    lengths = np.clip(
        np.rint(np.exp(rng.normal(4.5, 0.55, size=docs))).astype(np.int64), 20, 400
    )
    tok_ranks = rng.choice(vocab, size=int(lengths.sum()), p=p)
    offs = np.concatenate(([0], np.cumsum(lengths)))

    doc_ids, texts = [], []
    for i in range(docs):
        toks = tok_ranks[offs[i] : offs[i + 1]]
        doc_ids.append(i)
        texts.append(" ".join(f"w{r}" for r in toks))
        if i % 10 == 0:  # planted near-duplicate: first 92% of tokens
            keep = max(1, int(len(toks) * KEEP_FRAC))
            doc_ids.append(i + PLANTED_OFFSET)
            texts.append(" ".join(f"w{r}" for r in toks[:keep]))
    n = len(doc_ids)
    langs = [LANGS[d % len(LANGS)] for d in doc_ids]
    sources = [SOURCES[d % len(SOURCES)] for d in doc_ids]
    n_chars = [len(t) for t in texts]
    return {
        "doc_id": np.asarray(doc_ids, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": sources,
        "n_chars": np.asarray(n_chars, dtype=np.int64),
    }, n


def ensure(dst: str, docs: int, vocab: int = 20000, seed: int = SEED) -> str:
    """Idempotent: generate ``dst/documents.parquet`` if absent.

    Layout-self-invalidating (ADVICE r10): a fixture generated before the
    splittable 256-row-group layout (r10) is regenerated in place —
    content is seed-deterministic and byte-identical, only the row-group
    framing changes, so stale .benchdata caches cannot silently keep the
    one-task-per-scan layout the r10 numbers were measured against."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(dst, "documents.parquet")
    if os.path.exists(path):
        if pq.ParquetFile(path).metadata.row_group(0).num_rows <= _ROW_GROUP_SIZE:
            return path
        print(f"gen_zipf: stale single-row-group layout at {path} — regenerating",
              file=sys.stderr)

    cols, n = build(docs, vocab, seed)
    os.makedirs(dst, exist_ok=True)
    tbl = pa.table(cols)
    # Small row groups (~256 docs / ~64 KB) make the single fixture file
    # SPLITTABLE: parquet scans parallelize at row-group granularity, and
    # one 1.4 MB row group pins every pre-shuffle stage (shingling, md5
    # banding) to ONE task no matter how many cores the session has
    # (guide §6 file layout; measured r10: dd_lsh_recall_eval 17.8 ->
    # 8.9 s at zipf0.1 x 32 cores from this line alone).  Row CONTENT is
    # unchanged — same docs, same order, same seed.
    pq.write_table(tbl, path + ".tmp", row_group_size=_ROW_GROUP_SIZE)
    os.replace(path + ".tmp", path)
    # stderr, not stdout: bench.py's contract is ONE JSON line on stdout
    print(f"gen_zipf: wrote {n} docs -> {path}", file=sys.stderr)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", required=True)
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--vocab", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    ensure(args.dst, args.docs, args.vocab, args.seed)


if __name__ == "__main__":
    main()
