"""Round-10 optimization pins.

The md5 bit-word parse (operators.dedup._md5_bit_words/_md5_bit) replaced
the per-bit substring+instr hex probes inside both simhash chunk builders
(r10 guide §1.2 per-task work).  This differential pins the new shift+mask
derivation bit-for-bit against the historical per-digit form on real md5
digests, so a nibble-order or shift-offset regression cannot ship green.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_md5_bit_words_match_historical_digit_probes(spark):
    from vtb_datafusion_2023_spark.operators.dedup import _md5_bit, _md5_bit_words

    toks = spark.createDataFrame(
        [(w,) for w in ["alpha", "beta", "gamma", "", "0", "word#42", "ünïcode", "x" * 300]],
        "t string",
    ).withColumn("_h", F.md5("t"))

    hexv = "0123456789abcdef"

    def old_bit(p: int):
        j, k = divmod(p, 4)
        v = F.instr(F.lit(hexv), F.substring(F.col("_h"), j + 1, 1)) - 1
        return (F.floor(v / (1 << k)) % 2).cast("long")

    w1, w2 = _md5_bit_words(F.col("_h"))
    probed = toks.select(
        "t",
        *[old_bit(p).alias(f"o{p}") for p in range(64)],
        *[_md5_bit(w1, w2, p).alias(f"n{p}") for p in range(64)],
    ).collect()
    for row in probed:
        for p in range(64):
            assert row[f"o{p}"] == row[f"n{p}"], (row["t"], p)
