"""Round-11 probe (VERDICT r10 directive #7): the Bloom bitmap literal's
per-use cost at 2^17..2^21 WORDS — the split-string array literal
(HEAD: ``cast(split('w0,w1,...') as array<bigint>)``) vs a denser
binary-string literal reassembled to the same array at fold time:
``transform(sequence(0,n-1), i -> cast(conv(hex(substr(unhex('<hex>'),
i*8+1, 8)), 16, -10) as bigint))`` — one unhex fold, byte-indexed
binary slices, ~55% less SQL text crossing py4j.

OUTCOME: NEGATIVE — the split-string literal wins at every size
(2^21 words: ~2.1-3.1 s/use vs ~4.6-5.2 s/use): the per-word
hex+conv reassembly at fold time costs more than split's single
pass, and the text-size saving doesn't show (one py4j string either
way). A first hex-STRING arm (substr over the hex text, no unhex) was
also built and measured QUADRATIC — substr on a multi-MB string scans
UTF-8 char boundaries per call (2^14: 11.3 s, 2^16: 180 s) — recorded
here as the sharper trap. The split-string literal stays.

Per arm and size: 3 fresh-plan uses (parse + analyze + fold + 1-row
membership execute — the per-query cost the r10 matrix measured).
Arrays asserted equal. Writes BLOOM_LITERAL_AB_r11.json.

Usage: python tools/run_r11_bloom_literal_ab.py
"""

from __future__ import annotations

import json
import os
import random
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def split_expr(words):
    return F.expr(
        "cast(split('" + ",".join(map(str, words)) + "', ',') as array<bigint>)"
    )


def binary_expr(words):
    hx = b"".join(struct.pack(">q", w) for w in words).hex()
    n = len(words)
    return F.expr(
        f"transform(sequence(0, {n - 1}), i -> "
        f"cast(conv(hex(substr(unhex('{hx}'), i * 8 + 1, 8)), 16, -10) as bigint))"
    )


def main() -> None:
    from medvedi_spark.session import get_spark

    spark = get_spark("r11-bloom-literal-ab")
    spark.sparkContext.setLogLevel("ERROR")
    one = spark.range(1)

    rng = random.Random(42)
    out: dict = {}
    for exp in (17, 19, 21):
        n = 1 << exp
        words = [rng.getrandbits(64) - (1 << 63) for _ in range(n)]
        # correctness: both literals fold to the same array (first/last)
        row = one.select(
            F.element_at(split_expr(words), 1).alias("s1"),
            F.element_at(split_expr(words), n).alias("sn"),
            F.element_at(binary_expr(words), 1).alias("b1"),
            F.element_at(binary_expr(words), n).alias("bn"),
        ).first()
        assert row["s1"] == row["b1"] == words[0], exp
        assert row["sn"] == row["bn"] == words[-1], exp

        sizes = {}
        for arm, make in (("split", split_expr), ("binary", binary_expr)):
            walls = []
            for rep in range(3):
                spark.sparkContext.setJobDescription(f"bloom-lit:{arm}:2^{exp}:rep{rep}")
                t0 = time.perf_counter()
                # fresh plan per rep = the per-query re-analysis/re-fold cost
                one.select(F.element_at(make(words), 1).alias("w")).collect()
                walls.append(round(time.perf_counter() - t0, 3))
            sizes[arm] = {"use_walls_s": walls}
            print(f"2^{exp} {arm}: {walls}", flush=True)
        out[f"words_2^{exp}"] = sizes
    out["verdict"] = (
        "negative: split-string literal fastest at every size; binary "
        "reassembly ~2x slower at 2^21; hex-string substr arm quadratic "
        "(UTF-8 boundary scan per substr) — see module docstring"
    )
    with open(os.path.join(ROOT, "BLOOM_LITERAL_AB_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote BLOOM_LITERAL_AB_r11.json")


if __name__ == "__main__":
    main()
