"""Byte-pair-encoding merge training, Spark-first.

BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table, not the
raw corpus: the corpus-sized work is one distributed word count; every
merge iteration then operates on the vocabulary-sized (word, freq,
symbols) table — at 100 TB the word count is the only big job, and the
iteration table is millions of rows regardless of corpus bytes.

Shape per iteration:
1. adjacent symbol pairs exploded from the symbol arrays, weighted by
   word frequency — groupBy(pair) sum, map-side combined;
2. argmax pair (ties to the lexicographically smallest — stated, so the
   training is deterministic on any engine/partitioning);
3. merge that pair inside every word's symbol array — one Arrow-batched
   pandas UDF pass over the vocab table (left-to-right, non-overlapping,
   the reference semantics).

The merge list IS the tokenizer artifact. Iterative fit -> no
single-SQL oracle (rows-only contract); pinned against a pure-Python
reference implementation in pytest, word-for-word.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _merge_symbols(symbols: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b."""
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_freq_table(
    df: DataFrame, text_col: str = "text", end_mark: str = "</w>"
) -> DataFrame:
    """(word, freq, symbols) — the distributed pass. Symbols start as
    the word's characters plus an end-of-word marker (the Sennrich
    convention that lets merges learn suffixes)."""
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    freqs = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    sym = F.concat(
        F.split(F.regexp_replace(F.col("word"), "(.)", "$1\x1f"), "\x1f").cast(
            "array<string>"
        ),
        F.array(F.lit(end_mark)),
    )
    # regexp split leaves a trailing "" element; drop empties
    sym = F.filter(sym, lambda s: s != "")
    return freqs.select("word", "freq", sym.alias("symbols"))


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    vocab_partitions: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn the first ``n_merges`` BPE merges; returns
    [(left, right, pair_freq), ...] in merge order.

    ``vocab_partitions`` sizes the iteration table's layout: the word
    count shrinks the corpus to vocabulary cardinality, so iterating at
    the scan's partition count just pays empty-task overhead per merge
    (measured 2x end-to-end at sf0.1). Scale it with vocab size
    (millions of words -> tens of partitions), not corpus size."""
    vocab = word_freq_table(df, text_col).coalesce(max(1, vocab_partitions)).persist()
    merges: list[tuple[str, str, int]] = []
    current = vocab
    for _ in range(n_merges):
        pairs = (
            current.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("symbols") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("symbols") - 1),
                            lambda i: F.struct(
                                F.element_at("symbols", i).alias("a"),
                                F.element_at("symbols", i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("pf"))
        )
        top = pairs.orderBy(
            F.col("pf").desc(), F.col("p.a").asc(), F.col("p.b").asc()
        ).limit(1).collect()
        if not top or top[0]["pf"] is None:
            break
        a, b, pf = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["pf"])
        merges.append((a, b, pf))

        def apply_merge(batches, a=a, b=b):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.copy()
                pdf["symbols"] = [
                    _merge_symbols(list(s), a, b) for s in pdf["symbols"]
                ]
                yield pdf

        prev = current
        current = current.mapInPandas(
            apply_merge, schema="word string, freq long, symbols array<string>"
        ).persist()
        current.count()  # materialize so the next iteration reads, not replays
        if prev is not vocab:
            prev.unpersist()
    if current is not vocab:
        current.unpersist()  # the last iteration's frame must not leak
    vocab.unpersist()
    return merges


def bpe_train_reference(texts: list[str], n_merges: int = 8):
    """Pure-Python Sennrich BPE on the same word-frequency semantics —
    the parity oracle for ``bpe_train``."""
    from collections import Counter

    freqs = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) + ["</w>"] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freqs[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), pf = best
        merges.append((a, b, pf))
        vocab = {w: _merge_symbols(s, a, b) for w, s in vocab.items()}
    return merges
