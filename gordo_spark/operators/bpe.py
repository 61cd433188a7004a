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
    # ONE job per iteration: the argmax collect both picks the merge and
    # materializes the previous round's persisted merge pass (persist is
    # lazy), so the superseded frame is released one round late instead
    # of paying a dedicated count() job to materialize eagerly —
    # measured ~2x on gate time (scheduler overhead dominates: the
    # iteration table is vocabulary-sized, not corpus-sized)
    pending: DataFrame | None = None
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
        # `current` is now materialized in the cache — the frame it
        # superseded last round can be released without forcing a replay
        if pending is not None:
            pending.unpersist()
            pending = None
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
        if prev is not vocab:
            pending = prev
    if pending is not None:
        pending.unpersist()
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


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_mark: str = "</w>",
) -> DataFrame:
    """Apply a trained merge list (``bpe_train`` output) to encode text —
    the corpus-sized tokenization pass of the trained tokenizer.

    Returns (id, n_words, n_tokens, tokens array<string>): each word is
    split to characters (+ end marker) and the merges replay in TRAINING
    ORDER via a rank table, exactly the Sennrich apply rule — so
    ``bpe_encode(train_corpus)``'s token stream is consistent with the
    learned vocabulary.

    Scale shape: the merge-rank dict (vocab-sized, the tokenizer
    artifact) ships in the task closure like any tokenizer model; the
    encode is one Arrow-batched mapInPandas pass — no shuffle, no
    joins. Per word the replay is O(len * applied-merges), paid ONCE
    per DISTINCT word per task (Zipf makes the memo hit rate enormous;
    the memo is bounded by the task's vocabulary slice). NULL text
    encodes to zero tokens — read_jsonl_corpus yields null data columns
    for corrupt lines, and one bad row must not kill a corpus export.
    """
    import pandas as pd

    rank = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    memo: dict[str, list[str]] = {}

    def encode_word(word: str) -> list[str]:
        hit = memo.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [end_mark]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            a, b = syms[best_i], syms[best_i + 1]
            syms = _merge_symbols(syms, a, b)
        memo[word] = syms
        return syms

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks, n_words = [], []
            for text in pdf["_t"]:
                words = (
                    [] if text is None else [w for w in text.split(" ") if w]
                )
                out: list[str] = []
                for w in words:
                    out.extend(encode_word(w))
                toks.append(out)
                n_words.append(len(words))
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"],
                    "n_words": n_words,
                    "n_tokens": [len(t) for t in toks],
                    "tokens": toks,
                }
            )

    return (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .mapInPandas(
            encode,
            schema="_id long, n_words int, n_tokens int, tokens array<string>",
        )
        .select(F.col("_id").alias(id_col), "n_words", "n_tokens", "tokens")
    )


def bpe_encode_reference(texts: list[str], merges, end_mark: str = "</w>"):
    """Pure-Python apply (training-order replay) — parity oracle."""
    rank = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out = []
    for t in texts:
        toks: list[str] = []
        for w in t.split(" "):
            if not w:
                continue
            syms = list(w) + [end_mark]
            while len(syms) > 1:
                cands = [
                    (rank[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in rank
                ]
                if not cands:
                    break
                r, i = min(cands)
                syms = _merge_symbols(syms, syms[i], syms[i + 1])
            toks.extend(syms)
        out.append(toks)
    return out
