"""BPE tokenizer training + encoding over a Spark corpus.

The scale shape real BPE trainers use (SentencePiece/GPT-2 style): the
corpus reduces to a WORD HISTOGRAM first — one map-side-combined
explode/groupBy pass — because merge statistics only depend on
(word, count), never on word positions. The histogram is Zipf-bounded
(distinct words ≪ corpus; further capped by ``min_freq``/``max_words``),
so it collects to the driver as metadata, merges train locally in the
classic deterministic loop, and the learned ranks broadcast back for an
Arrow-batched encode pass with per-batch word caching (each distinct word
in a batch is segmented once, re-used for every occurrence).

Everything is deterministic: ties in pair frequency break lexicographically,
so the same corpus always yields the same vocabulary on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["word_histogram", "train_bpe_merges", "bpe_segment_udf",
           "bpe_token_stats"]

_WS = r"\s+"


def word_histogram(df: DataFrame, text_col: str = "text",
                   min_freq: int = 1, max_words: int | None = None
                   ) -> DataFrame:
    """(word, n) counts over whitespace tokens — ONE shuffle, map-side
    combined. ``min_freq`` drops the long tail (rare words contribute no
    merge statistics worth their histogram rows); ``max_words`` caps the
    histogram with a deterministic top-k (count desc, word asc — plans as
    TakeOrderedAndProject, never a global sort)."""
    words = (df.select(F.explode(
                F.split(F.trim(F.col(text_col)), _WS)).alias("word"))
               .where(F.col("word") != "")
               .groupBy("word").agg(F.count("*").alias("n"))
               .where(F.col("n") >= min_freq))
    if max_words is not None:
        words = words.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
    return words


def train_bpe_merges(word_counts: list[tuple[str, int]],
                     n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training on a word histogram (driver-side — the
    histogram is metadata, not data). Each round merges the most frequent
    adjacent symbol pair (ties broken lexicographically, so training is
    fully deterministic); stops early when no pair repeats."""
    segs: dict[str, list[str]] = {w: list(w) for w, _ in word_counts}
    counts = dict(word_counts)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            c = counts[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        pair, freq = min(pair_counts.items(),
                         key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append(pair)
        joined = pair[0] + pair[1]
        for w, syms in segs.items():
            i, out = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == pair[0]
                        and syms[i + 1] == pair[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def _segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy apply: repeatedly merge the lowest-rank adjacent
    pair until none of the remaining pairs is in the merge table."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_segment_udf(merges: list[tuple[str, str]]) -> Column:
    """Returns a factory: pass a text column, get its BPE token array.
    The merge table rides the UDF closure (broadcast by Spark); each Arrow
    batch keeps a word→tokens cache so every distinct word is segmented
    once per batch regardless of frequency."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def f(s):
        import pandas as pd
        cache: dict[str, list[str]] = {}
        out = []
        for t in s:
            toks: list[str] = []
            for w in (t or "").split():
                seg = cache.get(w)
                if seg is None:
                    seg = _segment(w, ranks)
                    cache[w] = seg
                toks.extend(seg)
            out.append(toks)
        return pd.Series(out)

    return f


def bpe_token_stats(df: DataFrame, merges: list[tuple[str, str]],
                    id_col: str = "doc_id", text_col: str = "text"
                    ) -> DataFrame:
    """Per-document tokenization outcome: whitespace word count, non-space
    char count, BPE token count, and a round-trip check (concatenating each
    word's tokens must reconstruct the word — BPE is a segmentation, so
    this holds by construction and catches any kernel bug)."""
    seg = bpe_segment_udf(merges)
    toks = seg(F.col(text_col))
    words = F.filter(F.split(F.trim(F.col(text_col)), _WS),
                     lambda w: w != "")
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
         .alias("n_chars"),
        F.size(toks).alias("n_bpe_tokens"),
        (F.concat_ws("", toks) ==
         F.concat_ws("", words)).alias("roundtrip_ok"))
