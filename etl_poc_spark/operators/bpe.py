"""Distributed BPE (byte-pair-encoding) vocabulary training — the
iterative-algorithm tier next to operators/pagerank.py, and the training
loop whose single inner iteration queries/vocab_q.py::bpe_merge_candidates
already exposes.

Spark-first shape (classic Sennrich 2016 BPE re-expressed relationally):
training state is a SYMBOL TABLE over the distinct vocabulary —
(word, syms array<string>, freq) — never the corpus itself. Each
iteration:

  1. pair counts: explode adjacent symbol pairs weighted by word freq,
     groupBy(a, b) with map-side combine — shuffle volume is bounded by
     the live pair vocabulary, not corpus token count;
  2. winner: TakeOrderedAndProject(1) with a deterministic tie-break
     (max count, then lexicographic pair) — ONE row to the driver per
     iteration, the bounded scalar the merge decision inherently is;
  3. apply: a JVM-side aggregate() fold over each word's symbol array
     replaces non-overlapping (a, b) occurrences leftmost-first with the
     merged symbol — no Python UDF;
  4. checkpoint the new symbol table (pagerank-shaped: localCheckpoint
     by default, reliable `checkpoint_dir` opt-in for cluster fault
     tolerance), capping plan depth at one iteration.

At 100 TB the corpus contributes exactly ONE pass (the initial word
count); every iteration after that runs on vocabulary cardinality — the
same reduction every production BPE trainer uses, here as DataFrame ops.

The trained artifact (the ordered merge list) is n_merges rows — KB-sized,
same driver-traffic class as the IVF centroid models.

Reference parity: the reference has no tokenizer training; this extends
the engine's LLM-data-pipeline surface (SURVEY.md §7 training-data ops)
alongside vocab_q/tokenize_q.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Fold a symbol array left-to-right, replacing each non-overlapping
    adjacent (a, b) with the concatenated symbol — the standard greedy
    leftmost-first BPE merge application, as a pure JVM aggregate() HOF
    (composable: the input can itself be a previous apply_merge)."""
    merged = a + b

    def step(acc: Column, s: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def init_symbol_table(words: DataFrame, word_col: str = "word") -> DataFrame:
    """(word, syms, freq) over the DISTINCT vocabulary: syms starts as the
    word's character sequence; freq is the corpus occurrence count. This
    is the one corpus-cardinality pass of the whole training run."""
    return (
        words.groupBy(F.col(word_col).alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", F.split(F.col("word"), "").alias("syms"), "freq")
    )


def train_bpe(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train `n_merges` BPE merges over the word occurrences in `words`
    (one row per corpus token; duplicates ARE the frequency signal).

    Returns (merges, symtab): `merges` is the ordered list of
    (left, right, pair_count) decisions — the trained tokenizer artifact —
    and `symtab` the final (word, syms, freq) symbol table. Training
    stops early when no pair occurs twice (nothing left worth merging).

    checkpoint_dir: when set, per-iteration state checkpoints reliably to
    this fault-tolerant directory (survives executor loss); when None,
    executor-local checkpoint (fast, not fault-tolerant) — same
    trade-off as operators/pagerank.py.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    if checkpoint_dir is not None:
        words.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    symtab = _cut(init_symbol_table(words, word_col))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            symtab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
        )
        # ONE row to the driver: the merge decision (deterministic
        # tie-break so training is partition-independent)
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        symtab = _cut(
            symtab.select("word", apply_merge(F.col("syms"), a, b).alias("syms"), "freq")
        )
    return merges, symtab


def segment_expr(merges: list[tuple[str, str, int]], word_col: str = "word") -> Column:
    """Column expression segmenting a word into BPE tokens with a trained
    merge list — the inference side of train_bpe, usable on any
    corpus-sized frame. The merge list is a driver-side constant folded
    into the plan; each merge is one composed aggregate() fold, all
    JVM-side (no Python UDF, no join)."""
    out: Column = F.split(F.col(word_col), "")
    for a, b, _ in merges:
        out = apply_merge(out, a, b)
    return out
