"""Distributed BPE tokenizer training — the first N merge steps.

Byte-pair encoding training is the canonical "iterate over the
VOCABULARY, not the corpus" distributed algorithm: the corpus is
collapsed once into a ``(word, freq)`` table (one shuffle over the
token stream), and every merge iteration after that touches only the
distinct-word table — pair counting is a map-side-combinable integer
aggregate weighted by ``freq``, and applying the chosen merge is a
narrow per-row fold.  At 100 TB the corpus pass happens exactly once;
the per-step cost is bounded by vocabulary size (millions), not
corpus size (trillions of tokens).  This is how production tokenizer
pipelines (HF tokenizers' trainer, SentencePiece's BPE mode) structure
the work, re-expressed as DataFrame plans.

Exact cross-engine semantics (the DuckDB oracle replays every step
bit-for-bit):

- a word's symbol state is a SPACE-SEPARATED string with a leading
  space (`` l o w``) — symbols are built from non-space token
  characters, and merged symbols are concatenations of them, so the
  space separator is unambiguous forever;
- pair counting follows the classic ``get_stats``: every adjacent
  symbol pair in every word counts, weighted by word frequency
  (overlapping repeats like ``a a a`` contribute (a,a) twice — the
  standard convention);
- the winning pair per step is ``ORDER BY count DESC, a ASC, b ASC
  LIMIT 1`` — a total deterministic order, no engine tie luck;
- the merge itself is a GREEDY LEFT-TO-RIGHT fold implemented as
  ``F.aggregate`` (Spark) / ``list_reduce`` (DuckDB) over the symbol
  list with a string accumulator: append each symbol, except when the
  accumulator ends with the complete symbol ``' '||a`` and the next
  symbol is ``b`` — then replace the tail with ``' '||a||b``.  The
  separator-bounded suffix test means ``a a a`` with pair (a,a)
  merges to ``aa a`` (not ``aa aa``), exactly the reference BPE
  behavior, and symbols that merely END with ``a`` can never
  false-match.

Both fold implementations are pure column expressions — no UDF, no
Python row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.materialize import materialize


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """Collapse the corpus to its ``(word, freq)`` vocabulary — the
    ONE corpus-sized pass.  Words are whitespace tokens; empty tokens
    from repeated spaces are dropped."""
    tok = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ).alias("word")
    )
    return tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))


def _spaced_symbols(word: Column) -> Column:
    # "low" -> " l o w": one space before every character
    return F.regexp_replace(word, "(.)", " $1")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the vocab, weighted by word
    frequency — a map-side-combinable integer aggregate."""
    pairs = words.filter(F.size("_syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(0, size(_syms) - 2),"
                " i -> struct(_syms[i] AS a, _syms[i + 1] AS b))"
            )
        ).alias("p"),
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
    return pairs.groupBy("a", "b").agg(F.sum("freq").alias("cnt"))


def bpe_train_steps(
    df: DataFrame,
    text_col: str,
    steps: int = 3,
    top: int = 5,
    materialize_mode: str = "eager",
) -> DataFrame:
    """Run the first ``steps`` BPE merges over the corpus; return the
    top-``top`` pair counts of EACH step (``step``, ``a``, ``b``,
    ``cnt``, ``merged``) — ``merged`` marks the pair the step actually
    merged (rank 1 under the deterministic order).

    The vocab table is materialized once per step (it is read by both
    the pair-count aggregate and the merge projection of the next
    step); each step's winning pair joins back in-plan as a one-row
    AQE-broadcast cross join — no driver collect in the loop.
    """
    words = word_freqs(df, text_col).withColumn(
        "_sym", _spaced_symbols(F.col("word"))
    ).select("freq", "_sym")
    words = materialize(words, materialize_mode)

    out: DataFrame | None = None
    for step in range(1, steps + 1):
        wsyms = words.withColumn(
            "_syms", F.filter(F.split(F.col("_sym"), " "), lambda x: x != "")
        )
        counts = _pair_counts(wsyms)
        # global-order window over the POST-AGGREGATE pair table —
        # bounded by (symbol vocabulary)^2 observed pairs, not corpus
        # or word-vocab size, so the single-partition sort is tiny
        w = Window.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        ranked = counts.withColumn("rk", F.row_number().over(w))
        step_rows = ranked.filter(F.col("rk") <= top).select(
            F.lit(step).alias("step"),
            "a",
            "b",
            "cnt",
            (F.col("rk") == 1).alias("merged"),
        )
        out = step_rows if out is None else out.unionByName(step_rows)
        if step < steps:
            winner = ranked.filter(F.col("rk") == 1).select(
                F.col("a").alias("_ma"), F.col("b").alias("_mb")
            )
            syms_col = F.filter(F.split(F.col("_sym"), " "), lambda x: x != "")
            merged_sym = F.aggregate(
                syms_col,
                F.lit(""),
                lambda acc, x: F.when(
                    (x == F.col("_mb"))
                    & acc.endswith(F.concat(F.lit(" "), F.col("_ma"))),
                    F.concat(
                        F.substring(
                            acc,
                            F.lit(1),
                            F.length(acc) - F.length(F.col("_ma")) - F.lit(1),
                        ),
                        F.lit(" "),
                        F.col("_ma"),
                        F.col("_mb"),
                    ),
                ).otherwise(F.concat(acc, F.lit(" "), x)),
            )
            words = materialize(
                words.crossJoin(F.broadcast(winner))
                .withColumn("_sym", merged_sym)
                .select("freq", "_sym"),
                materialize_mode,
            )
    return out
