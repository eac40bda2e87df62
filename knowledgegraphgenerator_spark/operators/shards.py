"""Training-shard materialization: deterministic shard assignment and
GPT-style sequence packing, both engine-exact (no RNG, no hash function
the DuckDB oracle lacks).

The last mile of a curation pipeline is writing the surviving documents
as N balanced training shards, with documents packed into fixed-token
training sequences. Two operators:

  * assign_shards       shard = pmod(pmod(id, P) * 48271, n_shards) —
                        the same overflow-free MINSTD modular scramble
                        as mod_stratified_sample (curation.py), so the
                        assignment is uniform-ish, reproducible on any
                        engine, and independent of row order/partitioning.
  * pack_sequences      concat-and-chunk packing (the standard LM
                        pretraining batching: concatenate the shard's
                        token stream, cut fixed-size windows — see e.g.
                        the GPT-2/3 training setup, Brown et al. 2020
                        §2.3): documents are laid out in deterministic
                        (doc_id) order within each shard; a document's
                        pack is the window containing its FIRST token,
                        pack_id = (cumulative_tokens_before) div budget.
                        Offset-based assignment is exactly expressible
                        as a window cumsum in BOTH Spark and DuckDB —
                        no sequential greedy state — at the cost that a
                        pack's doc-level token total may overrun the
                        budget by at most one document's tail (which
                        concat-and-chunk training splits across
                        sequence boundaries anyway).

Scale shape: ONE shuffle on the shard key; within a shard the layout
window (partitionBy(shard) orderBy(doc_id)) is sequential per shard by
construction — that is what "a shard is a file" means — and shard
count is chosen so a shard is file-sized (10^4-10^5 shards at 100 TB,
each 100 MB-10 GB), so per-shard sequential work is bounded and the
shards themselves are the parallelism. The subsequent
partitionBy(shard) write needs no further repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PRIME = 1_000_000_007


def assign_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Add a ``shard`` column in [0, n_shards): deterministic MINSTD
    scramble of the id — uniform-ish, engine-exact (the oracle spells
    pmod as ``((x % P) + P) % P``), overflow-free over full int64
    including negative xxhash64 ids."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        "shard",
        F.pmod(
            F.pmod(F.col(id_col), F.lit(_PRIME)) * F.lit(48271),
            F.lit(n_shards),
        ).cast("long"),
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "shard",
) -> DataFrame:
    """Concat-and-chunk packing within each shard: documents in
    deterministic ``id_col`` order; ``n_tokens`` = whitespace token
    count; ``pack_id`` = (tokens before this doc in the shard) div
    ``budget_tokens`` — the fixed-size window containing the document's
    first token. Zero-token documents are dropped (they occupy no
    window). Returns (shard, pack_id, doc_id, n_tokens, start_offset).
    """
    if budget_tokens <= 0:
        raise ValueError(
            f"budget_tokens must be positive, got {budget_tokens}"
        )
    toks = df.select(
        shard_col,
        id_col,
        F.size(
            F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
        ).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.select(
        shard_col,
        id_col,
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
            "start_offset"
        ),
    ).withColumn(
        "pack_id",
        F.expr(f"start_offset div {budget_tokens}").cast("long"),
    )
