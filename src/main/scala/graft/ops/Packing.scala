package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for training pipelines: assign every
  * document a position in the concatenated token stream of its shard and
  * derive which fixed-size training sequence(s) it lands in.
  *
  * This is the concat-and-chunk packing used by GPT-style pretraining
  * (concatenate documents in a deterministic order, cut the stream every
  * `budget` tokens; documents may straddle a cut — `spans` says across
  * how many sequences). It is fully declarative — one window cumsum —
  * unlike greedy no-straddle bin packing, whose close-bin-on-overflow
  * recursion is inherently sequential and neither window-expressible nor
  * shuffle-friendly; pipelines that need no-straddle semantics pad with
  * `budget - seq_offset` at consume time instead.
  *
  * Scale shape (100 TB): the window partitions by shard, so per-partition
  * sort state is a shard, not the corpus. Sharding IS the scale knob —
  * producers size shards (source buckets, hash buckets of doc id, date
  * partitions…) to bounded token volume, and packing parallelizes across
  * them; per-shard sequence ids are disambiguated downstream as
  * (shard, seq_id). An unsharded global pack would serialize into one
  * partition — deliberately not offered.
  */
object Packing {

  /** @param tokens per-document token count expression (e.g.
    *               [[TextAnalysis.tokenCount]] on the text column)
    * @return (shardCol, idCol, n_tokens, seq_id, seq_offset, spans):
    *         seq_id = index of the budget-sized sequence where the doc
    *         starts within its shard, seq_offset = token offset inside
    *         it, spans = how many sequences the doc touches (0 for
    *         empty docs)
    */
  def packSequences(df: DataFrame, idCol: String, shardCol: String,
                    tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val before = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // integral DIV, not `/`: Spark's `/` on longs is double division,
    // which loses exactness once a shard's cumulative offset passes 2^53
    df.select(col(shardCol), col(idCol), tokens.cast("long").as("n_tokens"))
      .withColumn("__off", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .select(col(shardCol), col(idCol), col("n_tokens"),
        expr(s"__off DIV $budget").as("seq_id"),
        (col("__off") % budget).as("seq_offset"),
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr(s"(__off + n_tokens - 1) DIV $budget")
            - expr(s"__off DIV $budget") + 1).as("spans"))
  }

  /** Length-bucketed dynamic batching for inference serving: bucket every
    * document by its padded length (next multiple of `widthTokens`, empty
    * docs promoted to one width), then cut each (shard, bucket) into
    * deterministic batches of exactly floor(maxBatchTokens / bucket_len)
    * rows (min 1), so the PADDED cost — rows × bucket length, what a
    * padded forward pass actually pays — never exceeds `maxBatchTokens`
    * for any multi-row batch.
    *
    * Length bucketing is the standard padding-waste fix: batching a
    * 4000-token doc with a 30-token doc pads the short one 130×; grouping
    * near-equal lengths first bounds waste to `widthTokens` per row.
    *
    * Scale shape: same discipline as [[packSequences]] — the only window
    * partitions by (shard, bucket), so sort state is one shard's bucket,
    * never the corpus; batch ids are per-(shard, bucket) and disambiguate
    * downstream as the triple. Everything else is per-row arithmetic.
    *
    * @return (shardCol, idCol, n_tokens, bucket_len, batch_id) — one row
    *         per document; bucket_len is the padded per-row cost,
    *         batch_id counts batches within (shard, bucket_len)
    */
  def lengthBatches(df: DataFrame, idCol: String, shardCol: String,
                    tokens: Column, widthTokens: Int,
                    maxBatchTokens: Int): DataFrame = {
    require(widthTokens > 0, "widthTokens must be positive")
    require(maxBatchTokens >= widthTokens,
      "maxBatchTokens must fit at least one widthTokens row")
    val bucketLen = greatest(
      expr(s"(n_tokens + ${widthTokens - 1}) DIV $widthTokens"), lit(1L)) *
      widthTokens
    val w = Window.partitionBy(col(shardCol), col("bucket_len"))
      .orderBy(col(idCol))
    df.select(col(shardCol), col(idCol), tokens.cast("long").as("n_tokens"))
      .withColumn("bucket_len", bucketLen)
      .withColumn("__rn", row_number().over(w).cast("long"))
      // capacity-based cut: exactly floor(budget / bucket_len) rows per
      // batch (min 1 — an over-budget doc gets its own batch), so
      // rows × bucket_len ≤ budget ALWAYS holds for multi-row batches.
      // A start-offset cut ((rn-1)·len DIV budget) would overpack
      // whenever bucket_len does not divide the budget (6 rows of 96
      // into a 512 budget = 576 padded tokens). Integral DIV throughout
      // (packSequences discipline): exact past 2^53.
      .withColumn("batch_id",
        expr(s"(__rn - 1) DIV greatest($maxBatchTokens DIV bucket_len, 1)"))
      .select(col(shardCol), col(idCol), col("n_tokens"),
        col("bucket_len"), col("batch_id"))
  }

  /** The per-sequence SEGMENT table over [[packSequences]]'s layout: one
    * row per (sequence, document) contact, with the token span
    * `[seg_start, seg_end)` the document occupies INSIDE that sequence —
    * exactly the metadata a trainer needs to build cross-document
    * attention / loss masks for packed sequences (each segment attends
    * only to itself). A document straddling sequences contributes one
    * row per touched sequence; empty documents contribute none; every
    * fully-covered sequence's segments tile `[0, budget)` exactly.
    *
    * Scale shape: [[packSequences]]'s one shard-keyed window plus a
    * map-side `explode` over each doc's spanned-sequence range — the
    * fan-out is ceil(n_tokens / budget) rows per doc, i.e. output ∝
    * corpus tokens / budget. No second shuffle.
    */
  def packSegments(df: DataFrame, idCol: String, shardCol: String,
                   tokens: Column, budget: Int): DataFrame = {
    val packed = packSequences(df, idCol, shardCol, tokens, budget)
      .filter(col("n_tokens") > 0)
      // global token offset reconstructs exactly (both terms integral)
      .withColumn("__off", col("seq_id") * budget + col("seq_offset"))
    packed
      .withColumn("seq",
        explode(sequence(col("seq_id"), col("seq_id") + col("spans") - 1)))
      .select(col(shardCol), col("seq").as("seq_id"), col(idCol),
        (greatest(col("__off"), col("seq") * budget) - col("seq") * budget)
          .as("seg_start"),
        (least(col("__off") + col("n_tokens"), (col("seq") + 1) * budget)
          - col("seq") * budget).as("seg_end"))
  }
}
