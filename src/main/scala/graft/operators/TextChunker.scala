package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking for training-data pipelines: split each document
  * into fixed-size token windows with configurable overlap (the unit of
  * work for tokenizer/packing stages downstream).
  *
  * Relational shape: tokenize once per doc (staged projection), compute
  * the chunk count arithmetically, explode chunk indices, slice the
  * materialized token array per chunk — a narrow 1→N generator with no
  * shuffle at all; output size is input tokens × (1 + overlap/stride).
  */
object TextChunker {

  /** @param chunkTokens window size in tokens (> overlap)
    * @param overlap     tokens shared between consecutive chunks
    * @return one row per chunk: id, chunk_id (0-based), chunk_text,
    *         chunk_tokens
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    // coalesce: a NULL text must behave like an empty document (one empty
    // chunk), not silently vanish through null-propagating array ops
    val tokenized = df.select(col(idCol),
      TextFunctions.tokens(coalesce(col(textCol), lit(""))).as("__toks"))
    val withN = tokenized.withColumn("__n", size(col("__toks")))
    // 1 chunk for short docs; else 1 + ceil((n - chunk) / stride)
    val nChunks = when(col("__n") <= chunkTokens, 1L).otherwise(
      ceil((col("__n") - chunkTokens).cast("double") / stride).cast("long")
        + 1L)
    withN
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens),
          col("__n") - col("chunk_id") * stride).cast("long")
          .as("chunk_tokens"))
  }

  /** Sequence packing: assign token-counted items to ≤`maxTokens` context
    * windows by exclusive running sum (`pack_id = floor(cum_before /
    * maxTokens)`) — the deterministic, order-preserving first-fit
    * approximation used at scale (items are never split; a pack may
    * overflow by at most one item, the price of a single-pass streaming
    * assignment).
    *
    * `partitionCols` shard the packing: empty means one global sequence
    * (fine for an oracle query, a global sort at scale); at 100 TB pass a
    * shard key so each shard packs independently with a per-key sort
    * only.
    */
  def pack(df: DataFrame, orderCols: Seq[Column], tokensCol: String,
      maxTokens: Int, partitionCols: Seq[Column] = Nil): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols: _*)
    val w = w0.orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum",
        sum(col(tokensCol)).over(w) - col(tokensCol))
      .withColumn("pack_id", floor(col("__cum") / maxTokens).cast("long"))
      .drop("__cum")
  }
}
