package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign documents to
  * fixed-token-budget bins by contiguous greedy packing, the standard
  * pre-tokenization sharding step before examples are concatenated into
  * model-context-length sequences.
  *
  * A document's bin is `floor(preceding_token_sum / binTokens)` within its
  * partition (language here), i.e. documents fill bin 0 until the budget is
  * crossed, then bin 1, and so on — a single running-sum window per
  * partition. Integer-only, so any engine reproduces the assignment.
  *
  * Scale: one shuffle on the partition columns; the cumulative sum is a
  * sequential scan per partition value. A real 100 TB run packs per SHARD
  * (e.g. (lang, hash-bucket-of-id)) so no single partition serializes the
  * corpus — the operator takes arbitrary `partCols` for exactly that reason;
  * order within a partition is the deterministic id order.
  */
object Packing {

  /** Per-bin packing summary: (partition cols, bin_id, n_docs, n_tokens,
    * fill_ppm). `fill_ppm` = bin token mass as ppm of the budget — the
    * packing-efficiency metric (the last bin per partition underfills).
    */
  def packBins(df: DataFrame,
               idCol: String,
               textCol: String,
               binTokens: Long,
               partCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(idCol))
    val sized = df.select(
      (partCols.map(col) :+ col(idCol) :+
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("_nt")): _*)
    val binned = sized
      .withColumn("_cum",
                  sum(col("_nt")).over(w.rowsBetween(Window.unboundedPreceding,
                                                     Window.currentRow)))
      .withColumn("bin_id", expr(s"(_cum - _nt) DIV $binTokens"))
    binned
      .groupBy((partCols.map(col) :+ col("bin_id")): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"))
      .withColumn("fill_ppm", expr(s"(n_tokens * 1000000) DIV $binTokens"))
  }

  /** Fixed-window document chunking with overlap — the context-length
    * example generator: one chunk per window start (0, stride, 2·stride, …
    * while < n_tokens), each `chunkTokens` long except a trailing partial.
    * `stride < chunkTokens` overlaps consecutive chunks (training wants the
    * continuation context); `stride == chunkTokens` tiles.
    *
    * Pure per-row generate: tokens → posexplode(sequence) → slice. No
    * shuffle, no state — the 100 TB plan is scan-transform-write, and chunk
    * identity (`doc_id`, `chunk_id = start DIV stride`) is deterministic
    * wherever the row is processed.
    */
  def chunkDocs(df: DataFrame,
                idCol: String,
                textCol: String,
                chunkTokens: Int,
                strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
            "need 0 < stride <= chunk")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"),
              TextAnalysis.tokenCount(col(textCol)).cast("long").as("_n"))
      .filter(col("_n") > 0)
      .select(col(idCol), col("_t"), col("_n"),
              explode(sequence(lit(0L), col("_n") - 1, lit(strideTokens.toLong)))
                .as("chunk_start"))
      .select(
        col(idCol),
        expr(s"chunk_start DIV $strideTokens").as("chunk_id"),
        col("chunk_start"),
        least(lit(chunkTokens.toLong), col("_n") - col("chunk_start"))
          .as("n_tokens_chunk"),
        array_join(slice(col("_t"), col("chunk_start").cast("int") + 1,
                         lit(chunkTokens)), " ").as("chunk_text"))
  }
}
