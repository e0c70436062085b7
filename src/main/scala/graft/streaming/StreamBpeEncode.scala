package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming BPE encode — the ingest-time twin of batch q151, closing
  * the tokenizer pillar's write path: arriving documents are costed
  * under the TRAINED tokenizer (real BPE token counts, not the
  * whitespace proxy) so a budget-aware ingest can route/clip at write
  * time.
  *
  * Where the batch encode joins a broadcast vocab dim, a stream needs
  * no vocabulary AT ALL: a trained BPE tokenizer IS its ordered merge
  * list, and applying R merges to a word is R chained literal
  * `replace` calls on the wrapped-symbol encoding (identical function
  * composition to the training loop's per-round re-segmentation, so
  * stream == batch bit-for-bit — StreamingSpec pins it). The merge
  * list is METADATA by construction (R pairs — `TextOps.bpeTrain`'s
  * first component, the trained-artifact export pattern), folded into
  * the plan as R nested expression calls: stateless, zero shuffle,
  * scan → project, the [[StreamAnnAssign]] economics. This is exactly
  * how production tokenizers serve: train once, ship the merge list,
  * apply it mergewise at the edge.
  */
object StreamBpeEncode {

  /** Per-word wrapped-symbol segmentation under an ordered merge list,
    * as a Column over a word column: wrap every char, then apply each
    * merge as a LITERAL replace (the exact q148 kernel — left-to-right
    * non-overlapping, same composition order as the training loop). */
  private def segment(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(regexp_replace(w, "(.)", "~$1~")) {
      case (seg, (l, r)) =>
        replace(seg, lit(s"~$l~~$r~"), lit(s"~$l$r~"))
    }

  /** Encode a (doc_id, text) frame — batch or streaming — under an
    * ordered merge list. Output: (doc_id, n_words, n_bpe,
    * tokens_per_word_ppm), the q151 row shape; documents with no
    * non-empty words are absent (the batch's declared posture). */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val nBpe = aggregate(
      transform(ws, w => size(split(segment(w, merges), "~~")).cast("long")),
      lit(0L), (acc, x) => acc + x)
    docs
      .select(col("doc_id"), ws.as("ws"), nBpe.as("n_bpe"))
      .where(size(col("ws")) > 0)
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        col("n_bpe"),
        expr("n_bpe * 1000000L DIV size(ws)").as("tokens_per_word_ppm"))
  }

  /** Replay a finite documents directory through the encoder and
    * collect the q151-shaped rows. */
  def runToCompletion(spark: SparkSession, dir: String,
      merges: Seq[(String, String)], queryName: String): DataFrame = {
    val docs = spark.readStream
      .schema(StreamDedup.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val q = encode(docs, merges)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
