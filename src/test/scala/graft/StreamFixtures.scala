package graft

import org.apache.spark.sql.DataFrame

/** Shared micro-batch replay fixture for the streaming specs: write
  * each DataFrame as ONE parquet file under `<tmp>/stream` with
  * ascending modification times, so a file-source stream with
  * maxFilesPerTrigger=1 replays them as ordered micro-batches (the file
  * source orders by modification time — the stamping is what pins batch
  * order, and every spec must agree on it). */
object StreamFixtures {
  def writeBatches(prefix: String, batches: Seq[DataFrame]): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    val merged = new java.io.File(dir, "stream"); merged.mkdirs()
    batches.zipWithIndex.foreach { case (df, i) =>
      val sub = new java.io.File(dir, s"f$i")
      df.coalesce(1).write.mode("overwrite").parquet(sub.getAbsolutePath)
      val part = sub.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(merged, s"part-$i.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    merged.getAbsolutePath
  }
}
