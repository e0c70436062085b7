package graft.operators

/** Multimodal-column plumbing: treat media as opaque binary + typed
  * metadata, decoded partition-by-partition.
  *
  * STUB NOTICE: this container ships no image/audio/video codecs, so
  * [[decodeStub]] produces a deterministic fake "decode" (byte length,
  * magic bytes, fake dimensions). The Spark-side plumbing around it —
  * binary column, Dataset encoder, mapPartitions batching — is real and
  * is what a production decoder would plug into (swap decodeStub for a
  * JNI/codec call; the iterator shape already amortizes per-partition
  * init cost such as loading a codec context once per partition).
  */
object Multimodal {

  /** Typed metadata produced per media blob. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      magic: String,
      fake_width: Int,
      fake_height: Int)

  /** STUB decoder — deterministic fake standing in for a codec. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val magic = bytes.take(4).map(b => f"$b%02X").mkString
    MediaMeta(id, n, magic, n % 640, (n * 7) % 480)
  }

  /** Per-partition decode: one pass over the iterator, codec "context"
    * initialized once per partition (here: nothing to init — stub). */
  def decodePartition(
      it: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    // real impl: val codec = Codec.acquire() ... it.map(...) with cleanup
    it.map { case (id, bytes) => decodeStub(id, bytes) }
  }
}
