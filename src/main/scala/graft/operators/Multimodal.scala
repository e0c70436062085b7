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

  // ---- Frame pipeline: REAL byte-level transforms (no codec needed) —
  // the frame-sample / resize / feature-extract stages a media pipeline
  // runs after decode, operating on the raw blob. Deterministic, so the
  // whole pipeline is oracle-checkable (q94).

  /** Typed per-document frame features. */
  final case class FrameFeatures(
      doc_id: Long,
      n_frames: Int,
      energy: Long,
      frame_digest: String)

  /** Every `stride`-th fixed-length frame of the blob (tail frame may be
    * short) — the video frame-sampling shape. */
  def frameSample(bytes: Array[Byte], frameLen: Int,
      stride: Int): Seq[Array[Byte]] =
    bytes.grouped(frameLen).zipWithIndex
      .collect { case (f, i) if i % stride == 0 => f }.toSeq

  /** Resize to `target` bytes: crop, or pad with 0x20. */
  def resize(frame: Array[Byte], target: Int): Array[Byte] =
    if (frame.length >= target) frame.take(target)
    else frame ++ Array.fill(target - frame.length)(' '.toByte)

  /** Frame features: sampled frame count, total byte energy of the
    * resized frames, and an md5 digest over their concatenation. */
  def frameFeatures(id: Long, bytes: Array[Byte]): FrameFeatures = {
    val frames = frameSample(bytes, 16, 4).map(resize(_, 8))
    val energy = frames.iterator.map(_.iterator.map(b => (b & 0xff).toLong).sum).sum
    val md = java.security.MessageDigest.getInstance("MD5")
    frames.foreach(md.update)
    val digest = md.digest().map(b => f"$b%02x").mkString
    FrameFeatures(id, frames.size, energy, digest)
  }

  /** Per-partition frame pipeline (same iterator shape as decode). */
  def framePartition(
      it: Iterator[(Long, Array[Byte])]): Iterator[FrameFeatures] =
    it.map { case (id, bytes) => frameFeatures(id, bytes) }

  // ---- Perceptual hash: dHash (difference hash) over the sampled-frame
  // grid — the classic image near-dup fingerprint (resize to a tiny
  // grid, hash the sign of adjacent-pixel differences), computed here
  // over the same deterministic stride-4 sampled + resized frame bytes
  // the q94 pipeline extracts, so it is exactly oracle-checkable. A
  // production pipeline swaps the byte grid for decoded luma pixels; the
  // signature/blocking/verify shape downstream is unchanged.

  // ---- Audio-envelope signature: the SECOND modality shape next to
  // the image-grid dHash — a 1-D framed analysis of the blob as a mono
  // byte "signal" (the q50/q94 stub-codec posture: a production
  // pipeline swaps the raw bytes for decoded PCM samples; the framing /
  // energy / zero-crossing math and everything downstream is
  // unchanged). 32-sample windows at hop 16 (50% overlap — standard
  // STFT framing), FULL frames only; sample = unsigned byte − 64 (the
  // corpus alphabet straddles 64: letters land positive, spaces
  // negative, so zero crossings track word boundaries the way real ZCR
  // tracks voicing). All-integer, oracle-checkable bit-for-bit (q150).

  /** Typed per-document audio-envelope features. */
  final case class AudioFeatures(
      doc_id: Long,
      n_frames: Int,
      energy: Long, // Σ over frames of Σ (sample)²  — exact int64
      zc: Long, // Σ over frames of sign changes between adjacent samples
      peak: Long, // max frame energy (the envelope's loudest window)
      env_digest: String) // md5 of "fe0,fe1,…" — the envelope identity

  /** Framed 1-D analysis; blobs shorter than one full 32-byte window
    * yield zero frames (callers filter them out, mirrored in the
    * oracle's WHERE). A crossing is (c_i · c_{i+1}) < 0 — an exact-64
    * sample (c = 0) never crosses, identically in both engines. */
  def audioFeatures(id: Long, bytes: Array[Byte]): AudioFeatures = {
    val nF = if (bytes.length < 32) 0 else (bytes.length - 32) / 16 + 1
    val fes = new Array[Long](nF)
    var zc = 0L
    var k = 0
    while (k < nF) {
      val st = 16 * k
      var fe = 0L
      var i = 0
      while (i < 32) {
        val c = (bytes(st + i) & 0xff) - 64
        fe += c.toLong * c
        if (i < 31) {
          val cn = (bytes(st + i + 1) & 0xff) - 64
          if (c * cn < 0) zc += 1
        }
        i += 1
      }
      fes(k) = fe
      k += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(fes.mkString(",").getBytes("UTF-8"))
    AudioFeatures(id, nF, fes.sum, zc,
      if (nF == 0) 0L else fes.max,
      md.digest().map(b => f"$b%02x").mkString)
  }

  /** Per-partition audio pipeline (same iterator shape as decode). */
  def audioPartition(
      it: Iterator[(Long, Array[Byte])]): Iterator[AudioFeatures] =
    it.map { case (id, bytes) => audioFeatures(id, bytes) }

  /** 63-bit dHash. The "image" is a 9×8 grid: row r = the stride-4
    * sampled frame at byte offset 64·r, resized (crop/pad-with-0x20) to
    * 8 bytes — frames past EOF become all-space rows, matching the
    * oracle's rpad(substr(…)) spelling. Bit r·7+c is set iff
    * row[c] < row[c+1] (unsigned), i.e. 7 adjacent-pixel comparisons per
    * row. 63 bits (9 rows × 7 comparisons), not 64, so the signature is
    * exact in a signed BIGINT in BOTH engines — the same reason the
    * SimHash signature (queries/Dedup.scala q43) is 60-bit. */
  def dHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var r = 0
    while (r < 9) {
      val row = resize(bytes.slice(64 * r, 64 * r + 8), 8)
      var c = 0
      while (c < 7) {
        if ((row(c) & 0xff) < (row(c + 1) & 0xff)) h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }

}
