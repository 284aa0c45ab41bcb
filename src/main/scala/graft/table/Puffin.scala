package graft.table

import java.nio.{ByteBuffer, ByteOrder}

/** Portable serialization of a 64-bit roaring bitmap — the layout the
  * public Iceberg v3 spec mandates for deletion-vector blobs ("the
  * vector, serialized as the portable format of a 64-bit roaring
  * bitmap"), itself defined by the public RoaringBitmap format spec:
  * a u64 little-endian bucket count, then per bucket (ascending key
  * order) a u32 LE high-32-bit key followed by a standard 32-bit
  * roaring bitmap stream.
  *
  * Writes emit array/bitmap containers only (the RoaringFormatSpec
  * SERIAL_COOKIE_NO_RUNCONTAINER form, cookie 12346, offsets always
  * present); reads additionally accept run containers (packed cookie
  * 12347 + run bitmap) so externally-written vectors import. All
  * validation throws — deletion vectors are correctness-bearing.
  */
object Roaring {

  private val NoRunCookie = 12346
  private val RunCookie = 12347
  private val ArrayMax = 4096
  private val NoOffsetThreshold = 4

  /** Serialize sorted distinct non-negative longs to the portable
    * 64-bit layout.
    */
  def serialize(sorted: Array[Long]): Array[Byte] = {
    // bucket by high 32 bits; input is sorted so buckets are contiguous
    val buckets = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Array[Byte])]
    var i = 0
    while (i < sorted.length) {
      val key = (sorted(i) >>> 32).toInt
      val start = i
      while (i < sorted.length && (sorted(i) >>> 32).toInt == key) i += 1
      val lows = new Array[Int](i - start)
      var j = start
      while (j < i) { lows(j - start) = sorted(j).toInt; j += 1 }
      buckets += ((key, serialize32(lows)))
    }
    val total = 8 + buckets.map(4 + _._2.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(buckets.length.toLong)
    buckets.foreach { case (key, bytes) =>
      buf.putInt(key); buf.put(bytes) }
    buf.array()
  }

  /** One 32-bit roaring stream over sorted (as unsigned) ints. */
  private def serialize32(lows: Array[Int]): Array[Byte] = {
    // containers keyed by the high 16 bits, values are the low 16
    val containers = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Array[Char])]
    var i = 0
    while (i < lows.length) {
      val key = lows(i) >>> 16
      val start = i
      while (i < lows.length && (lows(i) >>> 16) == key) i += 1
      val vals = new Array[Char](i - start)
      var j = start
      while (j < i) { vals(j - start) = (lows(j) & 0xffff).toChar; j += 1 }
      containers += ((key, vals))
    }
    val n = containers.length
    def containerBytes(vals: Array[Char]): Int =
      if (vals.length <= ArrayMax) 2 * vals.length else 8192
    val headerLen = 4 + 4 + 4 * n + 4 * n // cookie, count, desc, offsets
    val total = headerLen + containers.map(c => containerBytes(c._2)).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(NoRunCookie)
    buf.putInt(n)
    containers.foreach { case (key, vals) =>
      buf.putShort(key.toShort); buf.putShort((vals.length - 1).toShort) }
    var off = headerLen
    containers.foreach { case (_, vals) =>
      buf.putInt(off); off += containerBytes(vals) }
    containers.foreach { case (_, vals) =>
      if (vals.length <= ArrayMax) vals.foreach(v => buf.putShort(v.toShort))
      else {
        val words = new Array[Long](1024)
        vals.foreach(v => words(v >>> 6) |= 1L << (v & 63))
        words.foreach(buf.putLong)
      }
    }
    buf.array()
  }

  /** Deserialize the portable 64-bit layout back to sorted longs.
    *
    * Falls back to the pre-fix LEGACY cookie semantics (graft initially
    * had the two RoaringFormatSpec cookies swapped — it wrote 12347 as
    * the plain no-run form) when the spec parse fails: the DV blob's
    * CRC has already proven the bytes intact by the time this runs, so
    * a spec-parse failure on an old sidecar means the legacy encoding,
    * and refusing it would brick every table written before the fix.
    */
  def deserialize(bytes: Array[Byte], off: Int, len: Int): Array[Long] =
    try deserializeWith(bytes, off, len, legacy = false)
    catch {
      // a failed parse surfaces as a validation require (IAE) or as a
      // buffer under/overflow when the misread structure walks off the
      // stream — both mean "not spec form", so try legacy
      case e @ (_: IllegalArgumentException |
                _: java.nio.BufferUnderflowException) =>
        try deserializeWith(bytes, off, len, legacy = true)
        catch { case _: IllegalArgumentException |
                     _: java.nio.BufferUnderflowException => throw e }
    }

  private def deserializeWith(bytes: Array[Byte], off: Int, len: Int,
      legacy: Boolean): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes, off, len).order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = buf.getLong
    require(nBuckets >= 0 && nBuckets <= Int.MaxValue,
      s"bad roaring64 bucket count $nBuckets")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prevKey = -1L
    var b = 0L
    while (b < nBuckets) {
      val key = buf.getInt.toLong & 0xffffffffL
      require(key > prevKey, s"roaring64 keys out of order: $key")
      prevKey = key
      deserialize32(buf, legacy).foreach(low =>
        out += (key << 32) | (low.toLong & 0xffffffffL))
      b += 1
    }
    require(!buf.hasRemaining, "trailing bytes after roaring64 bitmap")
    out.toArray
  }

  /** One 32-bit roaring stream, advancing `buf` past it. Returns sorted
    * (unsigned) ints. `legacy` swaps the cookie constants back to the
    * pre-fix assignment.
    */
  private def deserialize32(buf: ByteBuffer, legacy: Boolean): Array[Int] = {
    val runC = if (legacy) NoRunCookie else RunCookie
    val noRunC = if (legacy) RunCookie else NoRunCookie
    val cookie = buf.getInt
    val (n, runFlags) =
      if ((cookie & 0xffff) == runC) {
        val count = (cookie >>> 16) + 1
        val flags = new Array[Byte]((count + 7) / 8)
        buf.get(flags)
        (count, Some(flags))
      } else {
        require(cookie == noRunC, s"bad roaring cookie $cookie")
        (buf.getInt, None)
      }
    require(n >= 0 && n <= 65536, s"bad roaring container count $n")
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    // offsets: always present without runs; with runs only above the
    // no-offset threshold. We read sequentially, so just skip them.
    if (runFlags.isEmpty || n >= NoOffsetThreshold)
      buf.position(buf.position() + 4 * n)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    i = 0
    while (i < n) {
      val base = keys(i) << 16
      val isRun = runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
      if (isRun) {
        val nRuns = buf.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xffff
          val extra = buf.getShort & 0xffff
          var v = start
          while (v <= start + extra) { out += base | v; v += 1 }
          r += 1
        }
      } else if (cards(i) > ArrayMax) {
        var w = 0
        while (w < 1024) {
          var word = buf.getLong
          val wordBase = base | (w << 6)
          while (word != 0L) {
            out += wordBase | java.lang.Long.numberOfTrailingZeros(word)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var v = 0
        while (v < cards(i)) { out += base | (buf.getShort & 0xffff); v += 1 }
      }
      i += 1
    }
    out.toArray
  }
}

/** Minimal Puffin (the public Iceberg sidecar file format) writer and
  * footer reader — enough to carry `deletion-vector-v1` blobs in the
  * spec layout: `Magic | blob* | Magic | FooterPayload (JSON) |
  * FooterPayloadSize (i32 LE) | Flags (4 bytes) | Magic`, with blob
  * metadata (`type`, `offset`, `length`, `referenced-data-file`,
  * `cardinality`) in the footer.
  */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  case class Blob(tpe: String, offset: Long, length: Long,
      snapshotId: Long, sequenceNumber: Long,
      properties: Map[String, String],
      // spec `fields`: ids of the columns the blob was computed from —
      // readers discovering stats via the footer (not table-metadata
      // blob refs) attribute sketches to columns through this
      fields: Seq[Int] = Seq.empty)

  /** Streaming writer: blobs append in call order; `close` writes the
    * footer. Offsets are absolute file positions (the first blob starts
    * at 4, after the header magic).
    */
  final class Writer(path: java.nio.file.Path) {
    private val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path))
    out.write(Magic)
    private var pos = 4L
    private val blobs = scala.collection.mutable.ArrayBuffer.empty[Blob]

    def add(tpe: String, bytes: Array[Byte],
        properties: Map[String, String],
        snapshotId: Long = -1L, sequenceNumber: Long = -1L,
        fields: Seq[Int] = Seq.empty): Blob = {
      val b = Blob(tpe, pos, bytes.length.toLong, snapshotId,
        sequenceNumber, properties, fields)
      out.write(bytes)
      pos += bytes.length
      blobs += b
      b
    }

    /** Write the footer; returns its byte length (the spec's
      * `file-footer-size-in-bytes`: magic + payload + size + flags +
      * magic).
      */
    def close(): Long = {
      val n = writeFooter(out, blobs.toSeq)
      out.close()
      n
    }
  }

  /** Emit the footer (magic + JSON payload + size/flags + magic) for the
    * given blob list; returns the footer byte length. Shared by the
    * streaming Writer and the post-commit `restamp` rewrite so both
    * construct byte-identical footers.
    */
  private def writeFooter(out: java.io.OutputStream,
      blobs: Seq[Blob]): Long = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val arr = root.putArray("blobs")
    blobs.foreach { b =>
      val o = arr.addObject()
      o.put("type", b.tpe)
      val fa = o.putArray("fields")
      b.fields.foreach(fa.add)
      o.put("snapshot-id", b.snapshotId)
      o.put("sequence-number", b.sequenceNumber)
      o.put("offset", b.offset)
      o.put("length", b.length)
      val p = o.putObject("properties")
      b.properties.foreach { case (k, v) => p.put(k, v) }
    }
    root.putObject("properties").put("created-by", "graft")
    val json = m.writeValueAsBytes(root)
    out.write(Magic)
    out.write(json)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(json.length)
    tail.putInt(0) // flags: footer payload not compressed
    out.write(tail.array())
    out.write(Magic)
    4L + json.length + 8L + 4L
  }

  /** Rewrite a Puffin file's footer (atomic sibling-replace), stamping
    * every blob's snapshot-id/sequence-number with the ids a commit
    * assigned. Executor-written sidecars carry -1s (ids don't exist yet
    * at write time); the spec marks the fields informational, but an
    * external tool listing blobs should see the real ids. Blob bytes and
    * offsets are untouched, so manifest content_offset /
    * content_size_in_bytes references into the file stay valid.
    */
  def restamp(path: java.nio.file.Path, snapshotId: Long,
      sequenceNumber: Long): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(path)
    val blobs = readFooterBytes(bytes, path.toString)
    if (blobs.forall(b =>
        b.snapshotId == snapshotId && b.sequenceNumber == sequenceNumber))
      return
    val payloadSize = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val blobEnd = bytes.length - 12 - payloadSize - 4
    val tmp = path.resolveSibling(path.getFileName.toString + ".restamp")
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(tmp))
    try {
      out.write(bytes, 0, blobEnd)
      writeFooter(out, blobs.map(_.copy(snapshotId = snapshotId,
        sequenceNumber = sequenceNumber)))
    } finally out.close()
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Parse a Puffin file's footer into its blob list. */
  def readFooter(path: java.nio.file.Path): Seq[Blob] =
    readFooterBytes(java.nio.file.Files.readAllBytes(path), path.toString)

  /** Footer parse over already-loaded bytes (restamp reads the file
    * once and reuses the array for both the parse and the rewrite).
    */
  def readFooterBytes(bytes: Array[Byte], path: String): Seq[Blob] = {
    require(bytes.length >= 20 &&
      bytes.take(4).sameElements(Magic) &&
      bytes.takeRight(4).sameElements(Magic), s"not a Puffin file: $path")
    val tail = ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tail.getInt
    val flags = tail.getInt
    require((flags & 1) == 0, "compressed Puffin footers not supported")
    val payloadStart = bytes.length - 12 - payloadSize
    require(payloadStart >= 8 && bytes.slice(payloadStart - 4, payloadStart)
      .sameElements(Magic), s"corrupt Puffin footer in $path")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(new java.io.ByteArrayInputStream(
      bytes, payloadStart, payloadSize))
    val out = scala.collection.mutable.ArrayBuffer.empty[Blob]
    root.get("blobs").forEach { b =>
      val props = scala.collection.mutable.Map.empty[String, String]
      Option(b.get("properties")).foreach(_.fields().forEachRemaining(e =>
        props += e.getKey -> e.getValue.asText()))
      val fids = scala.collection.mutable.ArrayBuffer.empty[Int]
      Option(b.get("fields")).foreach(_.forEach(f => fids += f.asInt()))
      out += Blob(b.get("type").asText(), b.get("offset").asLong(),
        b.get("length").asLong(),
        Option(b.get("snapshot-id")).map(_.asLong()).getOrElse(-1L),
        Option(b.get("sequence-number")).map(_.asLong()).getOrElse(-1L),
        props.toMap, fids.toSeq)
    }
    out.toSeq
  }
}
