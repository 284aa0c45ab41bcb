package graft

import graft.table.{Dv, Puffin, Roaring}
import org.scalatest.funsuite.AnyFunSuite

/** Portable roaring-bitmap serialization (the Iceberg-v3 DV vector
  * form) and the Puffin sidecar container: round-trips across all
  * container shapes, acceptance of the run-container form external
  * writers may emit, and loud rejection of corruption.
  */
class RoaringSpec extends AnyFunSuite {

  test("roaring64 round-trips array, bitmap, and multi-bucket shapes") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(65535L, 65536L, 131071L),            // container boundaries
      (0L until 5000L).toArray,                  // bitmap container (>4096)
      (0L until 70000L).filter(_ % 3 == 0).toArray, // bitmap + array mix
      Array(1L, (1L << 32) + 5L, (1L << 33) | 7L),  // several 32-bit buckets
      (0L until 9000L).map(i => (i << 16) * 3).toArray) // sparse arrays
    cases.foreach { ps =>
      val bytes = Roaring.serialize(ps)
      assert(Roaring.deserialize(bytes, 0, bytes.length).sameElements(ps),
        s"round-trip failed for ${ps.length} positions")
    }
  }

  test("run-container streams (external writers) deserialize") {
    // hand-build: one bucket (key 0), one RUN container holding
    // [10..14] and [100..100] -> packed SERIAL_COOKIE 12347 form
    val buf = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(1L)                      // one high-32 bucket
    buf.putInt(0)                        // bucket key 0
    buf.putInt(12347 | (0 << 16))        // run cookie, 1 container
    buf.put(1.toByte)                    // run-flag bitset: container 0 runs
    buf.putShort(0.toShort)              // container key
    buf.putShort(5.toShort)              // cardinality - 1 = 5 (6 values)
    // below NO_OFFSET_THRESHOLD -> no offset header
    buf.putShort(2.toShort)              // 2 runs
    buf.putShort(10.toShort); buf.putShort(4.toShort)  // 10..14
    buf.putShort(100.toShort); buf.putShort(0.toShort) // 100
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())
    assert(Roaring.deserialize(bytes, 0, bytes.length)
      .sameElements(Array(10L, 11L, 12L, 13L, 14L, 100L)))
  }

  test("legacy swapped-cookie vectors (pre-fix sidecars) still decode") {
    // graft initially wrote the RoaringFormatSpec cookies swapped:
    // plain u32 12347 + u32 count as the no-run form. Hand-build that
    // legacy layout; the reader must fall back and decode it exactly.
    val vals = Array(3, 9, 4097)
    val buf = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(1L)                       // one high-32 bucket
    buf.putInt(0)                         // bucket key 0
    buf.putInt(12347)                     // LEGACY no-run cookie
    buf.putInt(1)                         // one container
    buf.putShort(0.toShort)               // container key
    buf.putShort((vals.length - 1).toShort)
    buf.putInt(4 + 4 + 4 + 4)             // offset header
    vals.foreach(v => buf.putShort(v.toShort))
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())
    assert(Roaring.deserialize(bytes, 0, bytes.length)
      .sameElements(vals.map(_.toLong)))
    // and a spec-form stream with the SAME values still parses as spec
    val spec = Roaring.serialize(vals.map(_.toLong))
    assert(Roaring.deserialize(spec, 0, spec.length)
      .sameElements(vals.map(_.toLong)))
  }

  test("DV blob rejects CRC and length-field corruption") {
    val blob = Dv.encode(Array(3L, 9L, 4097L))
    // flip one payload byte: CRC must catch it
    val crcBad = blob.clone(); crcBad(10) = (crcBad(10) ^ 0x40).toByte
    intercept[IllegalArgumentException] { Dv.decode(crcBad) }
    // corrupt the length field
    val lenBad = blob.clone(); lenBad(3) = (lenBad(3) + 1).toByte
    intercept[IllegalArgumentException] { Dv.decode(lenBad) }
  }

  test("Puffin sidecar: blobs readable by offset AND via the footer") {
    val dir = java.nio.file.Files.createTempDirectory("puffin")
    val p = dir.resolve("s.puffin")
    val w = new Puffin.Writer(p)
    val b1 = w.add(Dv.BlobType, Dv.encode(Array(1L, 2L, 3L)),
      Map("referenced-data-file" -> "/data/a.parquet",
        "cardinality" -> "3"))
    val b2 = w.add(Dv.BlobType, Dv.encode(Array(7L)),
      Map("referenced-data-file" -> "/data/b.parquet",
        "cardinality" -> "1"))
    w.close()
    // manifest-style access: seek to (offset, length), decode
    assert(Dv.read(p.toString, b1.offset, b1.length)
      .sameElements(Array(1L, 2L, 3L)))
    assert(Dv.read(p.toString, b2.offset, b2.length)
      .sameElements(Array(7L)))
    // footer-style access: a spec reader discovers the same blobs
    val blobs = Puffin.readFooter(p)
    assert(blobs.map(b => (b.tpe, b.offset, b.length,
      b.properties("referenced-data-file"))) == Seq(
      (Dv.BlobType, b1.offset, b1.length, "/data/a.parquet"),
      (Dv.BlobType, b2.offset, b2.length, "/data/b.parquet")))
    assert(blobs.head.offset == 4L) // first blob right after the magic
  }
}
