package graft.core

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}
import org.roaringbitmap.RoaringBitmap

/** DELTA DELETION-VECTOR WIRE FORMAT — the byte-level half of
  * merge-on-read interop (delta.io PROTOCOL.md, "Deletion Vectors"):
  *
  *  - the BITMAP: a RoaringBitmapArray in the protocol's "portable"
  *    serialization — little-endian magic 1681511377, a little-endian
  *    64-bit bitmap count, then each 32-bit Roaring bitmap (dense by
  *    high-32-bit key, index 0..n-1) in the standard Roaring portable
  *    spec. Spark ships org.roaringbitmap, whose
  *    `serialize(DataOutput)` emits exactly that spec, so the bitmap
  *    bytes here are the same bytes delta-spark writes.
  *  - the FILE: `deletion_vector_<uuid>.bin` under the table root —
  *    one version byte (1), then per stored DV a 4-byte BIG-endian
  *    length, the bitmap bytes, and a 4-byte big-endian CRC-32 of
  *    those bytes. A descriptor's `offset` points at the length
  *    prefix; `sizeInBytes` is the bitmap byte count (no framing).
  *  - the DESCRIPTOR path: storageType "u" ⇒ `pathOrInlineDv` is an
  *    optional directory prefix plus the 20-char Base85 (RFC 1924
  *    alphabet — Delta's codec) encoding of the file UUID.
  *
  * Everything here is pure byte/driver work — the per-file position
  * sets are BUILT distributedly by the callers (executors serialize
  * each file's bitmap; only the compressed bitmap bytes travel).
  */
object DeltaDv {

  /** Delta's Base85 alphabet (RFC 1924) — NOT Ascii85/Z85. */
  private val B85: Array[Char] =
    ("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~").toCharArray
  private val B85Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    B85.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** 16 bytes → 20 chars: each big-endian 4-byte group becomes 5
    * Base85 digits, most significant first (Delta's encodeUUID). */
  def encodeUuid(u: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    val bytes = bb.array()
    val sb = new StringBuilder(20)
    var g = 0
    while (g < 4) {
      var v = 0L
      var i = 0
      while (i < 4) { v = (v << 8) | (bytes(g * 4 + i) & 0xffL); i += 1 }
      val digits = new Array[Char](5)
      var d = 4
      while (d >= 0) { digits(d) = B85((v % 85).toInt); v /= 85; d -= 1 }
      sb.appendAll(digits)
      g += 1
    }
    sb.toString
  }

  /** Inverse of [[encodeUuid]] over the LAST 20 chars (anything before
    * them is a path prefix per the protocol). Returns (prefix, uuid). */
  def decodeUuid(pathOrInlineDv: String): (String, UUID) = {
    require(pathOrInlineDv.length >= 20,
      s"deletion vector path '$pathOrInlineDv' is shorter than an " +
        "encoded UUID")
    val (prefix, enc) = pathOrInlineDv.splitAt(pathOrInlineDv.length - 20)
    val bytes = new Array[Byte](16)
    var g = 0
    while (g < 4) {
      var v = 0L
      var d = 0
      while (d < 5) {
        val c = enc.charAt(g * 5 + d).toInt
        val digit = if (c < 128) B85Rev(c) else -1
        require(digit >= 0, s"invalid Base85 char in '$enc'")
        v = v * 85 + digit
        d += 1
      }
      var i = 0
      while (i < 4) { bytes(g * 4 + i) = ((v >>> (8 * (3 - i))) & 0xff).toByte; i += 1 }
      g += 1
    }
    val bb = ByteBuffer.wrap(bytes)
    (prefix, new UUID(bb.getLong, bb.getLong))
  }

  /** File name a "u" descriptor resolves to (relative to table root +
    * prefix). */
  def dvFileName(u: UUID): String = s"deletion_vector_$u.bin"

  /** General Base85 decode (RFC 1924 alphabet) for INLINE descriptors
    * (storageType "i"): the encoder pads its input to a 4-byte
    * multiple, so the decode truncates back to `outLen` (the
    * descriptor's `sizeInBytes`). */
  def decodeBase85(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0,
      s"inline DV payload length ${s.length} is not a multiple of 5")
    val padded = new Array[Byte](s.length / 5 * 4)
    var g = 0
    while (g < s.length / 5) {
      var v = 0L
      var d = 0
      while (d < 5) {
        val c = s.charAt(g * 5 + d).toInt
        val digit = if (c < 128) B85Rev(c) else -1
        require(digit >= 0, s"invalid Base85 char in inline DV")
        v = v * 85 + digit
        d += 1
      }
      var i = 0
      while (i < 4) {
        padded(g * 4 + i) = ((v >>> (8 * (3 - i))) & 0xff).toByte
        i += 1
      }
      g += 1
    }
    require(outLen <= padded.length,
      s"inline DV declares $outLen bytes but decodes to ${padded.length}")
    java.util.Arrays.copyOfRange(padded, 0, outLen)
  }

  /** Inverse, for writers/tests: pad to a 4-byte multiple, encode. */
  def encodeBase85(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, (bytes.length / 4 + 1) * 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var g = 0
    while (g < padded.length / 4) {
      var v = 0L
      var i = 0
      while (i < 4) { v = (v << 8) | (padded(g * 4 + i) & 0xffL); i += 1 }
      val digits = new Array[Char](5)
      var d = 4
      while (d >= 0) { digits(d) = B85((v % 85).toInt); v /= 85; d -= 1 }
      sb.appendAll(digits)
      g += 1
    }
    sb.toString
  }

  /** Serialize a position set as a portable RoaringBitmapArray.
    * Positions must be ≥ 0; the array is DENSE by high-32 key (empty
    * buckets serialize as empty bitmaps), matching delta-spark. */
  def serializeBitmap(positions: Iterator[Long]): Array[Byte] = {
    val byHigh = scala.collection.mutable.SortedMap.empty[Int, RoaringBitmap]
    positions.foreach { p =>
      require(p >= 0, s"negative row position $p")
      byHigh.getOrElseUpdate((p >>> 32).toInt, new RoaringBitmap())
        .add((p & 0xffffffffL).toInt)
    }
    val n = byHigh.keys.lastOption.map(_ + 1).getOrElse(0)
    val header = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    header.putInt(1681511377) // portable magic
    header.putLong(n.toLong)
    val out = new ByteArrayOutputStream()
    out.write(header.array())
    val dout = new DataOutputStream(out)
    var k = 0
    while (k < n) {
      byHigh.getOrElse(k, new RoaringBitmap()).serialize(dout)
      k += 1
    }
    dout.flush()
    out.toByteArray
  }

  /** Inverse of [[serializeBitmap]]: the deleted row positions,
    * ascending. */
  def deserializeBitmap(bytes: Array[Byte]): Array[Long] = {
    val header = ByteBuffer.wrap(bytes, 0, 12).order(ByteOrder.LITTLE_ENDIAN)
    val magic = header.getInt
    require(magic == 1681511377,
      s"not a portable RoaringBitmapArray (magic $magic)")
    val n = header.getLong
    val in = new DataInputStream(
      new java.io.ByteArrayInputStream(bytes, 12, bytes.length - 12))
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var k = 0L
    while (k < n) {
      val rb = new RoaringBitmap()
      rb.deserialize(in)
      val it = rb.getIntIterator
      while (it.hasNext) out += (k << 32) | (it.next().toLong & 0xffffffffL)
      k += 1
    }
    out.result()
  }

  /** Cardinality of a portable RoaringBitmapArray WITHOUT
    * materializing positions: sums each 32-bit bucket's cardinality
    * while decoding. A tens-of-millions-deletes DV costs O(1) extra
    * heap here where [[deserializeBitmap]] allocates 8 bytes per
    * deleted row — use this for counting (e.g. statistics paths). */
  def bitmapCardinality(bytes: Array[Byte]): Long = {
    val header = ByteBuffer.wrap(bytes, 0, 12).order(ByteOrder.LITTLE_ENDIAN)
    val magic = header.getInt
    require(magic == 1681511377,
      s"not a portable RoaringBitmapArray (magic $magic)")
    val n = header.getLong
    val in = new DataInputStream(
      new java.io.ByteArrayInputStream(bytes, 12, bytes.length - 12))
    var total = 0L
    var k = 0L
    while (k < n) {
      val rb = new RoaringBitmap()
      rb.deserialize(in)
      total += rb.getLongCardinality
      k += 1
    }
    total
  }

  /** One stored blob's placement inside a DV file. */
  final case class Slot(offset: Long, sizeInBytes: Long, cardinality: Long)

  /** Write one DV file carrying `blobs` (key → (bitmapBytes,
    * cardinality)) in sorted-key order. Returns the encoded UUID part
    * of `pathOrInlineDv` and each key's slot. */
  def writeDvFile(fs: FileSystem, tableRoot: String,
      blobs: Seq[(String, (Array[Byte], Long))]): (String, Map[String, Slot]) = {
    val uuid = UUID.randomUUID()
    val path = new Path(tableRoot, dvFileName(uuid))
    val out = new DataOutputStream(fs.create(path, false))
    val slots = Map.newBuilder[String, Slot]
    try {
      out.writeByte(1) // file format version
      var offset = 1L
      blobs.sortBy(_._1).foreach { case (key, (bytes, card)) =>
        out.writeInt(bytes.length) // big-endian length prefix
        out.write(bytes)
        val crc = new CRC32()
        crc.update(bytes)
        out.writeInt(crc.getValue.toInt) // big-endian CRC-32
        slots += key -> Slot(offset, bytes.length.toLong, card)
        offset += 4L + bytes.length + 4L
      }
    } finally out.close()
    (encodeUuid(uuid), slots.result())
  }

  /** Read one blob back: seek to `offset`, validate the length prefix
    * against `sizeInBytes` and the trailing CRC, return the bitmap
    * bytes. `pathOrInlineDv` resolves under `tableRoot` per the "u"
    * rules (prefix + encoded UUID). */
  def readDvBlob(fs: FileSystem, tableRoot: String, pathOrInlineDv: String,
      offset: Long, sizeInBytes: Long): Array[Byte] = {
    val (prefix, uuid) = decodeUuid(pathOrInlineDv)
    val dir = if (prefix.isEmpty) tableRoot
      else s"${tableRoot.stripSuffix("/")}/${prefix.stripSuffix("/")}"
    readBlobAt(fs, new Path(dir, dvFileName(uuid)), offset, sizeInBytes)
  }

  /** [[readDvBlob]] for an already-resolved file path (storageType
    * "p": the descriptor carries the absolute path itself). */
  def readBlobAt(fs: FileSystem, file: Path,
      offset: Long, sizeInBytes: Long): Array[Byte] = {
    val in = fs.open(file)
    try {
      in.seek(offset)
      val din = new DataInputStream(in)
      val len = din.readInt()
      require(len.toLong == sizeInBytes,
        s"DV blob at offset $offset declares $len bytes, descriptor " +
          s"says $sizeInBytes")
      val bytes = new Array[Byte](len)
      din.readFully(bytes)
      val stored = din.readInt()
      val crc = new CRC32()
      crc.update(bytes)
      require(stored == crc.getValue.toInt,
        s"DV blob CRC mismatch at offset $offset")
      bytes
    } finally in.close()
  }
}
