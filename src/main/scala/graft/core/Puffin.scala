package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The Iceberg PUFFIN statistics file format (the published Puffin
  * spec, v1): `Magic | Blob₁..Blobₙ | Footer`, where Footer =
  * `Magic | FooterPayload (UTF-8 JSON) | PayloadSize (int32 LE) |
  * Flags (4 bytes) | Magic`. The footer payload lists every blob's
  * type, Iceberg field ids, snapshot/sequence provenance and exact
  * byte extent — a stock reader seeks to the declared offsets and
  * never scans. This engine writes the standard
  * `apache-datasketches-theta-v1` NDV blobs ([[IcebergExport
  * .writeStatistics]]) and reads foreign ones
  * ([[IcebergImport.statisticsNdv]]).
  *
  * Reference behavior modeled: the reference delegates planner
  * statistics to Postgres' own ANALYZE (`packages/db/schema.sql`
  * relies on pg_statistic); the lakehouse analog is the Iceberg
  * spec's `statistics` metadata + Puffin sketches, readable by any
  * stock engine.
  *
  * Flags are written 0 (uncompressed payload); compressed foreign
  * payloads (flag bit 0 of byte 0) are refused honestly rather than
  * misparsed. */
object Puffin {

  val Magic: Array[Byte] =
    Array('P'.toByte, 'F'.toByte, 'A'.toByte, '1'.toByte)

  /** The standard NDV blob type (Iceberg spec, "apache-datasketches-
    * theta-v1"): a serialized compact theta sketch of the column's
    * single-value-serialized values. */
  val ThetaV1 = "apache-datasketches-theta-v1"

  /** The v3 deletion-vector blob type (one DV per data file). */
  val DeletionVectorV1 = "deletion-vector-v1"

  /** One blob's footer entry. `offset`/`length` are the blob's exact
    * byte extent in the file; `fields` are Iceberg FIELD IDS (not
    * names — names travel through the table metadata's schema). */
  final case class BlobMeta(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String])

  /** A written/parsed Puffin file: total size, footer size (the
    * spec's `file-footer-size-in-bytes` = trailing Magic..Magic
    * span) and the blob list. */
  final case class FileInfo(
      fileSize: Long, footerSize: Long, blobs: Seq[BlobMeta])

  private def leInt(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)

  private def payloadJson(blobs: Seq[BlobMeta]): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "blobs" -> JArray(blobs.toList.map { b =>
        JObject(List(
          "type" -> (JString(b.blobType): JValue),
          "fields" -> (JArray(b.fields.toList.map(JInt(_): JValue)): JValue),
          "snapshot-id" -> (JLong(b.snapshotId): JValue),
          "sequence-number" -> (JLong(b.sequenceNumber): JValue),
          "offset" -> (JLong(b.offset): JValue),
          "length" -> (JLong(b.length): JValue)) ++
          (if (b.properties.isEmpty) Nil
           else List("properties" -> (JObject(
             b.properties.toList.sortBy(_._1)
               .map { case (k, v) => k -> (JString(v): JValue) }): JValue)))
        ): JValue
      }),
      "properties" -> JObject("created-by" -> JString("graft")))))

  /** Write a Puffin file: blobs in order, exact offsets recorded,
    * temp+rename so a torn write can never be mistaken for a
    * statistics file (the round-18 manifest discipline). */
  def write(fs: FileSystem, path: Path,
      blobs: Seq[(String, Seq[Int], Long, Long, Array[Byte],
        Map[String, String])]): FileInfo = {
    var offset = Magic.length.toLong
    val metas = blobs.map { case (tp, fields, snap, seq, bytes, props) =>
      val m = BlobMeta(tp, fields, snap, seq, offset, bytes.length, props)
      offset += bytes.length
      m
    }
    val payload = payloadJson(metas).getBytes(StandardCharsets.UTF_8)
    val tmp = new Path(path.getParent, s".tmp-${path.getName}")
    val out = fs.create(tmp, true)
    try {
      out.write(Magic)
      blobs.foreach { case (_, _, _, _, bytes, _) => out.write(bytes) }
      out.write(Magic)
      out.write(payload)
      out.write(leInt(payload.length))
      out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed payload
      out.write(Magic)
    } finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    require(fs.rename(tmp, path), s"rename $tmp -> $path failed")
    val footer = 4L + payload.length + 4L + 4L + 4L
    FileInfo(fs.getFileStatus(path).getLen, footer, metas)
  }

  /** Parse a Puffin file's footer (the spec's read path: seek to the
    * tail, validate magic, walk back to the payload). Refuses
    * corrupt magic and compressed payloads instead of misparsing. */
  def readFooter(fs: FileSystem, path: Path): FileInfo = {
    val size = fs.getFileStatus(path).getLen
    require(size >= 8 + 16, s"$path too small for a Puffin file")
    val in = fs.open(path)
    try {
      val tail = new Array[Byte](12)
      in.readFully(size - 12, tail)
      require(tail.slice(8, 12).sameElements(Magic),
        s"$path: trailing Puffin magic missing")
      val flags = tail.slice(4, 8)
      require((flags(0) & 0x01) == 0,
        s"$path: compressed footer payload is not supported")
      val payloadSize = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      val payload = new Array[Byte](payloadSize)
      in.readFully(size - 12 - payloadSize, payload)
      val head = new Array[Byte](4)
      in.readFully(size - 12 - payloadSize - 4, head)
      require(head.sameElements(Magic),
        s"$path: footer Puffin magic missing")
      val lead = new Array[Byte](4)
      in.readFully(0L, lead)
      require(lead.sameElements(Magic), s"$path: leading Puffin magic missing")
      val j = JsonMethods.parse(new String(payload, StandardCharsets.UTF_8))
      def lng(v: JValue): Long = v match {
        case JInt(x)  => x.toLong
        case JLong(x) => x
        case _        => -1L
      }
      val blobs = (j \ "blobs") match {
        case JArray(bs) => bs.map { b =>
          BlobMeta(
            (b \ "type") match { case JString(t) => t; case _ => "" },
            (b \ "fields") match {
              case JArray(fs0) => fs0.map(lng(_).toInt)
              case _ => Nil
            },
            lng(b \ "snapshot-id"),
            lng(b \ "sequence-number"),
            lng(b \ "offset"),
            lng(b \ "length"),
            (b \ "properties") match {
              case JObject(kvs) => kvs.collect {
                case (k, JString(v)) => k -> v }.toMap
              case _ => Map.empty[String, String]
            })
        }
        case _ => Nil
      }
      FileInfo(size, 4L + payloadSize + 12L, blobs)
    } finally in.close()
  }

  /** One blob's bytes, by its declared extent. */
  def readBlob(fs: FileSystem, path: Path, b: BlobMeta): Array[Byte] = {
    val in = fs.open(path)
    try {
      val bytes = new Array[Byte](b.length.toInt)
      in.readFully(b.offset, bytes)
      bytes
    } finally in.close()
  }
}
