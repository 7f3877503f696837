package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{IcebergExport, TxTable}

/** Iceberg snapshot-tail streaming source
  * (`readStream.format("graft").option("icebergTail","true")`): a
  * foreign Iceberg v2 tree consumed as a stream — sequence-number
  * offsets, append snapshots served exactly once, replace snapshots
  * skipped, mutations honestly refused (or explicitly skipped). */
class IcebergTailStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-edit a published metadata JSON (and drop Hadoop's local-FS
    * checksum sidecar, which the in-place rewrite invalidates). */
  private def rewriteJson(mdFile: File)(f: JValue => JValue): Unit = {
    val md = JsonMethods.parse(scala.io.Source.fromFile(mdFile).mkString)
    val w = new java.io.PrintWriter(mdFile, "UTF-8")
    try w.write(JsonMethods.compact(JsonMethods.render(f(md))))
    finally w.close()
    val crc = new File(mdFile.getParentFile, s".${mdFile.getName}.crc")
    if (crc.exists()) crc.delete()
  }

  private def drain(dir: String, out: String, ck: String,
      opts: Map[String, String] = Map.empty): Unit = {
    val r0 = spark.readStream.format("graft").option("icebergTail", "true")
    val r = opts.foldLeft(r0) { case (b, (k, v)) => b.option(k, v) }
    val q = r.load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("tails appends across re-syncs exactly once; re-run is a no-op") {
    val dir = tmpDir("icetail") + "/t"
    val a = (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v")
    val b = (41L to 60L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 2)
    t.append(a)
    IcebergExport.writeIcebergMetadata(spark, t)

    val out = tmpDir("icetail-out")
    val ck = tmpDir("icetail-ck")
    drain(dir, out, ck)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (1L to 40L).toArray)

    // second append lands as its own snapshot; only ITS files serve
    t.append(b)
    IcebergExport.writeIcebergMetadata(spark, t)
    drain(dir, out, ck)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (1L to 60L).toArray)

    // verbatim re-run: offsets already at the head - nothing new
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 60L)
  }

  test("replace snapshots (compaction) are skipped - no re-served rows") {
    val dir = tmpDir("icetail-rp") + "/t"
    val a = (1L to 30L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)
    t.append((31L to 45L).map(k => (k, k * 1.0)).toDF("k", "v"))
    IcebergExport.writeIcebergMetadata(spark, t)
    val out = tmpDir("icetail-rp-out")
    val ck = tmpDir("icetail-rp-ck")
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 45L)

    t.compactBuckets(minFiles = 2) // layout_only -> operation "replace"
    IcebergExport.writeIcebergMetadata(spark, t)
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 45L,
      "a compaction rewrite must not re-serve rows")

    // and a follow-up append after the compaction still streams
    t.append(Seq((46L, 46.0)).toDF("k", "v"))
    IcebergExport.writeIcebergMetadata(spark, t)
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 46L)
  }

  test("mutations refuse with the remedy named; skip options skip them") {
    val dir = tmpDir("icetail-mut") + "/t"
    val a = (1L to 20L).map(k => (k, k % 4L)).toDF("k", "g")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 2)
    t.append(a)
    IcebergExport.writeIcebergMetadata(spark, t)
    val out = tmpDir("icetail-mut-out")
    val ck = tmpDir("icetail-mut-ck")
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 20L)

    t.deleteWhereLight(col("g") === 0L) // DV-only -> operation "delete"
    IcebergExport.writeIcebergMetadata(spark, t)
    val e = intercept[Exception] { drain(dir, out, ck) }
    val msg = causeMessages(e)
    assert(msg.contains("skipDeleteSnapshots"))

    // explicit skip: the delete snapshot passes over, the stream lives
    drain(dir, out, ck, Map("skipDeleteSnapshots" -> "true"))
    assert(spark.read.parquet(out).count() === 20L)

    // an upsert rewrite is an overwrite: refused, then skippable
    t.upsert(Seq((1L, 9L)).toDF("k", "g"))
    IcebergExport.writeIcebergMetadata(spark, t)
    val e2 = intercept[Exception] { drain(dir, out, ck) }
    val msg2 = causeMessages(e2)
    assert(msg2.contains("skipOverwriteSnapshots"))
    drain(dir, out, ck, Map("skipOverwriteSnapshots" -> "true",
      "skipDeleteSnapshots" -> "true"))
    assert(spark.read.parquet(out).count() === 20L)
  }

  test("expired history refuses the default full feed; startingSequence serves the retained tail") {
    val dir = tmpDir("icetail-exp") + "/t"
    val a = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)
    t.append((11L to 16L).map(k => (k, k * 1.0)).toDF("k", "v"))
    IcebergExport.writeIcebergMetadata(spark, t)

    // simulate snapshot expiry: the oldest retained snapshot names a
    // parent that is no longer in the snapshots list
    rewriteJson(new File(dir, "metadata/v1.metadata.json")) { md =>
      md.transformField {
        case ("snapshots", JArray(ss)) =>
          "snapshots" -> JArray(ss.zipWithIndex.map {
            case (s, 0) => s match {
              case JObject(fs) => JObject(
                ("parent-snapshot-id" -> (JInt(999): JValue)) ::
                  fs.filterNot(_._1 == "parent-snapshot-id"))
              case other => other
            }
            case (s, _) => s
          })
      }
    }

    val e = intercept[Exception] {
      drain(dir, tmpDir("icetail-exp-out0"), tmpDir("icetail-exp-ck0"))
    }
    val msg = causeMessages(e)
    assert(msg.contains("startingSequence"))

    // explicit start AFTER the second-to-last snapshot's sequence:
    // only the head snapshot serves
    val lin = graft.core.IcebergImport.lineage(spark, dir)
    val out = tmpDir("icetail-exp-out")
    val ck = tmpDir("icetail-exp-ck")
    drain(dir, out, ck,
      Map("startingSequence" -> lin(lin.size - 2).seq.toString))
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (11L to 16L).toArray)

    // RESTART without the option on the same checkpoint: the
    // committed offset is already past the gap, so the full-feed
    // check must not fire (it is lazy - initialOffset only)
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 6L)
  }

  test("appends AFTER a DV delete stay streamable (carried delete manifest)") {
    val dir = tmpDir("icetail-dv") + "/t"
    val a = (1L to 20L).map(k => (k, k % 4L)).toDF("k", "g")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 2)
    t.append(a)
    IcebergExport.writeIcebergMetadata(spark, t)
    val out = tmpDir("icetail-dv-out")
    val ck = tmpDir("icetail-dv-ck")
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 20L)

    t.deleteWhereLight(col("g") === 0L)       // v2: DVs, op 'delete'
    IcebergExport.writeIcebergMetadata(spark, t)
    t.append(Seq((21L, 1L), (22L, 2L)).toDF("k", "g")) // v3: pure append
    IcebergExport.writeIcebergMetadata(spark, t)

    // the delete snapshot skips EXPLICITLY; the append after it must
    // serve normally - its snapshot carries the UNCHANGED delete
    // manifest under the original adding snapshot, not its own
    drain(dir, out, ck, Map("skipDeleteSnapshots" -> "true"))
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === ((1L to 20L) ++ Seq(21L, 22L)).toArray)
  }

  test("vacuum does not renumber offsets; a caught-up stream continues exactly") {
    val dir = tmpDir("icetail-vac") + "/t"
    val a = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)                                   // v1
    t.append(Seq((11L, 11.0)).toDF("k", "v"))     // v2
    IcebergExport.writeIcebergMetadata(spark, t)
    val out = tmpDir("icetail-vac-out")
    val ck = tmpDir("icetail-vac-ck")
    drain(dir, out, ck)
    assert(spark.read.parquet(out).count() === 11L)

    // vacuum to the head, re-export (the root restates the live set
    // AT ITS OWN STABLE SEQUENCE), then append - the caught-up
    // stream serves ONLY the new snapshot, nothing re-served
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    IcebergExport.writeIcebergMetadata(spark, t)
    t.append(Seq((12L, 12.0)).toDF("k", "v"))     // v3
    IcebergExport.writeIcebergMetadata(spark, t)
    drain(dir, out, ck)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (1L to 12L).toArray)
  }

  test("vacuum with DV history: the delete-manifest rewrite cannot shift offsets") {
    val dir = tmpDir("icetail-vacdv") + "/t"
    val a = (1L to 12L).map(k => (k, k % 3L)).toDF("k", "g")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)                                   // v1
    t.deleteWhereLight(col("g") === 0L)           // v2: DVs
    t.append(Seq((13L, 1L)).toDF("k", "g"))       // v3
    IcebergExport.writeIcebergMetadata(spark, t)
    val out = tmpDir("icetail-vacdv-out")
    val ck = tmpDir("icetail-vacdv-ck")
    // drain through v3 (skip the delete snapshot explicitly)
    drain(dir, out, ck, Map("skipDeleteSnapshots" -> "true"))
    assert(spark.read.parquet(out).count() === 13L)

    // vacuum to the head: the new root must RE-WRITE its delete
    // manifest, but its snapshot sequence is 2v+2 regardless - the
    // committed offset still matches, and a follow-up append streams
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    IcebergExport.writeIcebergMetadata(spark, t)
    t.append(Seq((14L, 2L)).toDF("k", "g"))       // v4
    IcebergExport.writeIcebergMetadata(spark, t)
    drain(dir, out, ck, Map("skipDeleteSnapshots" -> "true",
      "skipOverwriteSnapshots" -> "true"))
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (1L to 14L).toArray,
      "only the new append may serve - nothing re-served, nothing lost")
  }

  test("startingSequence below the oldest retained snapshot serves it inclusive") {
    val dir = tmpDir("icetail-incl") + "/t"
    val a = (1L to 9L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)
    t.append(Seq((10L, 10.0)).toDF("k", "v"))
    IcebergExport.writeIcebergMetadata(spark, t)
    // expire the chain's root link (hand-edit, as in the expiry test)
    rewriteJson(new File(dir, "metadata/v1.metadata.json")) { md =>
      md.transformField {
        case ("snapshots", JArray(ss)) =>
          "snapshots" -> JArray(ss.zipWithIndex.map {
            case (s, 0) => s match {
              case JObject(fs) => JObject(
                ("parent-snapshot-id" -> (JInt(999): JValue)) ::
                  fs.filterNot(_._1 == "parent-snapshot-id"))
              case other => other
            }
            case (s, _) => s
          })
      }
    }
    // the remedy the refusal advertises: start just BELOW the oldest
    // retained sequence - the full retained history serves
    val lin = graft.core.IcebergImport.lineage(spark, dir)
    val out = tmpDir("icetail-incl-out")
    drain(dir, out, tmpDir("icetail-incl-ck"),
      Map("startingSequence" -> (lin.head.seq - 1L).toString))
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (1L to 10L).toArray)
  }

  test("a LAGGING consumer refuses a vacuum-rewritten chain instead of double-serving") {
    val dir = tmpDir("icetail-lag") + "/t"
    val a = (1L to 6L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)                                   // v1
    IcebergExport.writeIcebergMetadata(spark, t)
    val out = tmpDir("icetail-lag-out")
    val ck = tmpDir("icetail-lag-ck")
    drain(dir, out, ck) // committed offset = v1's sequence
    assert(spark.read.parquet(out).count() === 6L)

    t.append(Seq((7L, 7.0)).toDF("k", "v"))       // v2 (never drained)
    t.append(Seq((8L, 8.0)).toDF("k", "v"))       // v3
    t.vacuum(keepVersions = 1, minAgeMs = 0L)     // v1, v2 expire
    IcebergExport.writeIcebergMetadata(spark, t)  // root restates at v3
    val e = intercept[Exception] { drain(dir, out, ck) }
    val msg = causeMessages(e)
    assert(msg.contains("expired"),
      s"a rewritten chain must refuse, not re-serve: $msg")
  }

  test("schema evolution mid-stream: pinned schema null-fills old files, ignores new columns until restart") {
    val dir = tmpDir("icetail-evo") + "/t"
    val a = (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)
    IcebergExport.writeIcebergMetadata(spark, t)
    val out = tmpDir("icetail-evo-out")
    val ck = tmpDir("icetail-evo-ck")
    drain(dir, out, ck)
    assert(spark.read.parquet(out).columns.toSeq === Seq("k", "v"))

    // widen the table, append under the new schema, re-export
    t.addColumns(new org.apache.spark.sql.types.StructType()
      .add("w", org.apache.spark.sql.types.LongType))
    t.append(Seq((6L, 6.0, 60L)).toDF("k", "v", "w"))
    IcebergExport.writeIcebergMetadata(spark, t)

    // the RUNNING stream's schema is pinned (Structured Streaming
    // contract): the new file serves its k/v, the new column is
    // simply not projected; a RESTARTED stream resolves the widened
    // schema and null-fills pre-evolution batches going forward
    drain(dir, out, ck)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (1L to 6L).toArray)
    val t2 = new graft.sources.GraftIcebergTailTable(dir)
    assert(t2.schema().fieldNames.toSeq === Seq("k", "v", "w"))
  }

  test("maxSnapshotsPerTrigger chunks the backlog drain") {
    val dir = tmpDir("icetail-rate") + "/t"
    val a = (1L to 12L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a.filter(col("k") <= 4L))
    t.append(a.filter(col("k") > 4L && col("k") <= 8L))
    t.append(a.filter(col("k") > 8L))
    IcebergExport.writeIcebergMetadata(spark, t)

    val out = tmpDir("icetail-rate-out")
    val q = spark.readStream.format("graft")
      .option("icebergTail", "true")
      .option("maxSnapshotsPerTrigger", "1")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("icetail-rate-ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // every row exactly once, drained over MULTIPLE micro-batches
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      === (1L to 12L).toArray)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0L)
    assert(dataBatches >= 2,
      s"a 1-snapshot cap must chunk the drain, saw $dataBatches batches")
  }

  test("format-version 1 trees refuse streaming (no sequence offsets)") {
    val dir = tmpDir("icetail-v1") + "/t"
    val a = (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)
    IcebergExport.writeIcebergMetadata(spark, t)
    rewriteJson(new File(dir, "metadata/v1.metadata.json")) { md =>
      md.transformField {
        case ("format-version", JInt(_)) => "format-version" -> JInt(1)
      }
    }
    val e = intercept[Exception] {
      drain(dir, tmpDir("icetail-v1-out"), tmpDir("icetail-v1-ck"))
    }
    val msg = causeMessages(e)
    assert(msg.contains("format-version 2"))
  }
}
