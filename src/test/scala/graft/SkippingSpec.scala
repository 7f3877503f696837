package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Manifest zone maps (per-file min/max/nullCount from parquet footers)
  * and the file-level data-skipping read path built on them.
  *
  * Every skipping assertion is paired with a result-parity assertion:
  * pruning must be invisible to query results by construction
  * (`scanWhere` re-applies the predicate to surviving files).
  */
class SkippingSpec extends SparkSpec {
  import spark.implicits._

  private def evTable(n: Int = 4): TxTable =
    new TxTable(spark, tmpDir("skip") + "/ev", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType),
      StructField("label", StringType), StructField("when", TimestampType))),
      Seq("k"), numBuckets = n)

  private def batch(lo: Int, hi: Int, label: String): org.apache.spark.sql.DataFrame =
    (lo to hi).map(i => (s"k$i", i, label,
      new Timestamp(t0.getTime + i * 1000L))).toDF("k", "v", "label", "when")

  test("append-time locality: a value predicate prunes to the matching batch's files") {
    val t = evTable(4)
    t.append(batch(1, 100, "alpha"))     // files span v ∈ [1,100]
    t.append(batch(101, 200, "bravo"))   //             [101,200]
    t.append(batch(201, 300, "charlie")) //             [201,300]
    val total = t.dataFileCount
    assert(total === 12) // 3 appends × 4 buckets

    val r = t.skipReport(col("v") === 150)
    assert(r.total === 12 && r.scanned === 4, s"got $r") // one batch's files
    assert(t.scanWhere(col("v") === 150).count() === 1)

    // range predicate straddling two batches keeps exactly those two
    val r2 = t.skipReport(col("v") > 180 && col("v") <= 220)
    assert(r2.scanned === 8, s"got $r2")
    // parity with the unpruned read on every predicate we prune with
    for (p <- Seq(col("v") === 150, col("v") > 180 && col("v") <= 220,
        col("v") < 5, col("v") >= 296, lit(250) <= col("v"))) {
      assert(t.scanWhere(p).orderBy("v").collect().toSeq ===
        t.read.filter(p).orderBy("v").collect().toSeq)
    }
  }

  test("skipping operators: IN-list, string equality, prefix, timestamp range, flipped literal") {
    val t = evTable(2)
    t.append(batch(1, 50, "alpha"))
    t.append(batch(51, 100, "bravo"))
    val total = t.dataFileCount // 4

    assert(t.skipReport(col("v").isin(10, 20)).scanned === 2)
    assert(t.skipReport(col("v").isin(10, 60)).scanned === 4) // spans both
    // string zone maps: labels are constant per batch
    assert(t.skipReport(col("label") === "alpha").scanned === 2)
    assert(t.skipReport(col("label") === "zulu").scanned === 0)
    assert(t.skipReport(col("label").startsWith("bra")).scanned === 2)
    assert(t.skipReport(col("label").startsWith("z")).scanned === 0)
    // timestamps ride the same per-batch locality as v
    val cut = new Timestamp(t0.getTime + 75 * 1000L)
    assert(t.skipReport(col("when") > cut).scanned === 2)
    // literal-on-the-left mirrors the operator
    assert(t.skipReport(lit(60) < col("v")).scanned === 2)
    assert(t.scanWhere(lit(60) < col("v")).count() === 40)
    assert(t.skipReport(col("v") === 999).scanned === 0)
    assert(t.scanWhere(col("v") === 999).count() === 0)
    assert(total === 4)
  }

  test("null tracking: IsNull prunes null-free files; comparisons prune all-null files") {
    val t = new TxTable(spark, tmpDir("skipn") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = 1)
    t.append(Seq(("a", Some(1)), ("b", Some(2))).toDF("k", "v"))   // no nulls
    t.append(Seq(("c", None: Option[Int]), ("d", None)).toDF("k", "v")) // all null
    assert(t.dataFileCount === 2)
    assert(t.skipReport(col("v").isNull).scanned === 1)    // only the null file
    assert(t.skipReport(col("v").isNotNull).scanned === 1) // only the value file
    assert(t.skipReport(col("v") === 1).scanned === 1)     // all-null file pruned
    assert(t.scanWhere(col("v").isNull).select("k").as[String].collect().sorted
      === Array("c", "d"))
    assert(t.scanWhere(col("v") === 1).select("k").as[String].collect().toSeq
      === Seq("a"))
  }

  test("unsupported predicates and unstatted columns never prune (conservative)") {
    val t = evTable(2)
    t.append(batch(1, 50, "alpha"))
    // arbitrary function of a column: no proof, no pruning
    assert(t.skipReport(length(col("label")) > 100).scanned === t.dataFileCount)
    // column-to-column comparison: kept
    assert(t.skipReport(col("v") > length(col("label"))).scanned === t.dataFileCount)
    // non-ASCII literal against ASCII stats is still sound (byte order
    // agrees when one side is ASCII): è > every ASCII label
    assert(t.scanWhere(col("label") === "è").count() === 0)
  }

  test("tab/newline-hostile string values survive the TSV manifest (JSON escaping)") {
    val t = new TxTable(spark, tmpDir("skipt") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = 1)
    t.append(Seq(("a\tb\nc", 1), ("z", 2)).toDF("k", "v"))
    t.append(Seq(("m", 3)).toDF("k", "v"))
    assert(t.read.count() === 3)                    // manifest still parses
    assert(t.count() === 3)                         // metadata fast path too
    assert(t.skipReport(col("v") === 3).scanned === 1)
    assert(t.scanWhere(col("k") === "a\tb\nc").count() === 1)
  }

  test("long string stats truncate soundly (prefix lower bound, bumped upper bound)") {
    val t = new TxTable(spark, tmpDir("skipl") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("s", StringType))),
      Seq("k"), numBuckets = 1)
    val long1 = "m" + ("x" * 100) // only entry; min = max = this, truncated at 64
    t.append(Seq(("a", long1)).toDF("k", "s"))
    // the real value sits inside the truncated [prefix, bumped-prefix) bounds
    assert(t.skipReport(col("s") === long1).scanned === 1)
    assert(t.scanWhere(col("s") === long1).count() === 1)
    // far outside the bounds still prunes
    assert(t.skipReport(col("s") === "zzz").scanned === 0)
    assert(t.skipReport(col("s") === "aaa").scanned === 0)
  }

  test("oversized string stats (no min/max, null_count set) never read as all-null") {
    val t = new TxTable(spark, tmpDir("skipb") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("s", StringType))),
      Seq("k"), numBuckets = 1)
    // beyond parquet's max-statistics size the writer omits BINARY
    // min/max but still records null_count — a chunk shaped exactly
    // like an all-null one, except it holds a value
    val big = "b" + ("x" * 5000)
    t.append(Seq(("a", Some(big)), ("b", None: Option[String])).toDF("k", "s"))
    assert(t.dataFileCount === 1)
    assert(t.skipReport(col("s") === big).scanned === 1) // must keep
    assert(t.scanWhere(col("s") === big).count() === 1)
    assert(t.skipReport(col("s").isNotNull).scanned === 1)
    assert(t.scanWhere(col("s").isNotNull).count() === 1)
    // null tracking on the same file still works for IsNull
    assert(t.scanWhere(col("s").isNull).select("k").as[String].collect().toSeq
      === Seq("b"))
  }

  test("narrowing integral casts never prune; widening casts still do") {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    import graft.core.FileStats
    val schema = StructType(Seq(StructField("v", IntegerType)))
    // file holds v = 300; cast(v as byte) wraps to 44
    val stats = FileStats.Stats(1,
      Map("v" -> FileStats.ColStats(Some(300L), Some(300L), 0L)))
    val narrowing = EqualTo(
      Cast(UnresolvedAttribute("v"), ByteType), Literal(44.toByte, ByteType))
    assert(FileStats.mayMatch(stats, narrowing, schema),
      "narrowing cast pruned a file containing a matching (wrapped) row")
    // widening casts remain monotone and keep pruning
    val widenMiss = EqualTo(
      Cast(UnresolvedAttribute("v"), LongType), Literal(5L, LongType))
    val widenHit = EqualTo(
      Cast(UnresolvedAttribute("v"), LongType), Literal(300L, LongType))
    assert(!FileStats.mayMatch(stats, widenMiss, schema))
    assert(FileStats.mayMatch(stats, widenHit, schema))
  }

  test("metadata-only count() equals scan count across mutations") {
    val t = evTable(3)
    t.append(batch(1, 80, "alpha"))
    assert(t.count() === 80)
    t.upsert(Seq(("k5", 500, "upd", t0)).toDF("k", "v", "label", "when"))
    assert(t.count() === 80)
    t.append(batch(81, 90, "bravo"))
    t.deleteWhere(col("v") > 85)
    assert(t.count() === t.read.count())
    assert(t.count() === 84) // 90 keys − k86..k90 − k5 (upserted to 500 > 85)
  }

  test("legacy manifests without stats read fine and never skip") {
    val t = new TxTable(spark, tmpDir("skipo") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = 1)
    t.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    // rewrite the manifest with the stats column stripped (pre-skipping format)
    val mdir = new java.io.File(t.dir, "_manifests")
    val mf = mdir.listFiles().filter(_.getName.endsWith(".tsv")).maxBy(_.getName)
    val stripped = scala.io.Source.fromFile(mf).getLines()
      .map(_.split("\t", 3).take(2).mkString("\t")).mkString("", "\n", "\n")
    val w = new java.io.FileWriter(mf); w.write(stripped); w.close()
    // drop the stale Hadoop checksum shadow of the hand-edited manifest
    new java.io.File(mdir, "." + mf.getName + ".crc").delete()
    assert(t.read.count() === 2)
    assert(t.count() === 2) // falls back to a scan
    assert(t.skipReport(col("v") === 99).scanned === 1) // no stats → keep
    assert(t.scanWhere(col("v") === 1).as[(String, Int)].collect().toSeq
      === Seq(("a", 1)))
  }

  test("compactClustered: range-split files give intra-bucket pruning on the cluster key") {
    val t = evTable(2)
    // shuffled insert order: append-time locality deliberately absent
    val rows = scala.util.Random.shuffle((1 to 400).toList).map(i =>
      (s"k$i", i, s"l${i % 7}", new Timestamp(t0.getTime + i * 1000L)))
    t.append(rows.toDF("k", "v", "label", "when"))
    // pre-clustering: every file spans ~the whole v range — nothing prunes
    assert(t.skipReport(col("v") <= 20).scanned === t.dataFileCount)

    t.compactClustered(Seq("v"), filesPerBucket = 4)
    val total = t.dataFileCount
    assert(total >= 6 && total <= 12, s"files=$total") // ~4 per bucket × 2 buckets
    val r = t.skipReport(col("v") <= 20)
    // one leading range file per bucket, plus at most one straddle
    // fragment (range boundaries are sample-based and can cross a
    // bucket boundary, leaving a small overlapping file)
    assert(r.scanned <= 4 && r.scanned < total / 2, s"got $r")
    assert(t.scanWhere(col("v") <= 20).count() === 20)
    // parity on a mid-range band
    val band = col("v") > 150 && col("v") < 250
    assert(t.skipReport(band).scanned < total)
    assert(t.scanWhere(band).orderBy("v").collect().toSeq ===
      t.read.filter(band).orderBy("v").collect().toSeq)
    // clustering preserved the data exactly
    assert(t.read.agg(sum("v")).as[Long].head() === (1 to 400).sum.toLong)
  }

  test("compactZOrdered prunes on BOTH dimensions; lexicographic only on the leading one") {
    def grid(dir: String): TxTable = {
      val t = new TxTable(spark, tmpDir(dir) + "/t", StructType(Seq(
        StructField("k", StringType), StructField("x", IntegerType),
        StructField("y", IntegerType))), Seq("k"), numBuckets = 1)
      // 32×32 grid, shuffled: no write-time locality on either dim
      val pts = scala.util.Random.shuffle(
        (for (x <- 0 until 32; y <- 0 until 32) yield (s"p$x-$y", x, y)).toList)
      t.append(pts.toDF("k", "x", "y"))
      t
    }
    val lex = grid("zlex"); lex.compactClustered(Seq("x", "y"), filesPerBucket = 16)
    val zed = grid("zord"); zed.compactZOrdered(Seq("x", "y"), filesPerBucket = 16, bitsPerCol = 5)
    def frac(t: TxTable, p: org.apache.spark.sql.Column): Double = {
      val r = t.skipReport(p); r.scanned.toDouble / r.total
    }
    val xBand = col("x") >= 8 && col("x") < 12   // 1/8 of x
    val yBand = col("y") >= 8 && col("y") < 12   // 1/8 of y
    // leading-key band: lexicographic is at least as tight as z-order
    assert(frac(lex, xBand) <= 0.30, s"lex x: ${frac(lex, xBand)}")
    // trailing-key band: lexicographic reads ~everything, z-order doesn't
    assert(frac(lex, yBand) >= 0.90, s"lex y: ${frac(lex, yBand)}")
    assert(frac(zed, xBand) <= 0.60, s"z x: ${frac(zed, xBand)}")
    assert(frac(zed, yBand) <= 0.60, s"z y: ${frac(zed, yBand)}")
    // and the results stay exact on both layouts
    for (t <- Seq(lex, zed); p <- Seq(xBand, yBand, xBand && yBand)) {
      assert(t.scanWhere(p).orderBy("k").collect().toSeq ===
        t.read.filter(p).orderBy("k").collect().toSeq)
    }
    assert(zed.read.count() === 1024)
  }

  test("bloom filters prune point reads that zone maps cannot") {
    val t = new TxTable(spark, tmpDir("bloom") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = 1)
    // three appends whose key RANGES interleave lexicographically
    // ("k150" sits inside [k1, k99]), so zone maps keep everything and
    // only the bloom can tell which file holds a key
    t.append((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"))
    t.append((101 to 200).map(i => (s"k$i", i)).toDF("k", "v"))
    t.append((201 to 300).map(i => (s"k$i", i)).toDF("k", "v"))
    assert(t.dataFileCount === 3)
    val r = t.skipReport(col("k") === "k150")
    assert(r.scanned === 1, s"got $r") // bloom isolates the middle file
    assert(t.scanWhere(col("k") === "k150").as[(String, Int)].collect().toSeq
      === Seq(("k150", 150)))
    // absent key: every bloom says no
    assert(t.skipReport(col("k") === "k999").scanned === 0)
    assert(t.scanWhere(col("k") === "k999").count() === 0)
    // IN across two files keeps exactly those two
    assert(t.skipReport(col("k").isin("k50", "k250")).scanned === 2)
    // equality on a NON-bloom column falls back to zone maps only
    assert(t.skipReport(col("v") === 150).scanned === 1) // zone maps cover ints
    // and lookup stacks bucket + zone + bloom: plans exactly one file
    val planned = t.lookup(Seq("k150")).queryExecution.executedPlan
      .collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
    assert(planned === 1, s"planned $planned files")
  }

  test("time travel and vacuum carry stats through re-linked entries") {
    val t = evTable(2)
    t.append(batch(1, 50, "alpha"))
    t.append(batch(51, 100, "bravo"))
    t.upsert(Seq(("k60", 6000, "upd", t0)).toDF("k", "v", "label", "when"))
    // the untouched alpha files were re-linked with their stats intact
    assert(t.skipReport(col("v") === 25).scanned <= 2)
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.skipReport(col("v") === 25).scanned <= 2)
    assert(t.scanWhere(col("v") === 25).count() === 1)
    assert(t.scanWhere(col("v") === 6000).count() === 1)
  }
}
