package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{ResultCache, TxTable}

/** Version-keyed result cache: identical queries hit, commits
  * invalidate by key, distinct sources never collide, prune sweeps. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(tag: String): TxTable = {
    val t = new TxTable(spark, tmpDir(s"rc-$tag") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))),
      Seq("k"), numBuckets = 2)
    t.append((1 to 30).map(i => (s"k$i", i.toLong)).toDF("k", "v"))
    t
  }

  test("second identical query hits; a commit invalidates; results always correct") {
    val t = mkTable("a")
    val rc = new ResultCache(spark, tmpDir("rc-cache"))
    def q = t.read.groupBy(col("v") % 3).agg(count(lit(1)).as("n"), sum("v").as("s"))
    val (r1, hit1) = rc.cachedWithStatus(q, Seq(t))
    assert(!hit1, "first run must be a miss")
    val expect1 = q.collect().toSet
    assert(r1.collect().toSet === expect1)
    val (r2, hit2) = rc.cachedWithStatus(q, Seq(t))
    assert(hit2, "identical re-run must hit (exprIds differ, keys must not)")
    assert(r2.collect().toSet === expect1)
    // a commit to the enlisted table changes the key → fresh compute
    t.upsert(Seq(("k1", 1000L)).toDF("k", "v"))
    val (r3, hit3) = rc.cachedWithStatus(q, Seq(t))
    assert(!hit3, "post-commit run must miss")
    assert(r3.collect().toSet === q.collect().toSet)
    assert(r3.collect().toSet !== expect1)
  }

  test("same-shaped queries over DIFFERENT sources never share an entry") {
    val (a, b) = (mkTable("s1"), mkTable("s2"))
    b.upsert(Seq(("k1", 777L)).toDF("k", "v")) // make contents differ
    val rc = new ResultCache(spark, tmpDir("rc-cache2"))
    def q(t: TxTable) = t.read.agg(sum("v").as("s"))
    val ra = rc.cached(q(a), Seq(a)).as[Long].collect().head
    val rb = rc.cached(q(b), Seq(b)).as[Long].collect().head
    assert(ra === q(a).as[Long].collect().head)
    assert(rb === q(b).as[Long].collect().head)
    assert(ra !== rb)
  }

  test("prune sweeps aged entries; fresh ones survive") {
    val t = mkTable("p")
    val dir = tmpDir("rc-cache3")
    val rc = new ResultCache(spark, dir)
    rc.cached(t.read.agg(count(lit(1))), Seq(t)).collect()
    assert(rc.prune(maxAgeMs = 3600000L) === 0, "fresh entry must survive")
    assert(rc.prune(maxAgeMs = -1L) === 1, "aged entry must sweep")
    // post-prune call recomputes and re-fills
    val (_, hit) = rc.cachedWithStatus(t.read.agg(count(lit(1))), Seq(t))
    assert(!hit)
  }
}
