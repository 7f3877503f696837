package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.TxTable
import graft.ext.Scd2View

/** CDC-fed incremental SCD2: after ANY interleaving of insert /
  * update / delete / out-of-order batches, the maintained history
  * must equal a full rebuild over the source (the CdcSpec replay
  * pattern), refreshes must prune the event re-read to the touched
  * keys' files, and the watermark CAS must make replays no-ops. */
class Scd2ViewSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("k", "ts", "seq", "status")

  private val evSchema = ev((0L, 0L, 0L, "x")).schema

  private def mkPair(tag: String): (TxTable, Scd2View) = {
    val loc = tmpDir(s"scd2v-$tag")
    val src = new TxTable(spark, s"$loc/src", evSchema, Seq("seq"),
      numBuckets = 4)
    val view = new Scd2View(spark, src, s"$loc/hist",
      "k", "ts", "seq", "status", numBuckets = 4)
    (src, view)
  }

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.select("k", "ver", "status", "effective_from", "effective_to",
      "is_current").collect().map(_.toSeq).toSet

  private def assertConverged(src: TxTable, view: Scd2View): Unit =
    assert(canon(view.read) === canon(view.buildHistory(src.read)))

  test("incremental history equals a full rebuild across mixed batches") {
    val (src, view) = mkPair("mixed")
    // b1: plain inserts, two keys with status runs
    src.append(ev((1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"),
      (1L, 30L, 102L, "B"), (2L, 10L, 200L, "A")))
    assert(view.refresh().applied)
    assertConverged(src, view)
    assert(canon(view.read).size === 3) // 1:[A,B], 2:[A]

    // b2: update flips a MID-run status (runs re-split), plus an
    // OUT-OF-ORDER event landing before key 2's first version
    src.upsert(ev((1L, 20L, 101L, "B"), (2L, 5L, 201L, "B")))
    val s2 = view.refresh()
    assert(s2.applied && s2.touchedKeys === 2L)
    assertConverged(src, view)

    // b3: delete a boundary event — key 1's middle version merges away
    src.deleteWhereLight(col("seq") === 101L)
    assert(view.refresh().applied)
    assertConverged(src, view)

    // b4: mixed batch — new key inserts, key 2 fully deleted
    src.deleteWhereLight(col("k") === 2L)
    src.append(ev((3L, 1L, 300L, "C")))
    assert(view.refresh().applied)
    assertConverged(src, view)
    assert(canon(view.read).exists(_.head == 3L))
    assert(!canon(view.read).exists(_.head == 2L),
      "a fully-deleted key must leave no history rows")
  }

  test("refresh is idempotent; layout-only commits advance the watermark") {
    val (src, view) = mkPair("idem")
    src.append(ev((1L, 1L, 1L, "A"), (2L, 1L, 2L, "B")))
    assert(view.refresh().applied)
    val v = view.table.currentVersion
    // replay: already-current refresh is a pure no-op (no commit)
    val again = view.refresh()
    assert(again.applied && again.touchedKeys === 0L)
    assert(view.table.currentVersion === v)
    // a compaction rewrites layout but changes no rows: the refresh
    // must advance the watermark without touching history rows
    src.compact()
    val s = view.refresh()
    assert(s.applied && s.touchedKeys === 0L)
    assert(view.appliedVersion === src.currentVersion)
    assertConverged(src, view)
  }

  test("a localized batch re-reads only the touched keys' event files") {
    val (src, view) = mkPair("prune")
    // 64 keys, several events each, then cluster the layout by key so
    // zone maps discriminate
    val seed = (1L to 64L).flatMap(k =>
      Seq((k, 1L, k * 10L, "A"), (k, 2L, k * 10L + 1L, "B")))
    src.append(ev(seed: _*))
    src.compactClustered(Seq("k"), filesPerBucket = 4)
    assert(view.refresh().applied) // full first build
    // one key gets a new event: the re-read must NOT scan the corpus
    src.upsertLight(ev((7L, 3L, 9999L, "C")))
    val s = view.refresh()
    assert(s.applied && s.touchedKeys === 1L)
    assert(s.srcFilesRead < s.srcFilesTotal,
      s"refresh read ${s.srcFilesRead}/${s.srcFilesTotal} files — no pruning")
    assertConverged(src, view)
  }

  test("incremental access path is a semi-join, never an In literal list") {
    val (src, view) = mkPair("plan")
    // wide enough that a literal-list plan would be visibly large
    val seed = (1L to 400L).map(k => (k, 1L, k, "A"))
    src.append(ev(seed: _*))
    assert(view.refresh().applied)
    // backfill-shaped delta: 300 of 400 keys touched in one commit
    src.upsert(ev((1L to 300L).map(k => (k, 2L, 10000L + k, "B")): _*))
    val s = view.refresh()
    assert(s.applied && s.touchedKeys === 300L)
    assert(s.touchedPlan.nonEmpty, "incremental path must expose its plan")
    assert(s.touchedPlan.contains("LeftSemi"),
      "touched-key restriction must be a semi-join against the delta keys")
    // no 100+-literal In(...) predicate anywhere in the analyzed plan:
    // count literal commas inside any In( ... ) fragment
    val inLists = "(?s)\\bIN \\(".r.findAllIn(s.touchedPlan).size
    assert(!s.touchedPlan.matches("(?s).*\\bIN \\([^)]{2000,}.*"),
      s"plan carries a huge In literal list ($inLists IN sites)")
    assertConverged(src, view)
  }
}
