package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Warehouse
import graft.jobs.{MergeJob, RunTracker}
import graft.pipeline.Merger

/** Incremental merge pipeline — the streaming twin of [[StreamingScan]]
  * for the reference's merge worker (`src/jobs/merge.ts:16-109`, queue
  * consumer at `services/api/src/worker.ts:26`, concurrency 1): a
  * STREAM of merge requests (control rows carrying a jurisdiction)
  * drives the batch `MergeJob` per micro-batch through `foreachBatch`.
  * Each requested jurisdiction becomes a child run
  * (`<runId>-b<batchId>-<jurisdiction>`), so status/meta land in
  * `runs` exactly as for batch merges.
  *
  * Effectively-once: a replayed batch re-runs under the SAME child
  * runId, and every MergeJob write is keyed deterministically — item
  * upsert by id, review rows insert-if-absent on
  * `uuid("review:" + runId + itemId)`, requirement/link
  * insert-if-absent — so a replay converges to the state one
  * execution would have produced.
  *
  * The per-batch `collect()` is control-plane only: it gathers the
  * DISTINCT requested jurisdictions (bounded by the jurisdiction
  * vocabulary, never by data volume); the merge itself stays fully
  * distributed inside `MergeJob`.
  */
object StreamingMerge {

  /** `requests` must have a `jurisdiction` string column; other
    * columns are ignored. */
  def start(wh: Warehouse, requests: DataFrame, params: MergeJob.Params,
      merger: Merger, checkpointDir: String): StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val jurisdictions = batch.select("jurisdiction").distinct()
          .collect().map(_.getString(0)).sorted
        jurisdictions.foreach { j =>
          val p = params.copy(
            runId = s"${params.runId}-b$batchId-$j", jurisdiction = j)
          new RunTracker(wh).create(p.runId, "merge", j, 0, p.now)
          MergeJob.run(wh, p, merger)
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
