package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Warehouse
import graft.jobs.{RunTracker, ScanJob}
import graft.pipeline.{Embedder, Extractor}

/** Incremental scan pipeline (the reference's live run-progress
  * semantic, `RunMonitor.tsx:48`): a STREAM of candidate rows — e.g. a
  * harvest directory connectors keep appending to — drives the batch
  * `ScanJob` per micro-batch through `foreachBatch`. Each micro-batch
  * becomes a child run (`<runId>-b<batchId>`), so status and progress
  * land in `runs`/`run_logs` exactly as for batch scans.
  *
  * Effectively-once: the streaming checkpoint replays a failed batch
  * under the SAME batchId → same child runId, and every ScanJob write
  * is keyed deterministically (insertIfAbsent on url-derived doc ids,
  * upsert on item ids, link 5-tuples) — a replay converges to the
  * state a single execution would have produced. Cross-batch url
  * duplicates collapse the same way they do across separate batch
  * runs: first doc insert wins, item upsert is last-writer by key.
  *
  * At scale this is the always-on ingest topology: connectors append
  * files, `maxFilesPerTrigger` bounds batch size (and therefore state
  * + shuffle width per trigger), and the warehouse tables stay the
  * single source of truth shared with batch jobs.
  *
  * Semantics note: `params.maxResults` (O3 head-limit) applies PER
  * micro-batch, mirroring the reference's per-scan-run cap — a stream
  * chunked into n batches may admit up to n× the single-batch cap.
  * Size it for the per-trigger volume, not the lifetime total.
  */
object StreamingScan {

  def start(wh: Warehouse, candidates: DataFrame, params: ScanJob.Params,
      extractor: Extractor, embedder: Embedder,
      checkpointDir: String): StreamingQuery =
    candidates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val p = params.copy(runId = s"${params.runId}-b$batchId")
          new RunTracker(wh).create(p.runId, "scan", p.jurisdiction,
            p.days, p.now)
          ScanJob.run(wh, batch, p, extractor, embedder)
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
