package graft.streaming

import graft.enrich.{Checkpoint, LlmFanout, ServiceClient}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming LLM enrichment — the reference's checkpointed per-batch
  * LLM loop (src/run_predictions.py:214-231: poll → batch → LLM →
  * insert → record checkpoint, rerun-safe via the processed-keys
  * table) as a Structured Streaming foreachBatch sink composed from
  * the existing batch pieces.
  *
  * Exactly-once story, per micro-batch:
  *  1. anti-join the durable key [[Checkpoint]] — idempotence across
  *     REPLAYS: when the streaming engine re-delivers a batch (crash
  *     after sink work, before the offset commit), keys already
  *     recorded are skipped, so the LLM is called at most once per key
  *     across replays;
  *  2. [[LlmFanout.predict]] over the survivors — the batch operator
  *     unchanged (dedup-before-call, retry, error-as-value, repair);
  *  3. idempotent MERGE into the partitioned target
  *     (Sinks.upsertPartitioned) — a crash mid-write converges on
  *     re-run instead of duplicating rows;
  *  4. record the processed keys LAST: a crash between (3) and (4)
  *     re-processes that batch — at-least-once LLM calls in that
  *     narrow window, exactly-once RESULT rows (the MERGE absorbs the
  *     repeat). Recording first would instead DROP results on a crash
  *     between the two — the reference makes the same ordering choice.
  *
  * At cluster scale each micro-batch's cost follows the batch, never
  * the history: the checkpoint anti-join prunes on the key store
  * (partitioned by run), and the MERGE rewrites only touched
  * partitions.
  */
object EnrichStream {

  /** Start the enrichment sink over a streaming `claims` frame.
    *
    * @param keyCol   unique row key for the checkpoint and the MERGE
    * @param partCol  target-table partition column (must be a column
    *                 of `claims`)
    * @param ckptStorePath    durable processed-keys table (survives
    *                         stream restarts AND new stream instances)
    * @param streamCheckpointDir Structured Streaming offset checkpoint
    */
  def predictSink(claims: DataFrame, tablePath: String, keyCol: String,
                  visitCol: String, uidCol: String, partCol: String,
                  ckptStorePath: String, streamCheckpointDir: String,
                  makeClient: () => ServiceClient): StreamingQuery =
    claims.writeStream
      .option("checkpointLocation", streamCheckpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val ckpt = new Checkpoint(s, ckptStorePath, keyCol)
        // Materialized: `fresh` feeds the enrichment AND the key
        // recording, and must be STABLE between the MERGE and the
        // record — a lazy re-evaluation after the MERGE could observe
        // the store this very batch is writing.
        val fresh = graft.util.Materialize.once(ckpt.filterNew(batch))
        if (!fresh.isEmpty) {
          val enriched = LlmFanout.predict(fresh, visitCol, uidCol, makeClient)
          graft.sink.Sinks.upsertPartitioned(s, tablePath, enriched, keyCol, partCol)
          ckpt.record(fresh, runId = f"batch_$batchId%06d")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
