package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.corpus.WebDoc
import graft.index.{IndexBuilder, IndexConf, IndexLayout}

/** Structured Streaming surface of the engine (SURVEY.md §2.10, promoted
  * from non-goal in r4). The reference has no streaming — its operating
  * model is re-runnable chunked batch ingest (indexdata.py:1778–1788) — but
  * a Spark-native engine gets continuous ingest almost for free, because the
  * batch machinery already has the two properties a streaming sink needs:
  *
  *  - **Atomic visibility per micro-batch**: each batch lands as one append
  *    generation, published by a single pointer-file flip
  *    ([[IndexLayout.publish]]). Readers see a batch entirely or not at all.
  *  - **Idempotent replay by key**: foreachBatch is at-least-once across
  *    driver crashes (the batch whose checkpoint commit didn't land is
  *    re-delivered). Re-appending the same urls UPSERTS them — the replayed
  *    batch's versions supersede the half-committed ones, so the index
  *    converges to exactly-once visibility PER URL, the same same-id
  *    overwrite contract the reference gets from Solr (indexdata.py:1306).
  *
  * Scale shape: one generation per micro-batch → generation count would grow
  * with trigger rate, but the append path's merge policy
  * (IndexConf.autoCompactGenerations, r5) runs [[graft.index.Compaction]]
  * whenever a batch leaves more than G live generations, folding them back
  * to one (the Lucene near-real-time pattern: small flushed segments +
  * background merges) — live generations, and hence query planning cost,
  * stay bounded at any trigger rate.
  */
object StreamIngest {

  /** The per-batch sink body: first-ever batch builds the index, later ones
    * append (upsert-by-url). Empty batches are skipped — no empty
    * generations. Exposed for direct testing of replay idempotence.
    */
  def ingestBatch(docs: Dataset[WebDoc], indexDir: String,
      conf: IndexConf): Unit = {
    val spark = docs.sparkSession
    if (docs.isEmpty) return
    if (IndexLayout.current(spark, indexDir).isEmpty)
      IndexBuilder.build(spark, docs, indexDir, conf)
    else
      IndexBuilder.append(spark, docs, indexDir, conf)
  }

  /** Continuous index ingest: a streaming Dataset[WebDoc] → one append
    * generation per micro-batch. `checkpointLoc` is the Structured
    * Streaming progress log (source offsets); index durability itself never
    * depends on it — a lost checkpoint at worst re-ingests batches, which
    * upsert idempotently.
    */
  def start(source: Dataset[WebDoc], indexDir: String,
      conf: IndexConf = IndexConf(), checkpointLoc: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointLoc)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[WebDoc], _: Long) =>
        ingestBatch(batch, indexDir, conf)
      }
      .start()

  /** Streaming analytics twin (readStream → watermark → windowed agg →
    * writeStream): tumbling-window event rollups with late-data handling.
    * The BATCH twin ([[graft.ops.Ops.eventWindow]]) runs the identical
    * aggregation over the static events table and is DuckDB-oracled —
    * streaming and batch share one aggregation definition, Spark's
    * unified-engine contract.
    *
    * @param events streaming DataFrame with (ts: Timestamp, event_type:
    *   String, value: Double) columns
    * @param watermarkDelay how late events may arrive before their window
    *   is finalized (state is dropped past it — bounded state at any rate)
    */
  def windowedEventAgg(events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("sum_value"))
}
