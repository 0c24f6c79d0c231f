package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.WebDoc
import graft.index._
import graft.query.QueryEngine

/** Snapshot isolation under real concurrency: reader threads query ONE
  * shared engine instance while a writer appends batches (with a small
  * auto-compaction threshold, so tiered/full merges and their pointer
  * flips race the readers). The invariants are the ones the IndexView
  * design promises (QueryEngine.scala IndexView scaladoc):
  *
  *  - batch visibility is ALL-OR-NOTHING — a batch's marker term matches
  *    0 or exactly batchSize docs, never a partial count (the atomic
  *    rename pointer flip, observed from a live reader mid-publish);
  *  - per-reader visibility is MONOTONE — once a thread has seen a batch,
  *    no later query on that thread un-sees it (view swaps only advance:
  *    the pointer read and the volatile assignment share one lock);
  *  - cross-batch counts are whole multiples of batchSize — a query never
  *    pairs one batch's postings with another snapshot's stats/segments;
  *  - no reader ever throws (compaction retires segdirs but the GC grace
  *    keeps them readable for in-flight views).
  *
  * Auto-compaction fires mid-run (generations exceed 3 twice over 5
  * appends), so readers race both plain appends and merges. GC runs with
  * the default 15-minute grace — retired generations stay on disk for the
  * duration, which is exactly the production contract this test leans on.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val BatchSize = 30
  private val NBatches = 5 // appended batches 1..5; batch 0 is the build

  private def mk(b: Int, i: Int): WebDoc = {
    val text = s"bt$b marker item number $i common words tail$b$i"
    WebDoc(s"https://conc.example.org/$b/$i",
      new java.sql.Timestamp(1704067200000L + b * 86400000L + i * 1000L),
      s"<html><head><title>t</title></head><body>$text</body></html>"
        .getBytes(UTF_8),
      text, "en")
  }

  private def batch(b: Int): Seq[WebDoc] = (0 until BatchSize).map(mk(b, _))

  test("readers racing appends + auto-compaction see whole snapshots only") {
    val dir = SparkTestSession.tempDir("graft-conc")
    val conf = IndexConf(numBuckets = 4, segmentMaxDocs = 64,
      autoCompactGenerations = 3)
    IndexBuilder.build(spark, spark.createDataset(batch(0)), dir, conf)

    val engine = new QueryEngine(spark, dir, conf.numBuckets)
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val writerDone = new AtomicBoolean(false)
    // per-reader evidence the loop actually overlapped the publishes:
    // highest appended batch (≥ 1) a reader saw BECOME visible mid-loop
    val sawAppended = new java.util.concurrent.atomic.AtomicIntegerArray(3)
    val iters = new java.util.concurrent.atomic.AtomicIntegerArray(3)

    val readers = (0 until 3).map { r =>
      val t = new Thread(() => {
        try {
          val rng = new java.util.Random(100L + r)
          val seen = Array.fill(NBatches + 1)(false)
          seen(0) = true
          val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
          // loop until the WRITER finishes (no iteration cap — a cap can
          // expire during the first append and never race a merge); the
          // deadline is a hang backstop only
          while (!writerDone.get && System.nanoTime() < deadline) {
            iters.incrementAndGet(r)
            val b = rng.nextInt(NBatches + 1)
            val hits = engine.search(s"bt$b", 1000).collect().length
            assert(hits == 0 || hits == BatchSize,
              s"reader$r: batch $b PARTIALLY visible: $hits of $BatchSize")
            if (hits == BatchSize) {
              seen(b) = true
              if (b > sawAppended.get(r)) sawAppended.set(r, b)
            } else assert(!seen(b),
              s"reader$r: batch $b visibility regressed (was seen, now 0)")
            if (iters.get(r) % 4 == 0) {
              // every doc of every batch contains 'marker': any snapshot
              // yields a whole-batch multiple
              val c = engine.search("marker", 5000).collect().length
              assert(c % BatchSize == 0 &&
                c >= BatchSize && c <= (NBatches + 1) * BatchSize,
                s"reader$r: cross-batch count $c is not a whole number " +
                  s"of $BatchSize-doc batches")
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      }, s"conc-reader-$r")
      t.setDaemon(true)
      t.start()
      t
    }

    try {
      (1 to NBatches).foreach { b =>
        IndexBuilder.append(spark, spark.createDataset(batch(b)), dir, conf)
      }
    } finally writerDone.set(true)
    readers.foreach(_.join(330000L))
    assert(readers.forall(!_.isAlive), "reader thread hung")
    if (!errors.isEmpty) throw errors.peek()
    // the race was real: every reader kept querying through the writes, and
    // appended batches became visible WHILE readers were looping (not just
    // in the quiesced checks below). autoCompactGenerations=3 over 5
    // appends fires ≥1 merge inside the raced window.
    (0 until 3).foreach { r =>
      assert(iters.get(r) >= 10, s"reader$r only ran ${iters.get(r)} iters")
    }
    val bestSeen = (0 until 3).map(sawAppended.get).max
    assert(bestSeen >= 3,
      s"readers only saw batches up to $bestSeen mid-loop — no real overlap")

    // quiesced: everything visible, engine picks it up without an explicit
    // invalidate (per-query staleness guard), auto-compaction has bounded
    // the live generations
    val total = engine.search("marker", 5000).collect().length
    assert(total == (NBatches + 1) * BatchSize)
    (0 to NBatches).foreach { b =>
      assert(engine.search(s"bt$b", 1000).collect().length == BatchSize)
    }
    val liveGens = IndexLayout.current(spark, dir).map(_.size).getOrElse(0)
    assert(liveGens > 0 && liveGens <= conf.autoCompactGenerations + 1,
      s"auto-compaction left $liveGens live generations")
  }
}
