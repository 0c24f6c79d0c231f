package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.corpus.{CorpusGen, WebDoc}
import graft.index.{Compaction, IndexConf, IndexLayout}
import graft.oracle.{OracleDoc, SeqOracle}
import graft.query.QueryEngine
import graft.streaming.StreamIngest

/** Event row for the windowed-agg test (top-level for the implicit
  * product Encoder).
  */
final case class Ev(ts: java.sql.Timestamp, event_type: String, value: Double)

/** Structured Streaming surface (SURVEY.md §2.10, r4): continuous index
  * ingest (one append generation per micro-batch, upsert-idempotent under
  * at-least-once replay) and the watermarked windowed event rollup whose
  * batch twin is the DuckDB-oracled q_event_window.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val conf = IndexConf(numBuckets = 4)

  test("streaming ingest: one generation per micro-batch, searchable, rank-identical to batch oracle") {
    val dir = SparkTestSession.tempDir("graft-stream-ix")
    val ckpt = SparkTestSession.tempDir("graft-stream-ckpt")
    val batchA = CorpusGen.generateLocal(60)
    val batchB = CorpusGen.generateLocal(40, seed = 909L) // disjoint urls

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WebDoc]
    // AvailableNow snapshots the offsets present at START — enqueue first;
    // restarting against the same checkpoint resumes past batch A
    mem.addData(batchA: _*)
    val q = StreamIngest.start(mem.toDS(), dir, conf, ckpt,
      trigger = Trigger.AvailableNow())
    q.processAllAvailable()
    q.stop()
    assert(IndexLayout.current(spark, dir).get.size == 1) // batch 0 = build

    mem.addData(batchB: _*)
    val q2 = StreamIngest.start(mem.toDS(), dir, conf, ckpt,
      trigger = Trigger.AvailableNow())
    q2.processAllAvailable()
    q2.stop()
    assert(IndexLayout.current(spark, dir).get.size == 2) // appended gen

    // rank-identical to the oracle over A ∪ B with the engine's docId
    // assignment (A in url order from 0, B from |A|)
    val a = batchA.sortBy(_.url).zipWithIndex.map { case (d, i) =>
      OracleDoc(i.toLong, d.text, d.lang, d.url, d.warc_ts.getTime) }
    val b = batchB.sortBy(_.url).zipWithIndex.map { case (d, i) =>
      OracleDoc(60L + i, d.text, d.lang, d.url, d.warc_ts.getTime) }
    val oracle = new SeqOracle(a ++ b)
    val engine = new QueryEngine(spark, dir, conf.numBuckets)
    assert(engine.stats.n == 100)
    Seq("the", "w00001 w00002", "w00003 AND the").foreach { query =>
      val expect = oracle.topK(query, 10)
      val got = engine.search(query, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.map(_._1) == expect.map(_._1), s"q='$query'")
      got.zip(expect).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9) }
    }
  }

  test("replayed micro-batch upserts: exactly-once visibility per url") {
    // foreachBatch is at-least-once across driver crashes; re-delivering a
    // batch must leave exactly one live version of each url
    val dir = SparkTestSession.tempDir("graft-stream-replay")
    val batch = spark.createDataset(CorpusGen.generateLocal(50))
    StreamIngest.ingestBatch(batch, dir, conf) // original delivery (build)
    StreamIngest.ingestBatch(batch, dir, conf) // replay (append-upsert)
    val engine = new QueryEngine(spark, dir, conf.numBuckets)
    // every url resolves to exactly one live doc: total live docs == 50
    val live = engine.search("the", 500).collect().map(_.getLong(0))
    val doc0 = CorpusGen.doc(CorpusGen.DefaultSeed, 0L, 50L)
    assert(engine.realtimeGet(doc0.url).collect().length == 1)
    // replayed versions (docIds ≥ 50) serve; originals are superseded
    assert(live.forall(_ >= 50L), s"superseded originals leaked: ${live.toSeq}")
    // compaction folds the replay back to a single generation of 50 docs
    Compaction.run(spark, dir, conf)
    engine.invalidateCache()
    assert(engine.stats.n == 50)
    // empty batch is a no-op (no empty generations)
    val gens = IndexLayout.current(spark, dir).get
    StreamIngest.ingestBatch(spark.emptyDataset[WebDoc], dir, conf)
    assert(IndexLayout.current(spark, dir).get == gens)
  }

  test("auto-compaction bounds live generations under continuous ingest") {
    // merge policy (VERDICT r4 #2): at trigger rates of one generation per
    // micro-batch, live generations — and with them readPostings' per-query
    // union width and combinedStats' per-dir reads — must stay bounded. G=2
    // with 7 disjoint-url batches crosses the threshold repeatedly.
    val g = 2
    val dir = SparkTestSession.tempDir("graft-stream-autocompact")
    val cConf = IndexConf(numBuckets = 4, autoCompactGenerations = g)
    val batches = (0 until 7).map(i =>
      CorpusGen.generateLocal(20, seed = 5000L + i)) // disjoint urls per seed
    batches.foreach { b =>
      StreamIngest.ingestBatch(spark.createDataset(b), dir, cConf)
      // invariant AFTER EVERY batch, not just at the end: compaction runs
      // inside the append the moment a batch leaves g+1 generations live,
      // so an engine constructed at any point plans over ≤ g relations
      assert(IndexLayout.current(spark, dir).get.size <= g,
        "generation count exceeded the merge-policy bound")
    }
    // 7 batches with G=2 ends compacted to a single generation
    assert(IndexLayout.current(spark, dir).get.size == 1)

    // results survive the folds: rank-identical to the union oracle with
    // the engine's docId assignment (per-batch url order, sequential
    // offsets; compaction preserves docIds)
    var off = 0L
    val oracleDocs = batches.flatMap { b =>
      val rows = b.sortBy(_.url).zipWithIndex.map { case (d, i) =>
        OracleDoc(off + i, d.text, d.lang, d.url, d.warc_ts.getTime) }
      off += b.length
      rows
    }
    val oracle = new SeqOracle(oracleDocs)
    val engine = new QueryEngine(spark, dir, cConf.numBuckets)
    assert(engine.stats.n == 140)
    Seq("the", "w00001 w00002", "w00003 AND the").foreach { query =>
      val expect = oracle.topK(query, 10)
      val got = engine.search(query, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.map(_._1) == expect.map(_._1), s"q='$query'")
      got.zip(expect).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9) }
    }
  }

  test("live engine survives auto-compaction: stale caches refresh, no resurrection") {
    // compaction is AUTOMATIC under streaming appends (r5): an engine
    // constructed before a merge holds cached postings + a stale pointer.
    // Without the per-query staleness guard it would serve upsert victims
    // out of segCache once the folded supersedes disappear (measured
    // failure mode), or crash on GC'd files.
    val dir = SparkTestSession.tempDir("graft-stream-stale")
    val cConf = IndexConf(numBuckets = 4, autoCompactGenerations = 2)
    val b1 = CorpusGen.generateLocal(30, seed = 881L)
    StreamIngest.ingestBatch(spark.createDataset(b1), dir, cConf) // build
    val engine = new QueryEngine(spark, dir, cConf.numBuckets)
    engine.search("the", 100).collect() // warm segCache on the OLD view
    StreamIngest.ingestBatch(
      spark.createDataset(CorpusGen.generateLocal(20, seed = 882L)), dir, cConf)
    // re-ingest b1: upserts all 30 urls → 3 gens > G → auto merge + GC
    StreamIngest.ingestBatch(spark.createDataset(b1), dir, cConf)
    assert(IndexLayout.current(spark, dir).get.size <= 2)

    val fresh = new QueryEngine(spark, dir, cConf.numBuckets)
    val expect = fresh.search("the", 200).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = engine.search("the", 200).collect() // STALE engine, no manual invalidate
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect, s"stale engine diverged:\n got=$got\n exp=$expect")
    // b1's original docIds (0..29) were all superseded — none may resurface
    assert(!got.exists(_._1 < 30L), "upsert victims resurrected from stale cache")
    assert(got.nonEmpty)
  }

  test("watermarked windowed agg: streaming output equals the batch twin (q_event_window)") {
    def ev(minOff: Int, tpe: String, v: Double): Ev =
      Ev(new java.sql.Timestamp(1704067200000L + minOff * 60000L), tpe, v)
    // two hours of events, delivered OUT OF ORDER across batches (late
    // arrivals within the watermark)
    val rows = Seq(
      ev(5, "click", 1.0), ev(130, "click", 3.0), ev(61, "buy", 10.0),
      ev(10, "buy", 2.5), ev(62, "click", 4.0), ev(125, "buy", 7.5),
      ev(15, "click", 0.5))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamIngest.windowedEventAgg(mem.toDF(),
      watermarkDelay = "3 hours")
    val q = agg.writeStream.format("memory").queryName("evagg")
      .outputMode("complete").start()
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*) // late-but-within-watermark arrivals
    q.processAllAvailable()
    q.stop()
    val got = spark.table("evagg")
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // batch twin: identical aggregation over the same static rows
    val expect = spark.createDataset(rows).toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start"), col("event_type"), col("cnt"),
        col("sum_value"))
      .orderBy("start", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty && got.map(_._3).sum == rows.length)
  }
}
