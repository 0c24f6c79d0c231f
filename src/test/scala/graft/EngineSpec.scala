package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.index._
import graft.oracle.SeqOracle
import graft.query.{QueryEngine, Deletes}

/** End-to-end: distributed build → golden queries rank-identical to the
  * sequential oracle (FIXTURES.md §3) via BOTH physical strategies, plus
  * index-structure invariants, determinism across parallelism, resume, and
  * deletes.
  */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val NDocs = 500L
  private val conf = IndexConf(numBuckets = 8, segmentMaxDocs = 64)

  /** Build once, share across tests in this suite. */
  private lazy val indexDir: String = {
    val dir = SparkTestSession.tempDir("graft-index")
    val docs = CorpusGen.generate(spark, NDocs)
    IndexBuilder.build(spark, docs, dir, conf)
    dir
  }

  /** Oracle over the same corpus with the engine's docId assignment
    * (dense rank in url order).
    */
  private lazy val oracle: SeqOracle = {
    val docs = CorpusGen.generateLocal(NDocs).sortBy(_.url)
    new SeqOracle(docs.zipWithIndex.map { case (d, i) =>
      (i.toLong, d.text, d.lang)
    })
  }

  private lazy val engine = new QueryEngine(spark, indexDir, conf.numBuckets)

  private val goldenQueries = Seq(
    "w00017", "the", "w00017 w00342", "w00017 AND w00342",
    "\"w00017 w00342\"", "w00017 NOT w00342", "text:w01234",
    "lang:no AND w00099", "w49998", "w00001 w00002 w00003 w00004 w00005")

  private def assertRankIdentical(got: Seq[(Long, Double)],
      expect: Seq[(Long, Double)], ctx: String): Unit = {
    assert(got.map(_._1) == expect.map(_._1),
      s"[$ctx]\n got=${got.take(12)}\n exp=${expect.take(12)}")
    got.zip(expect).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) < 1e-9, s"[$ctx] score $gs != $es")
    }
  }

  test("index invariants: stats, df, doclen match oracle") {
    val stats = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
    assert(stats.n == NDocs)
    assert(math.abs(stats.avgdl - oracle.avgdl) < 1e-9)
    assert(stats.totalTerms == oracle.totalTerms)

    val segs = spark.read.parquet(s"$indexDir/postings").as[PostingSegment]
      .collect()
    // per-term: df equals oracle df; segment counts sum to df; docIds sorted
    segs.groupBy(_.term).foreach { case (term, ss) =>
      assert(ss.head.df == oracle.df(term), s"df mismatch for $term")
      assert(ss.head.cf == oracle.cf(term), s"cf mismatch for $term")
      assert(ss.map(_.count.toLong).sum == oracle.df(term))
      // segments docId-disjoint and internally sorted
      val ranges = ss.sortBy(_.firstDocId).toSeq
      ranges.sliding(2).foreach { w =>
        if (w.size == 2) assert(w(0).lastDocId < w(1).firstDocId)
      }
      ss.foreach { s =>
        val (ids, _, _) = PostingCodec.decodeAll(s)
        assert(ids.toSeq == ids.sorted.toSeq)
        assert(s.termBucket == IndexBuilder.bucketOf(term, conf.numBuckets))
      }
    }
    // skewed terms really are segmented
    val stopSegs = segs.filter(_.term == "the")
    assert(stopSegs.length > 1, "expected 'the' to be split into segments")
  }

  test("docs table: dense docIds in url order, doclen matches tokenizer") {
    val docsT = spark.read.parquet(s"$indexDir/docs")
      .orderBy("docId").collect()
    assert(docsT.length == NDocs)
    val urls = docsT.map(_.getAs[String]("url"))
    assert(urls.toSeq == urls.sorted.toSeq)
    assert(docsT.map(_.getAs[Long]("docId")).toSeq == (0L until NDocs))
    val expected = CorpusGen.generateLocal(NDocs).sortBy(_.url)
    docsT.zip(expected).foreach { case (row, d) =>
      assert(row.getAs[String]("url") == d.url)
      assert(row.getAs[Long]("doclen") ==
        Analysis.tokenize(d.text).length.toLong)
    }
  }

  test("golden queries: WAND (driver + distributed) and exhaustive rank-identical to oracle") {
    // force the distributed windowed path with a zero driver threshold
    val distEngine = new QueryEngine(spark, indexDir, conf.numBuckets,
      driverWandMaxSegments = 0)
    goldenQueries.foreach { q =>
      val expect = oracle.topK(q, 10)
      val wand = engine.searchWand(q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val dist = distEngine.searchWand(q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exh = engine.searchExhaustive(q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assertRankIdentical(wand, expect, s"WAND-driver q='$q'")
      assertRankIdentical(dist, expect, s"WAND-dist q='$q'")
      assertRankIdentical(exh, expect, s"EXH q='$q'")
    }
  }

  test("k larger than hit count returns all hits") {
    val q = "w49998"
    val expect = oracle.topK(q, 10000)
    val got = engine.search(q, 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assertRankIdentical(got, expect, "large-k")
  }

  test("deletes: tombstoned docs vanish from results (both paths)") {
    val dir = SparkTestSession.tempDir("graft-del")
    val docs = CorpusGen.generate(spark, 200)
    IndexBuilder.build(spark, docs, dir, IndexConf(numBuckets = 4))
    val eng = new QueryEngine(spark, dir, 4)
    val before = eng.search("the", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(before.nonEmpty)
    val victim = before.head._1
    Deletes.delete(spark, dir, Seq(victim))
    val afterW = eng.searchWand("the", 10).collect().map(_.getLong(0))
    val afterE = eng.searchExhaustive("the", 10).collect().map(_.getLong(0))
    assert(!afterW.contains(victim))
    assert(!afterE.contains(victim))
    assert(afterW.toSeq == afterE.toSeq)
  }
}
