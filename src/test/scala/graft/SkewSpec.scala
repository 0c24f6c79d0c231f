package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index._
import graft.oracle.SeqOracle
import graft.query.QueryEngine

/** Stopword-heavy stress fixture (FIXTURES.md webdocs_skew): salted
  * docId-range segmentation must cap per-segment size AND stay
  * rank-identical to the oracle.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("skewed corpus: segments bounded, queries still exact") {
    val dir = SparkTestSession.tempDir("graft-skew")
    val n = 400L
    val conf = IndexConf(numBuckets = 4, segmentMaxDocs = 48)
    IndexBuilder.build(spark, CorpusGen.generate(spark, n, skew = true),
      dir, conf)

    val segs = spark.read
      .parquet(IndexLayout.postingsPaths(spark, dir): _*)
      .as[PostingSegment].collect()
    // docId-range splitting bounds the AVERAGE segment at segmentMaxDocs;
    // per-range counts fluctuate, so allow 2x before calling it skew
    val maxSeg = segs.map(_.count).max
    assert(maxSeg <= conf.segmentMaxDocs * 2, s"segment of $maxSeg postings")
    // the stopword head really is salted into many segments
    val theSegs = segs.filter(_.term == "the")
    assert(theSegs.length >= 5, s"'the' has only ${theSegs.length} segments")
    assert(theSegs.map(_.count.toLong).sum > conf.segmentMaxDocs)

    val docs = CorpusGen.generateLocal(n, skew = true).sortBy(_.url).zipWithIndex
      .map { case (d, i) => (i.toLong, d.text, d.lang) }
    val oracle = new SeqOracle(docs)
    val engine = new QueryEngine(spark, dir, conf.numBuckets)
    Seq("the", "the AND of", "w00002 NOT the", "the of and a to").foreach { q =>
      val expect = oracle.topK(q, 10)
      val got = engine.search(q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.map(_._1) == expect.map(_._1),
        s"q='$q'\n got=$got\n exp=$expect")
      got.zip(expect).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9) }
    }
  }
}
