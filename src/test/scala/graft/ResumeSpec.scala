package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path

import graft.corpus.CorpusGen
import graft.index._

/** Kill-and-resume at bucket granularity: wipe some completed buckets (data
  * + manifest rows), resume, assert the index is logically identical to an
  * untouched build (north_rule checkpoint/lineage requirement). Also covers
  * the crash-before-publish case: a build killed before the pointer flip is
  * finished and published by resume.
  */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val N = 250L
  private val conf = IndexConf(numBuckets = 6, segmentMaxDocs = 64)

  private def logicalPostings(dir: String) =
    spark.read.parquet(IndexLayout.postingsPaths(spark, dir): _*)
      .as[PostingSegment].collect()
      .map { s =>
        val (ids, tfs, dls) = PostingCodec.decodeAll(s)
        (s.term, s.segment, s.count, s.cf, ids.toSeq, tfs.toSeq, dls.toSeq,
          PostingCodec.decodePositions(s).map(_.toSeq).toSeq)
      }.sortBy(t => (t._1, t._2)).toSeq

  test("resume rebuilds exactly the missing buckets") {
    val ref = SparkTestSession.tempDir("graft-resume-ref")
    val dir = SparkTestSession.tempDir("graft-resume")
    val docs = CorpusGen.generate(spark, N)
    IndexBuilder.build(spark, docs, ref, conf)
    IndexBuilder.build(spark, docs, dir, conf)

    // simulate a kill after some buckets: drop bucket dirs 1 and 4 plus their
    // manifest rows (manifest is the commit marker)
    val seg = IndexLayout.latestSegDir(spark, dir).get
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1, 4).foreach { b =>
      assert(fs.delete(new Path(s"$dir/$seg/postings/termBucket=$b"), true))
    }
    val manifest = spark.read.parquet(s"$dir/$seg/manifest").as[ManifestRow]
      .collect().filterNot(m => Seq(1, 4).contains(m.partitionId))
    manifest.toSeq.toDS().coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/$seg/manifest")

    val report = IndexBuilder.resume(spark, docs, dir, conf)
    assert(report.docs == N)

    assert(logicalPostings(dir) == logicalPostings(ref),
      "resumed index differs from reference build")
    val m2 = spark.read.parquet(s"$dir/$seg/manifest").as[ManifestRow].collect()
    assert(m2.map(_.partitionId).sorted.toSeq == (0 until conf.numBuckets))
    assert(m2.forall(_.status == "complete"))
  }

  test("resume on a complete index is a no-op") {
    val dir = SparkTestSession.tempDir("graft-resume-noop")
    val docs = CorpusGen.generate(spark, 100)
    IndexBuilder.build(spark, docs, dir, IndexConf(numBuckets = 4))
    val before = logicalPostings(dir)
    val r = IndexBuilder.resume(spark, docs, dir, IndexConf(numBuckets = 4))
    assert(r.docs == 0 && r.segments == 0)
    assert(logicalPostings(dir) == before)
  }

  test("resume publishes a build killed before the pointer flip") {
    val ref = SparkTestSession.tempDir("graft-resume-ref2")
    val dir = SparkTestSession.tempDir("graft-resume-unpub")
    val docs = CorpusGen.generate(spark, 120)
    val c = IndexConf(numBuckets = 4)
    IndexBuilder.build(spark, docs, ref, c)
    IndexBuilder.build(spark, docs, dir, c)
    // simulate dying right before publish: delete every pointer file
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir)).foreach { st =>
      if (st.getPath.getName.startsWith("current-"))
        fs.delete(st.getPath, false)
    }
    assert(IndexLayout.current(spark, dir).isEmpty)
    IndexBuilder.resume(spark, docs, dir, c)
    assert(IndexLayout.current(spark, dir).nonEmpty)
    assert(logicalPostings(dir) == logicalPostings(ref))
  }
}
