package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index._
import graft.query.{Deletes, QueryEngine}

/** Solr backup analog: a snapshot is a frozen, self-contained index —
  * immune to later mutation of the source, carrying the deletes visible at
  * snapshot time, and a valid base for its own appends.
  */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val conf = IndexConf(numBuckets = 4, segmentMaxDocs = 64)

  test("snapshot is point-in-time: source mutations never leak in") {
    val dir = SparkTestSession.tempDir("graft-snap-src")
    val snap = SparkTestSession.tempDir("graft-snap-dst") + "/s1"
    IndexBuilder.build(spark, CorpusGen.generate(spark, 300L), dir, conf)
    val src = new QueryEngine(spark, dir, conf.numBuckets)

    // a pre-snapshot delete must travel WITH the snapshot
    val preVictim = src.search("w00017", 1).collect().head.getLong(0)
    Deletes.delete(spark, dir, Seq(preVictim))
    src.invalidateCache()
    val baselineQ = "w00017 w00342"
    val baseline = src.search(baselineQ, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val baselineCount = src.countMatches("*:*")

    val report = Snapshot.run(spark, dir, snap)
    assert(report.segdirs.nonEmpty && report.bytes > 0)
    assert(report.tombstoneFiles > 0, "pre-snapshot delete must be carried")

    // mutate the SOURCE after the snapshot: append a disjoint batch and
    // delete more docs
    IndexBuilder.append(spark,
      CorpusGen.generate(spark, 100L, seed = 777L), dir, conf)
    val postVictim = baseline.head._1
    Deletes.delete(spark, dir, Seq(postVictim))
    src.invalidateCache()

    // the snapshot still answers exactly the pre-mutation results
    val se = new QueryEngine(spark, snap, conf.numBuckets)
    val got = se.search(baselineQ, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == baseline, "snapshot must be bit-identical to its moment")
    assert(se.countMatches("*:*") == baselineCount)
    // the pre-snapshot tombstone holds; the post-snapshot one does not
    assert(!got.map(_._1).contains(preVictim))
    assert(got.map(_._1).contains(postVictim))
    // ...while the source reflects both mutations
    val after = src.search(baselineQ, 20).collect().map(_.getLong(0)).toSeq
    assert(!after.contains(postVictim))
    assert(src.countMatches("*:*") == baselineCount + 100L - 1L)

    // the snapshot is a full index: bucket count self-describes and it
    // accepts its own appends without touching the source
    val r2 = IndexBuilder.append(spark,
      CorpusGen.generate(spark, 50L, seed = 888L), snap, conf)
    assert(r2.docs == 50L)
    se.invalidateCache()
    assert(se.countMatches("*:*") == baselineCount + 50L)
    assert(src.countMatches("*:*") == baselineCount + 100L - 1L)
  }

  test("snapshot refuses an existing destination and an unpublished source") {
    val dir = SparkTestSession.tempDir("graft-snap-src2")
    IndexBuilder.build(spark, CorpusGen.generate(spark, 50L), dir, conf)
    val dst = SparkTestSession.tempDir("graft-snap-dst2")
    intercept[IllegalArgumentException](Snapshot.run(spark, dir, dst))
    val empty = SparkTestSession.tempDir("graft-snap-none")
    intercept[IllegalStateException](
      Snapshot.run(spark, empty, dst + "/never"))
  }
}
