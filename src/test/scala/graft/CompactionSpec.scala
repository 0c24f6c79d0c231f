package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{Compaction, IndexBuilder, IndexConf, IndexLayout}
import graft.oracle.SeqOracle
import graft.query.{Deletes, QueryEngine}

/** Compaction folds tombstones in and recomputes corpus/term stats: the
  * compacted index must be rank-identical to an oracle over the surviving
  * corpus (original docIds preserved). Publication is atomic at the pointer
  * flip — a crash injected after all data is written but before the flip
  * leaves the previous generation serving, unchanged.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("compacted index == oracle over surviving corpus") {
    val dir = SparkTestSession.tempDir("graft-compact")
    val n = 200L
    val conf = IndexConf(numBuckets = 4, segmentMaxDocs = 32)
    IndexBuilder.build(spark, CorpusGen.generate(spark, n), dir, conf)

    val victims = Seq(3L, 17L, 42L, 99L, 150L)
    Deletes.delete(spark, dir, victims)
    Compaction.run(spark, dir, conf)

    // tombstones must be gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombstones")))
    // the superseded generation is GC'd, exactly one live segdir remains
    assert(IndexLayout.current(spark, dir).get.size == 1)

    val all = CorpusGen.generateLocal(n).sortBy(_.url).zipWithIndex
      .map { case (d, i) => (i.toLong, d.text, d.lang) }
    val survivors = all.filterNot(d => victims.contains(d._1))
    val oracle = new SeqOracle(survivors)

    val engine = new QueryEngine(spark, dir, conf.numBuckets)
    Seq("the", "w00001 w00002", "w00003 AND the", "w00017 NOT w00042")
      .foreach { q =>
        val expect = oracle.topK(q, 10)
        Seq(
          engine.searchWand(q, 10), engine.searchExhaustive(q, 10)
        ).foreach { df =>
          val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
          assert(got.map(_._1) == expect.map(_._1),
            s"q='$q'\n got=$got\n exp=$expect")
          got.zip(expect).foreach { case ((_, gs), (_, es)) =>
            assert(math.abs(gs - es) < 1e-9, s"q='$q' score $gs != $es")
          }
          assert(!got.exists(g => victims.contains(g._1)))
        }
      }
  }

  test("crash before publish leaves the old generation serving") {
    val dir = SparkTestSession.tempDir("graft-compact-crash")
    val n = 150L
    val conf = IndexConf(numBuckets = 4)
    IndexBuilder.build(spark, CorpusGen.generate(spark, n), dir, conf)
    val engine = new QueryEngine(spark, dir, conf.numBuckets)
    val before = engine.search("the", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pointerBefore = IndexLayout.current(spark, dir)

    Deletes.delete(spark, dir, Seq(before.head._1))
    intercept[RuntimeException] {
      Compaction.runInternal(spark, dir, conf, failBeforePublish = true)
    }

    // pointer unchanged → a fresh reader sees the OLD index (tombstones still
    // pending, so the delete still masks at query time — but no data loss)
    assert(IndexLayout.current(spark, dir) == pointerBefore)
    val fresh = new QueryEngine(spark, dir, conf.numBuckets)
    assert(fresh.stats.n == n)
    // retrying the compaction completes and converges to the same state
    Compaction.run(spark, dir, conf)
    val after = new QueryEngine(spark, dir, conf.numBuckets)
    assert(after.stats.n == n - 1)
    assert(!after.search("the", 10).collect().map(_.getLong(0))
      .contains(before.head._1))
  }
}
