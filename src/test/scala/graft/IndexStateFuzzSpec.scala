package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{CorpusGen, WebDoc}
import graft.index._
import graft.query.{QueryEngine, Deletes}

/** State-machine fuzz over the incremental machinery: a seeded random
  * sequence of append / upsert / delete / compact / hostile-GC (grace 0)
  * / paged delete-all-by-query steps against a driver-side model of the
  * live corpus, with invariants checked after EVERY step:
  *
  *  - each live url realtime-gets exactly one row; deleted urls get none;
  *  - each url's CURRENT version token matches exactly one doc, and its
  *    superseded version tokens match none;
  *  - per-term hit counts equal the model's live containment counts;
  *  - after a final FULL compaction, (url, score) result sets are identical
  *    to a from-scratch build over the model's live docs (stats fold down
  *    to exactly the surviving corpus).
  *
  * Auto-compaction is enabled with a small threshold so tiered merges fire
  * MID-sequence — the interleavings (upsert → partial merge → delete →
  * re-upsert …) are where the supersedes/tombstone/high-water rules earn
  * their keep. Fixed seed: the sequence is deterministic.
  */
class IndexStateFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val conf = IndexConf(numBuckets = 6, segmentMaxDocs = 64,
    autoCompactGenerations = 4)

  private val rng = new java.util.Random(51L)

  private def withVersion(d: WebDoc, tok: String): WebDoc = {
    val text = s"$tok ${d.text}"
    d.copy(text = text,
      html = s"<html><head><title>t</title></head><body>$text</body></html>"
        .getBytes(UTF_8))
  }

  test("random append/upsert/delete/compact sequence preserves the model") {
    val dir = SparkTestSession.tempDir("graft-statefuzz")
    val N0 = 120L
    var nextI = N0 // fresh-url id space (urls are pure functions of (seed,i))
    val version = scala.collection.mutable.Map.empty[String, Int] // url → v
    val iOf = scala.collection.mutable.Map.empty[String, Long]    // url → i
    val base = scala.collection.mutable.Map.empty[String, WebDoc] // url → v0
    val model = scala.collection.mutable.Map.empty[String, WebDoc] // live
    val deleted = scala.collection.mutable.Set.empty[String]

    def vtok(url: String, v: Int) = s"fz${iOf(url)}x$v"

    val initial = (0L until N0).map(CorpusGen.doc(CorpusGen.DefaultSeed, _, N0))
    initial.foreach { d =>
      iOf(d.url) = iOf.size.toLong; base(d.url) = d; model(d.url) = d
    }
    IndexBuilder.build(spark, spark.createDataset(initial.toSeq), dir, conf)
    val engine = new QueryEngine(spark, dir, conf.numBuckets)

    def freshDoc(): WebDoc = {
      val d = CorpusGen.doc(CorpusGen.DefaultSeed, nextI, N0)
      iOf(d.url) = nextI; base(d.url) = d; nextI += 1
      d
    }

    def checkInvariants(step: String): Unit = {
      engine.invalidateCache()
      val liveUrls = model.keys.toSeq.sorted
      // sampled RTG visibility (all of them is O(n) queries — sample 8)
      rng.ints(8, 0, liveUrls.size).toArray.map(liveUrls).foreach { u =>
        assert(engine.realtimeGet(u).collect().length == 1,
          s"[$step] live url $u not visible")
      }
      deleted.toSeq.sorted.take(4).foreach { u =>
        assert(engine.realtimeGet(u).collect().isEmpty,
          s"[$step] deleted url $u resurrected")
      }
      // version tokens: current matches exactly one, prior matches none
      version.toSeq.sortBy(_._1).take(6).foreach { case (u, v) =>
        if (model.contains(u)) {
          assert(engine.search(vtok(u, v), 10).collect().length == 1,
            s"[$step] current version of $u invisible")
        }
        (1 until v).foreach { old =>
          assert(engine.search(vtok(u, old), 10).collect().isEmpty,
            s"[$step] superseded version $old of $u still matches")
        }
      }
      // per-term counts vs model containment
      Seq("w00005", "w00017", "w00099").foreach { t =>
        val expect = model.valuesIterator
          .count(d => Analysis.tokenize(d.text).contains(t))
        val got = engine.search(t, 5000).collect().length
        assert(got == expect, s"[$step] term $t: engine $got != model $expect")
      }
    }

    // mid-sequence snapshots: (dir, per-term model counts, live-doc count)
    // frozen at snapshot time, re-verified after the WHOLE remaining
    // mutation history (upserts, deletes, compactions, grace-0 GC) has
    // run against the source
    val snaps = scala.collection.mutable.ArrayBuffer
      .empty[(String, Map[String, Int], Int)]

    val steps = 12
    (0 until steps).foreach { s =>
      rng.nextInt(7) match {
        case 0 => // append a batch of fresh urls
          val batch = Seq.fill(2 + rng.nextInt(4))(freshDoc())
          batch.foreach(d => model(d.url) = d)
          batch.foreach(d => deleted.remove(d.url))
          IndexBuilder.append(spark, spark.createDataset(batch), dir, conf)
          checkInvariants(s"step$s-append")
        case 1 => // upsert existing urls to a new version (+ maybe 1 fresh)
          val urls = model.keys.toSeq.sorted
          val picks = rng.ints(1 + rng.nextInt(3), 0, urls.size)
            .toArray.distinct.map(urls)
          val ups = picks.toSeq.map { u =>
            val v = version.getOrElse(u, 0) + 1
            version(u) = v
            // version text derives from the BASE doc, so superseded version
            // tokens really do vanish from the corpus
            val nd = withVersion(base(u), vtok(u, v))
            model(u) = nd
            nd
          } ++ (if (rng.nextBoolean()) {
            val d = freshDoc(); model(d.url) = d; Seq(d)
          } else Nil)
          IndexBuilder.append(spark, spark.createDataset(ups), dir, conf)
          checkInvariants(s"step$s-upsert")
        case 2 => // delete current versions of some urls
          val urls = model.keys.toSeq.sorted
          val picks = rng.ints(1 + rng.nextInt(2), 0, urls.size)
            .toArray.distinct.map(urls)
          val ids = picks.toSeq.map { u =>
            engine.invalidateCache()
            engine.realtimeGet(u).collect().head.getAs[Long]("docId")
          }
          Deletes.delete(spark, dir, ids)
          picks.foreach { u => model.remove(u); deleted += u }
          checkInvariants(s"step$s-delete")
        case 3 => // explicit compaction (auto fires on its own too)
          Compaction.run(spark, dir, conf)
          checkInvariants(s"step$s-compact")
        case 4 => // hostile GC: grace 0 reaps everything unreferenced NOW —
          // retired generations, superseded pointers, condemned tombstone
          // files. After any append/merge history this must never disturb
          // the published snapshot (non-condemned tombstones, supersedes,
          // live segdirs all survive; the engine re-resolves per query).
          IndexLayout.gcUnreferenced(spark, dir, graceMs = 0L)
          checkInvariants(s"step$s-gc0")
        case 5 if snaps.size < 2 => // point-in-time snapshot (r5): freeze
          // the model's observable state now; verified at the very end
          val sd = SparkTestSession.tempDir("graft-statefuzz-snap") + s"/s$s"
          Snapshot.run(spark, dir, sd)
          val counts = Seq("w00005", "w00017", "w00099").map { t =>
            t -> model.valuesIterator
              .count(d => Analysis.tokenize(d.text).contains(t))
          }.toMap
          snaps += ((sd, counts, model.size))
          checkInvariants(s"step$s-snapshot") // source unaffected
        case 5 => // snapshot budget spent: exercise compaction instead
          Compaction.run(spark, dir, conf)
          checkInvariants(s"step$s-compact2")
        case _ => // paged delete-all by query (r5): the searchAfter cursor
          // walk must reach EXACTLY the model's matching live docs, with
          // later anchors computed while earlier flushes' tombstones are
          // already on disk (flushEvery=4 forces mid-walk flushes),
          // against whatever upsert/merge history came before
          val t = Seq("w00005", "w00017", "w00099")(rng.nextInt(3))
          val expect = model.collect { case (u, d)
            if Analysis.tokenize(d.text).contains(t) => u }.toSeq
          val n = engine.deleteAllByQuery(t, pageSize = 3, flushEvery = 4)
          assert(n == expect.size.toLong,
            s"step$s-delall('$t'): engine deleted $n, model says ${expect.size}")
          expect.foreach { u => model.remove(u); deleted += u }
          checkInvariants(s"step$s-delall")
      }
    }

    // re-add one deleted url: the new version must be visible — partial
    // merges keep old tombstones alive, and only the docId high-water rule
    // stops them from masking the re-added doc (the r5 hwm bug class)
    deleted.headOption.foreach { u =>
      val v = version.getOrElse(u, 0) + 1
      version(u) = v
      val nd = withVersion(base(u), vtok(u, v))
      IndexBuilder.append(spark, spark.createDataset(Seq(nd)), dir, conf)
      model(u) = nd; deleted -= u
      checkInvariants("readd-after-delete")
    }

    // final FULL merge → engine must equal a from-scratch build of the model
    Compaction.run(spark, dir, conf)
    engine.invalidateCache()
    val refDir = SparkTestSession.tempDir("graft-statefuzz-ref")
    IndexBuilder.build(spark,
      spark.createDataset(model.values.toSeq.sortBy(_.url)), refDir, conf)
    val refEngine = new QueryEngine(spark, refDir, conf.numBuckets)
    def urlMap(e: QueryEngine): Map[Long, String] =
      e.docs.select($"docId", $"url").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gotUrls = urlMap(engine)
    val expUrls = urlMap(refEngine)
    // k covers ALL matches: a k cutoff inside a score-tie group would pick
    // different urls per engine (tie order is by docId, which differs)
    Seq("the", "w00017", "w00005 OR w00099").foreach { q =>
      val got = engine.search(q, 5000).collect()
        .map(r => (gotUrls(r.getLong(0)), r.getDouble(1)))
      val exp = refEngine.search(q, 5000).collect()
        .map(r => (expUrls(r.getLong(0)), r.getDouble(1)))
      val sortKey = (p: (String, Double)) => (-p._2, p._1)
      val g = got.sortBy(sortKey); val e = exp.sortBy(sortKey)
      assert(g.map(_._1).toSeq == e.map(_._1).toSeq,
        s"[final q='$q']\n got=${g.take(8).toSeq}\n exp=${e.take(8).toSeq}")
      g.zip(e).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9, s"[final q='$q'] $gs != $es")
      }
    }

    // wipe-and-reingest coda (r5 *:*): delete-all on match-all pages the
    // whole corpus on the docId half of the anchor (every score ties at
    // 1.0) and must tombstone exactly the model; then a full re-ingest of
    // the same urls must be visible — corpus-wide tombstones are precisely
    // where the docId high-water rule earns its keep (an id reissued at or
    // below the tombstone max would be silently masked)
    val wiped = engine.deleteAllByQuery("*:*", pageSize = 7, flushEvery = 10)
    assert(wiped == model.size.toLong,
      s"wipe: deleted $wiped, model has ${model.size}")
    engine.invalidateCache()
    assert(engine.search("*:*", 10).collect().isEmpty, "wipe left matches")
    val reDocs = model.values.toSeq.sortBy(_.url)
    IndexBuilder.append(spark, spark.createDataset(reDocs), dir, conf)
    engine.invalidateCache()
    assert(engine.search("*:*", 10000).collect().length == reDocs.size,
      "re-ingest after full wipe not fully visible")
    reDocs.take(5).foreach { d =>
      assert(engine.realtimeGet(d.url).collect().length == 1,
        s"re-ingested url ${d.url} not RTG-visible")
    }

    // snapshots still answer their FROZEN state — after every mutation,
    // compaction, grace-0 GC, the corpus wipe and the re-ingest above ran
    // against the source (point-in-time isolation under the full history)
    snaps.foreach { case (sd, counts, nLive) =>
      val se = new QueryEngine(spark, sd, conf.numBuckets)
      counts.foreach { case (t, c) =>
        assert(se.search(t, 5000).collect().length == c,
          s"snapshot $sd term '$t' drifted from its frozen count $c")
      }
      assert(se.countMatches("*:*") == nLive.toLong,
        s"snapshot $sd numFound drifted from frozen $nLive")
    }
  }
}
