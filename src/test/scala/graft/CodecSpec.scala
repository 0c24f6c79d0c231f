package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.index.{VByte, PostingCodec, BM25, SegCursor, TermCursor, IndexConf}

/** Property-style tests with seeded generators (FIXTURES.md §5). */
class CodecSpec extends AnyFunSuite {

  private def sortedIds(rng: Random, n: Int): Array[Long] = {
    var cur = rng.nextLong(1L << 40)
    Array.fill(n) {
      cur += (rng.nextInt(3) match {
        case 0 => 1L + rng.nextInt(10)
        case 1 => 1L + rng.nextLong(1L << 20)
        case 2 => 1L + rng.nextLong(1L << 40)
      })
      cur
    }
  }

  /** Random ascending position list of length tf (token offsets). */
  private def mkPositions(rng: Random, tf: Int): Array[Int] = {
    var cur = rng.nextInt(5)
    Array.fill(tf) { val v = cur; cur += 1 + rng.nextInt(20); v }
  }

  test("VByte plain round-trip") {
    val rng = new Random(1)
    for (_ <- 1 to 200) {
      val arr = Array.fill(rng.nextInt(500))(rng.nextLong(Long.MaxValue / 2))
      assert(VByte.decode(VByte.encode(arr), arr.length).toSeq == arr.toSeq)
    }
  }

  test("VByte delta-gap round-trip on sorted sequences") {
    val rng = new Random(2)
    for (_ <- 1 to 200) {
      val ids = sortedIds(rng, 1 + rng.nextInt(2000))
      assert(VByte.decodeDeltas(VByte.encodeDeltas(ids), ids.length).toSeq
        == ids.toSeq)
    }
  }

  test("segment encode/decode round-trip + avgdl-independent block-max invariant") {
    val rng = new Random(3)
    for (_ <- 1 to 60) {
      val ids = sortedIds(rng, 1 + rng.nextInt(1500))
      val tfs = ids.map(i => (i % 7) + 1)
      val dls = ids.map(i => (i % 500) + 8)
      val poss = ids.indices.map(i => mkPositions(rng, tfs(i).toInt)).toArray
      val seg = PostingCodec.encode("t", 0, 0, ids, tfs, dls, poss)
      assert(seg.count == ids.length)
      assert(seg.cf == tfs.sum) // segment-local collection frequency
      val (dIds, dTfs, dDls) = PostingCodec.decodeAll(seg)
      assert(dIds.toSeq == ids.toSeq)
      assert(dTfs.toSeq == tfs.toSeq)
      assert(dDls.toSeq == dls.toSeq)
      val dPos = PostingCodec.decodePositions(seg)
      ids.indices.foreach(i => assert(dPos(i).toSeq == poss(i).toSeq))
      // the (maxTf, minDl) bound must hold for ANY avgdl — the property that
      // makes incremental append sound (stored bounds never go stale)
      Seq(10.0, 200.0, 5000.0).foreach { avgdl =>
        ids.indices.foreach { i =>
          val s = BM25.tfNorm(tfs(i), dls(i), avgdl)
          val b = i / IndexConf.BlockSize
          val bound = BM25.tfNorm(seg.blockMaxTf(b), seg.blockMinDl(b), avgdl)
          assert(bound >= s, s"block bound $bound < tfNorm $s at $i avgdl=$avgdl")
        }
      }
      assert(seg.firstDocId == ids.head && seg.lastDocId == ids.last)
      assert(seg.blockLastDocId.last == ids.last)
    }
  }

  test("positions round-trip through the lazy cursor too") {
    val rng = new Random(9)
    for (_ <- 1 to 40) {
      val ids = sortedIds(rng, 1 + rng.nextInt(600))
      val tfs = ids.map(i => (i % 5) + 1)
      val dls = ids.map(_ => 100L)
      val poss = ids.indices.map(i => mkPositions(rng, tfs(i).toInt)).toArray
      val seg = PostingCodec.encode("t", 0, 0, ids, tfs, dls, poss)
      val cur = new SegCursor(seg, 1.0, 100.0)
      cur.init()
      var i = 0
      while (!cur.exhausted) {
        assert(cur.curDoc == ids(i))
        assert(cur.curPositions.toSeq == poss(i).toSeq, s"at $i")
        cur.next()
        i += 1
      }
      assert(i == ids.length)
    }
  }

  test("positions-free segments decode to empty position lists") {
    val ids = Array(1L, 5L, 9L)
    val seg = PostingCodec.encode("t", 0, 0, ids,
      Array(2L, 1L, 3L), Array(10L, 10L, 10L))
    assert(PostingCodec.decodePositions(seg).forall(_.isEmpty))
    val cur = new SegCursor(seg, 1.0, 10.0)
    cur.init()
    assert(cur.curPositions.isEmpty)
  }

  test("SegCursor advanceTo lands on first docId >= target (block skipping)") {
    val rng = new Random(4)
    for (_ <- 1 to 100) {
      val ids = sortedIds(rng, 1 + rng.nextInt(1000))
      val seg = PostingCodec.encode("t", 0, 0,
        ids, ids.map(_ => 1L), ids.map(_ => 100L))
      for (_ <- 1 to 20) {
        val target = rng.nextLong(1L << 41)
        val cur = new SegCursor(seg, 1.0, 100.0)
        cur.init()
        cur.advanceTo(target)
        ids.find(_ >= target) match {
          case Some(d) => assert(!cur.exhausted && cur.curDoc == d)
          case None    => assert(cur.exhausted)
        }
      }
      // monotone advanceTo sequence on a single cursor
      val cur = new SegCursor(seg, 1.0, 100.0)
      cur.init()
      val targets = Array.fill(30)(rng.nextLong(1L << 41)).sorted
      targets.foreach { t =>
        if (!cur.exhausted) {
          cur.advanceTo(t)
          ids.find(_ >= t) match {
            case Some(d) => assert(cur.exhausted || cur.curDoc == d ||
              cur.curDoc >= t)
            case None => assert(cur.exhausted)
          }
        }
      }
    }
  }

  test("TermCursor full iteration over multiple segments equals union") {
    val rng = new Random(5)
    for (_ <- 1 to 100) {
      val ids = sortedIds(rng, 1 + rng.nextInt(1200)).distinct.sorted
      val third = math.max(1, ids.length / 3)
      val parts = ids.grouped(third).toSeq.filter(_.nonEmpty)
      val segs = parts.zipWithIndex.map { case (p, i) =>
        PostingCodec.encode("t", 0, i, p, p.map(_ => 1L), p.map(_ => 100L))
      }
      val cur = new TermCursor("t", segs, 1.0, 100.0, 0L, Long.MaxValue, false)
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (!cur.exhausted) { seen += cur.curDoc; cur.next() }
      assert(seen.toSeq == ids.toSeq)
    }
  }

  test("TermCursor respects [lo, hi) window") {
    val rng = new Random(6)
    for (_ <- 1 to 100) {
      val ids = sortedIds(rng, 1 + rng.nextInt(500)).distinct.sorted
      val seg = PostingCodec.encode("t", 0, 0,
        ids, ids.map(_ => 1L), ids.map(_ => 100L))
      val lo = rng.nextLong(1L << 41)
      val hi = lo + rng.nextLong(1L << 40)
      val cur = new TermCursor("t", Seq(seg), 1.0, 100.0, lo, hi, false)
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (!cur.exhausted) { seen += cur.curDoc; cur.next() }
      assert(seen.toSeq == ids.filter(d => d >= lo && d < hi).toSeq)
    }
  }
}
