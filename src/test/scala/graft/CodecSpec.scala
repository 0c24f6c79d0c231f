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

  test("segment encode/decode round-trip + block-max invariant") {
    val rng = new Random(3)
    for (_ <- 1 to 60) {
      val ids = sortedIds(rng, 1 + rng.nextInt(1500))
      val tfs = ids.map(i => (i % 7) + 1)
      val dls = ids.map(i => (i % 500) + 8)
      val df = ids.length.toLong
      val n = math.max(100L + rng.nextInt(100000), df)
      val avgdl = 200.0
      val seg = PostingCodec.encode("t", 0, 0, df, tfs.sum, ids, tfs, dls, avgdl)
      val (dIds, dTfs, dDls) = PostingCodec.decodeAll(seg)
      assert(dIds.toSeq == ids.toSeq)
      assert(dTfs.toSeq == tfs.toSeq)
      assert(dDls.toSeq == dls.toSeq)
      ids.indices.foreach { i =>
        val s = BM25.tfNorm(tfs(i), dls(i), avgdl)
        val b = i / IndexConf.BlockSize
        assert(seg.blockMaxTfNorm(b) >= s,
          s"blockMax ${seg.blockMaxTfNorm(b)} < tfNorm $s at $i")
      }
      assert(seg.firstDocId == ids.head && seg.lastDocId == ids.last)
      assert(seg.blockLastDocId.last == ids.last)
    }
  }

  test("SegCursor advanceTo lands on first docId >= target (block skipping)") {
    val rng = new Random(4)
    for (_ <- 1 to 100) {
      val ids = sortedIds(rng, 1 + rng.nextInt(1000))
      val seg = PostingCodec.encode("t", 0, 0, ids.length.toLong,
        ids.length.toLong, ids, ids.map(_ => 1L), ids.map(_ => 100L), 100.0)
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
        PostingCodec.encode("t", 0, i, ids.length.toLong, ids.length.toLong,
          p, p.map(_ => 1L), p.map(_ => 100L), 100.0)
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
      val seg = PostingCodec.encode("t", 0, 0, ids.length.toLong,
        ids.length.toLong, ids, ids.map(_ => 1L), ids.map(_ => 100L), 100.0)
      val lo = rng.nextLong(1L << 41)
      val hi = lo + rng.nextLong(1L << 40)
      val cur = new TermCursor("t", Seq(seg), 1.0, 100.0, lo, hi, false)
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (!cur.exhausted) { seen += cur.curDoc; cur.next() }
      assert(seen.toSeq == ids.filter(d => d >= lo && d < hi).toSeq)
    }
  }
}
