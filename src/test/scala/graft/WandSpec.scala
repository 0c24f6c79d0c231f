package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.index.{Analysis, PostingCodec, PostingSegment}
import graft.oracle.SeqOracle
import graft.query.{Wand, QueryParser, QueryResolve, ResolvedQuery}

/** WAND ≡ exhaustive oracle on random small corpora (FIXTURES.md §5),
  * including the windowed (distributed) merge, salted segmentation, and
  * positional phrases. Pure Scala — no SparkSession needed.
  */
class WandSpec extends AnyFunSuite {

  private def vocabWord(rng: Random): String =
    if (rng.nextInt(4) == 0) "stop" + rng.nextInt(3)
    else "w" + rng.nextInt(40)

  private def mkCorpus(rng: Random, nDocs: Int): Seq[(Long, String, String)] =
    (0L until nDocs.toLong).map { id =>
      val len = 3 + rng.nextInt(60)
      val text = Seq.fill(len)(vocabWord(rng)).mkString(" ")
      val lang = if (rng.nextInt(10) == 0) "no" else "en"
      (id, text, lang)
    }

  /** Build in-memory segments per term from the corpus (with positions),
    * splitting terms with df > segMax into docId-range segments (as the
    * builder does). Also returns the global dfByTerm map the query side
    * derives by summing segment counts.
    */
  private def buildSegments(corpus: Seq[(Long, String, String)],
      segMax: Int): (Map[String, Seq[PostingSegment]], Map[String, Long],
        Long, Double) = {
    val n = corpus.size.toLong
    val doclen = corpus.map { case (id, t, _) =>
      id -> Analysis.tokenize(t).length.toLong
    }.toMap
    val avgdl = doclen.values.sum.toDouble / n
    val tf = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.TreeMap[Long, Array[Int]]]
    corpus.foreach { case (id, t, _) =>
      Analysis.tokenize(t).zipWithIndex.foreach { case (w, p) =>
        val m = tf.getOrElseUpdate(w, scala.collection.mutable.TreeMap.empty)
        m(id) = m.getOrElse(id, Array.empty[Int]) :+ p
      }
    }
    val segs = tf.map { case (term, m) =>
      val ids = m.keys.toArray
      val poss = ids.map(m)
      val tfs = poss.map(_.length.toLong)
      val dls = ids.map(doclen)
      val df = ids.length.toLong
      val nSeg = if (df <= segMax) 1 else ((df + segMax - 1) / segMax).toInt
      val segLen = math.max(1L, (n + nSeg - 1) / nSeg)
      val byteSegs = ids.indices.groupBy(i => (ids(i) / segLen).toInt).toSeq
        .sortBy(_._1).map { case (segId, idx) =>
          PostingCodec.encode(term, 0, segId,
            idx.map(ids).toArray, idx.map(tfs).toArray, idx.map(dls).toArray,
            idx.map(poss).toArray)
        }
      term -> byteSegs
    }.toMap
    val dfByTerm = tf.map { case (t, m) => t -> m.size.toLong }.toMap
    (segs, dfByTerm, n, avgdl)
  }

  private val queries = Seq(
    "w1", "stop0", "w1 w2", "w1 AND w2", "\"w1 w2\"", "w1 NOT w2",
    "text:w3", "w5 w6 w7 w8 w9", "stop0 AND w4", "w0 w1 stop1 NOT stop2",
    "nosuchterm", "w1 AND nosuchterm", "w39",
    "\"stop0 stop1\"", "\"w1 w2 w3\"", "\"stop1 w1\" w4",
    // round-3 surface: precedence, parens, occurs prefixes, prefix terms
    "w1 AND w2 OR w3", "w1 AND (w2 OR w3)", "(w1 w2) AND w3",
    "w1 OR w2 AND w3", "+w1 w2 w3", "-w1 w2", "w1 AND w2 AND w3 OR stop0",
    "w1*", "w3* AND stop0", "w2 NOT w3*", "(w1 AND w2) OR (w3 AND w4)",
    "\"w1 w2\" OR w3", "stop0 AND (w1 OR w2 OR w3)",
    // round-4 surface: phrase slop
    "\"w1 w2\"~1", "\"stop0 w1\"~2", "\"w1 w2 w3\"~1 OR w4",
    "\"stop0 stop1\"~3 AND w1",
    // round-5 surface: boosts (term/prefix/phrase, incl. slop-then-boost)
    "w1^2 w2", "w1 AND w2^0.5", "\"w1 w2\"^2 OR w3", "w3*^2 AND stop0",
    "\"stop0 w1\"~2^3", "stop0^0.25 w1 w2")

  private def resolved(q: String,
      segs: Map[String, Seq[PostingSegment]]): ResolvedQuery =
    QueryResolve.resolve(QueryParser.parse(q),
      QueryResolve.dictExpander(segs.keys.toSeq))

  test("WAND == oracle on random corpora (single window + windowed merge)") {
    val rng = new Random(7)
    for (trial <- 1 to 25) {
      val corpus = mkCorpus(rng, 20 + rng.nextInt(180))
      val segMax = 1 + rng.nextInt(30) // force multi-segment terms
      val (segs, dfByTerm, n, avgdl) = buildSegments(corpus, segMax)
      val oracle = new SeqOracle(corpus)
      val k = 1 + rng.nextInt(12)
      queries.foreach { q =>
        val rq = resolved(q, segs)
        val expect = oracle.topK(q, k)

        // single window over the whole docId space
        val got = Wand.topK(segs, dfByTerm, rq.scoringTerms, rq.clauses,
          n, _ => avgdl, k, 0L, Long.MaxValue, boosts = rq.boosts)
        assertRankIdentical(got.toSeq, expect, s"q='$q' trial=$trial single")

        // windowed: 4 disjoint windows, each given only the BLOCK SLICES of
        // segments overlapping it (PostingCodec.sliceForWindow — exactly
        // what the distributed plan ships since r4), local top-k each,
        // merged globally
        val w = math.max(1L, (n + 3) / 4)
        val merged = (0 until 4).flatMap { r =>
          val lo = r * w
          val hi = lo + w
          val sliced = segs.map { case (t, ss) =>
            t -> ss.flatMap(PostingCodec.sliceForWindow(_, lo, hi))
          }.filter(_._2.nonEmpty)
          Wand.topK(sliced, dfByTerm, rq.scoringTerms, rq.clauses,
            n, _ => avgdl, k, lo, hi, boosts = rq.boosts)
        }.sortBy(s => (-s.score, s.docId)).take(k)
        assertRankIdentical(merged, expect, s"q='$q' trial=$trial windowed")
      }
    }
  }

  test("random boolean queries == oracle (property)") {
    val rng = new Random(77)
    def randQuery(depth: Int): String = {
      def atom(): String =
        rng.nextInt(7) match {
          case 0 => "stop" + rng.nextInt(3)
          case 1 if depth < 2 => "(" + randQuery(depth + 1) + ")"
          case 2 => "w" + rng.nextInt(5) + "*" // prefix of w0..w39 space
          case 3 => "w" + rng.nextInt(40) + "^" + (1 + rng.nextInt(3)) // boost
          case _ => "w" + rng.nextInt(40)
        }
      val nItems = 1 + rng.nextInt(3)
      (1 to nItems).map { _ =>
        val a = atom()
        rng.nextInt(5) match {
          case 0 => s"$a AND ${atom()}"
          case 1 => s"$a OR ${atom()}"
          case 2 => s"$a NOT ${atom()}"
          case _ => a
        }
      }.mkString(" ")
    }
    for (trial <- 1 to 40) {
      val corpus = mkCorpus(rng, 30 + rng.nextInt(120))
      val (segs, dfByTerm, n, avgdl) = buildSegments(corpus, 24)
      val oracle = new SeqOracle(corpus)
      (1 to 8).foreach { _ =>
        val q = randQuery(0)
        val (expect, rqOpt) =
          try (oracle.topK(q, 10), Some(resolved(q, segs)))
          catch { case _: IllegalArgumentException => (Nil, None) }
        rqOpt.foreach { rq =>
          val got = Wand.topK(segs, dfByTerm, rq.scoringTerms, rq.clauses,
            n, _ => avgdl, 10, 0L, Long.MaxValue, boosts = rq.boosts)
          assertRankIdentical(got.toSeq, expect, s"q='$q' trial=$trial")
        }
      }
    }
  }

  test("WAND with allow-filter == oracle lang filter") {
    val rng = new Random(8)
    for (trial <- 1 to 10) {
      val corpus = mkCorpus(rng, 50 + rng.nextInt(150))
      val (segs, dfByTerm, n, avgdl) = buildSegments(corpus, 16)
      val oracle = new SeqOracle(corpus)
      val langOf = corpus.map(c => c._1 -> c._3).toMap
      val q = "lang:no AND w1"
      val rq = resolved(q, segs)
      val expect = oracle.topK(q, 10)
      val got = Wand.topK(segs, dfByTerm, rq.scoringTerms, rq.clauses,
        n, _ => avgdl, 10,
        0L, Long.MaxValue, allow = Some(id => langOf(id) == "no"))
      assertRankIdentical(got.toSeq, expect, s"trial=$trial lang")
    }
  }

  test("phraseMatch: consecutive-position semantics") {
    // "a b": a at 3, b at 4 → match
    assert(Wand.phraseMatch(Seq(Array(3), Array(4))))
    // reversed order → no match
    assert(!Wand.phraseMatch(Seq(Array(4), Array(3))))
    // gap → no match
    assert(!Wand.phraseMatch(Seq(Array(3), Array(5))))
    // repeated term "a a" needs positions p and p+1 in the same list
    assert(Wand.phraseMatch(Seq(Array(2, 3), Array(2, 3))))
    assert(!Wand.phraseMatch(Seq(Array(2, 5), Array(2, 5))))
    // empty list → no match; empty phrase → vacuous true
    assert(!Wand.phraseMatch(Seq(Array(1), Array.empty[Int])))
    assert(Wand.phraseMatch(Seq.empty))
  }

  test("phraseMatch slop: Lucene edit-distance (moves) semantics") {
    // gap of one filler: adjusted span 1 → needs slop ≥ 1
    assert(!Wand.phraseMatch(Seq(Array(3), Array(5)), 0))
    assert(Wand.phraseMatch(Seq(Array(3), Array(5)), 1))
    // adjacent transposition costs 2 ("b a"~2 matches the text 'a b'): here
    // term0 sits at 4, term1 at 3 → adjusted (4, 2), span 2
    assert(!Wand.phraseMatch(Seq(Array(4), Array(3)), 1))
    assert(Wand.phraseMatch(Seq(Array(4), Array(3)), 2))
    // reversed with one filler: adjusted (5, 2), span 3 → slop ≥ 3
    assert(!Wand.phraseMatch(Seq(Array(5), Array(3)), 2))
    assert(Wand.phraseMatch(Seq(Array(5), Array(3)), 3))
    // distinctness: a repeated term never matches ONE occurrence
    assert(!Wand.phraseMatch(Seq(Array(7), Array(7)), 5))
    // three terms over the text 'c a b': adjusted (1, 1, -2), span 3
    assert(!Wand.phraseMatch(Seq(Array(1), Array(2), Array(0)), 2))
    assert(Wand.phraseMatch(Seq(Array(1), Array(2), Array(0)), 3))
    // three terms in order, one gap after the first: adjusted span 1
    assert(!Wand.phraseMatch(Seq(Array(0), Array(2), Array(3)), 0))
    assert(Wand.phraseMatch(Seq(Array(0), Array(2), Array(3)), 1))
    // anchor choice: start 0 fails (term1 at 12), start 10 works at slop 1
    assert(Wand.phraseMatch(Seq(Array(0, 10), Array(12)), 2))
    // repeated term with stretch: "a a"~1 over positions {2,4}
    assert(Wand.phraseMatch(Seq(Array(2, 4), Array(2, 4)), 1))
    assert(!Wand.phraseMatch(Seq(Array(2, 4), Array(2, 4)), 0))
    // the matching case a one-pass greedy would miss: offset0 ∈ {1,2},
    // offset1 ∈ {1} — offset0 must yield position 1 and take 2 (out of
    // order, adjusted (2, 0), span 2; bigram shortcut path)
    assert(Wand.phraseMatch(Seq(Array(1, 2), Array(1)), 2))
    // same shape at m=3 (the Kuhn fallback path): offset0 must yield 1 to
    // offset1 via an augmenting path — assignment (2, 1, 3), adjusted
    // (2, 0, 1), span 2
    assert(Wand.phraseMatch(Seq(Array(1, 2), Array(1), Array(3)), 2))
    assert(!Wand.phraseMatch(Seq(Array(1, 2), Array(1), Array(3)), 1))
  }

  test("phraseMatch slop == brute force over position tuples (property)") {
    // ground truth: exists a pairwise-DISTINCT assignment p_i ∈ lists(i)
    // with max(p_i - i) - min(p_i - i) ≤ slop (full enumeration)
    def brute(lists: Seq[Array[Int]], slop: Int): Boolean = {
      val m = lists.length
      def rec(t: Int, chosen: List[Int]): Boolean =
        if (t == m) {
          val adj = chosen.reverse.zipWithIndex.map { case (p, i) => p - i }
          adj.max - adj.min <= slop
        } else lists(t).exists(p => !chosen.contains(p) && rec(t + 1, p :: chosen))
      rec(0, Nil)
    }
    val rng = new Random(42)
    for (_ <- 1 to 800) {
      val m = 2 + rng.nextInt(3)
      val lists = Seq.fill(m)(
        Array.fill(1 + rng.nextInt(5))(rng.nextInt(15)).distinct.sorted)
      val slop = rng.nextInt(5)
      assert(Wand.phraseMatch(lists, slop) == brute(lists, slop),
        s"lists=${lists.map(_.toSeq)} slop=$slop")
      // slop=0 ≡ the exact consecutive-position semantics
      val exact = lists.head.exists(p0 => (1 until m).forall(t =>
        java.util.Arrays.binarySearch(lists(t), p0 + t) >= 0))
      assert(Wand.phraseMatch(lists, 0) == exact,
        s"slop0 lists=${lists.map(_.toSeq)}")
    }
  }

  private def assertRankIdentical(got: Seq[Wand.Scored],
      expect: Seq[(Long, Double)], ctx: String): Unit = {
    assert(got.size == expect.size,
      s"[$ctx] size ${got.size} != ${expect.size}\n got=$got\n exp=$expect")
    got.zip(expect).zipWithIndex.foreach { case ((g, (eid, es)), r) =>
      assert(g.docId == eid,
        s"[$ctx] rank $r docId ${g.docId} != $eid\n got=$got\n exp=$expect")
      assert(math.abs(g.score - es) < 1e-9,
        s"[$ctx] rank $r score ${g.score} != $es")
    }
  }
}
