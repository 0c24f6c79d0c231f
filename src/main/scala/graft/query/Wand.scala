package graft.query

import scala.collection.mutable

import graft.index.{PostingSegment, TermCursor, BM25}

/** Block-max WAND top-k over one docId window [lo, hi) — the from-scratch
  * replacement for Lucene's BMW collector that the reference's
  * `solrc.search(q, rows=…)` implies (/root/reference/src/searchindex.py:98).
  * Runs inside one executor task; the distributed query plan slices the docId
  * space into disjoint windows and merges the per-window top-k globally
  * (disjoint windows ⇒ the merge is exact).
  *
  * Determinism: per-doc scores sum the per-term contributions in term-sorted
  * order, so results are bit-identical across parallelism levels. Tiebreak is
  * (-score, docId) everywhere.
  */
object Wand {

  final case class Scored(docId: Long, score: Double)

  /** Bounded top-k: worst element at head; candidate must STRICTLY beat the
    * head's score to enter a full heap (equal score loses on docId because
    * iteration within a window is docId-ascending and the merge re-sorts).
    */
  private final class TopKHeap(k: Int) {
    private val ord: Ordering[Scored] =
      Ordering.by[Scored, (Double, Long)](s => (s.score, -s.docId)).reverse
    // PriorityQueue dequeues the MAX by ord; reverse puts the worst on top
    private val pq = mutable.PriorityQueue.empty[Scored](ord)
    def threshold: Double = if (pq.size < k) -1.0 else pq.head.score
    def offer(s: Scored): Unit = {
      if (pq.size < k) pq.enqueue(s)
      else if (s.score > pq.head.score ||
               (s.score == pq.head.score && s.docId < pq.head.docId)) {
        pq.dequeue(); pq.enqueue(s)
      }
    }
    def result(): Array[Scored] = pq.dequeueAll.reverse.toArray
  }

  /** True iff the doc's per-term position lists contain the phrase terms at
    * consecutive offsets: exists p with positions(i) containing p+i for all i.
    * Position lists are ascending (codec invariant) — binary search each.
    */
  def phraseMatch(positionsPerTerm: Seq[Array[Int]]): Boolean = {
    if (positionsPerTerm.isEmpty) return true
    if (positionsPerTerm.exists(_.isEmpty)) return false
    val first = positionsPerTerm.head
    var i = 0
    while (i < first.length) {
      val p = first(i)
      var ok = true
      var t = 1
      while (ok && t < positionsPerTerm.length) {
        if (java.util.Arrays.binarySearch(positionsPerTerm(t), p + t) < 0)
          ok = false
        t += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** @param segsByTerm   posting segments grouped by term (only segments
    *                     overlapping [lo, hi) need be present)
    * @param dfByTerm     GLOBAL document frequency per term (sum of `count`
    *                     over ALL the term's segments, across every window —
    *                     segments are docId-disjoint, so the sum is exact);
    *                     drives idf
    * @param scoringTerms distinct, any order (sorted internally)
    * @param mustTerms    conjunctive subset (each must be present)
    * @param notTerms     exclusion terms
    * @param phrases      each phrase is an ordered term list that must occur
    *                     at consecutive positions; phrase terms must also be
    *                     in mustTerms (the parser guarantees this)
    * @param allow        extra per-doc predicate (stored-field filter /
    *                     tombstones); None = allow all
    */
  def topK(
      segsByTerm: Map[String, Seq[PostingSegment]],
      dfByTerm: Map[String, Long],
      scoringTerms: Seq[String],
      mustTerms: Set[String],
      notTerms: Seq[String],
      phrases: Seq[Seq[String]],
      n: Long, avgdl: Double, k: Int,
      lo: Long, hi: Long,
      allow: Option[Long => Boolean] = None): Array[Scored] = {

    val sortedTerms = scoringTerms.distinct.sorted
    // term-sorted cursor array: scoring iterates this order (determinism)
    val cursors: Array[TermCursor] = sortedTerms.flatMap { t =>
      segsByTerm.get(t).map { segs =>
        val df = dfByTerm.getOrElse(t, segs.map(_.count.toLong).sum)
        new TermCursor(t, segs, BM25.idf(n, df), avgdl, lo, hi,
          required = mustTerms.contains(t))
      }
    }.toArray

    // a must term entirely absent from the index ⇒ empty result
    if (mustTerms.exists(t => !segsByTerm.contains(t))) return Array.empty
    if (cursors.isEmpty) return Array.empty

    val exclCursors: Array[TermCursor] = notTerms.distinct.sorted.flatMap { t =>
      segsByTerm.get(t).map(segs =>
        new TermCursor(t, segs, 0.0, avgdl, lo, hi, required = false))
    }.toArray

    val cursorByTerm: Map[String, TermCursor] =
      cursors.map(c => c.term -> c).toMap

    def allowed(docId: Long): Boolean = {
      var i = 0
      while (i < exclCursors.length) {
        val c = exclCursors(i)
        if (!c.exhausted) {
          c.advanceTo(docId)
          if (!c.exhausted && c.curDoc == docId) return false
        }
        i += 1
      }
      allow.forall(f => f(docId))
    }

    /** Verify every phrase at an aligned candidate (all phrase terms are
      * required cursors, so each is positioned exactly at docId here).
      */
    def phrasesOk(docId: Long): Boolean =
      phrases.forall { ph =>
        Wand.phraseMatch(ph.map { t =>
          val c = cursorByTerm(t)
          // required cursors are aligned at docId by the leapfrog loop
          if (c.exhausted || c.curDoc != docId) Array.empty[Int]
          else c.curPositions
        })
      }

    /** Sum contributions of all cursors positioned at docId, in term-sorted
      * order (cursors array IS term-sorted).
      */
    def scoreAt(docId: Long): Double = {
      var s = 0.0
      var i = 0
      while (i < cursors.length) {
        val c = cursors(i)
        if (!c.exhausted) {
          c.advanceTo(docId)
          if (!c.exhausted && c.curDoc == docId) s += c.curScore
        }
        i += 1
      }
      s
    }

    val heap = new TopKHeap(k)

    if (mustTerms.nonEmpty) {
      // conjunctive: leapfrog intersection over the required cursors, with
      // optional cursors contributing score at aligned candidates
      val req = cursors.filter(_.required)
      if (req.exists(_.exhausted)) return heap.result()
      var done = false
      while (!done) {
        // align all required cursors on a common docId
        var candidate = Long.MinValue
        req.foreach(c => if (!c.exhausted && c.curDoc > candidate) candidate = c.curDoc)
        var aligned = true
        var i = 0
        while (i < req.length && !done) {
          val c = req(i)
          c.advanceTo(candidate)
          if (c.exhausted) { done = true }
          else if (c.curDoc > candidate) { aligned = false; i = req.length }
          i += 1
        }
        if (!done && aligned) {
          if (allowed(candidate) && phrasesOk(candidate)) {
            val s = scoreAt(candidate)
            heap.offer(Scored(candidate, s))
          }
          // advance the first required cursor past the candidate
          req(0).next()
          if (req(0).exhausted) done = true
        }
      }
    } else {
      // disjunctive block-max WAND
      val active = mutable.ArrayBuffer.empty[TermCursor]
      cursors.foreach(c => if (!c.exhausted) active += c)
      var done = active.isEmpty
      while (!done) {
        val arr = active.filter(!_.exhausted)
        if (arr.isEmpty) done = true
        else {
          val sorted = arr.sortBy(_.curDoc)
          val theta = heap.threshold
          // pivot: smallest prefix whose term upper bounds can beat theta
          var acc = 0.0
          var p = -1
          var i = 0
          while (i < sorted.length && p < 0) {
            acc += sorted(i).upperBound
            if (acc > theta) p = i
            i += 1
          }
          if (p < 0) done = true // no remaining doc can beat theta
          else {
            val pivotDoc = sorted(p).curDoc
            if (sorted(0).curDoc == pivotDoc) {
              // all cursors up to p are at pivotDoc; extend to every cursor
              // matching pivotDoc for the block-max check
              var pEnd = p
              while (pEnd + 1 < sorted.length && sorted(pEnd + 1).curDoc == pivotDoc)
                pEnd += 1
              var bmSum = 0.0
              var j = 0
              while (j <= pEnd) { bmSum += sorted(j).currentBlockMax; j += 1 }
              if (bmSum > theta) {
                if (allowed(pivotDoc))
                  heap.offer(Scored(pivotDoc, scoreAt(pivotDoc)))
              }
              j = 0
              while (j <= pEnd) { sorted(j).next(); j += 1 }
            } else {
              // advance the smallest cursor up to the pivot
              sorted(0).advanceTo(pivotDoc)
            }
          }
        }
      }
    }
    heap.result()
  }
}
