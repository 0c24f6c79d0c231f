package graft.index

import scala.collection.mutable.ArrayBuffer

/** Encode/decode of [[PostingSegment]] rows and the block-skipping cursors
  * the query engine iterates. This is the from-scratch replacement for the
  * posting machinery the reference delegates to Lucene (SURVEY.md §4.2).
  */
object PostingCodec {

  /** Encode one segment from parallel arrays sorted by docId (strictly
    * increasing). `df`/`cf` may be segment-local at encode time (the builder
    * replaces them with global term stats in a later small join); only
    * `avgdl` is needed for the idf-free block-max metadata.
    */
  def encode(term: String, termBucket: Int, segment: Int, df: Long, cf: Long,
      docIds: Array[Long], tfs: Array[Long], dls: Array[Long],
      avgdl: Double): PostingSegment = {
    val count = docIds.length
    require(count > 0, s"empty segment for term '$term'")
    val bs = IndexConf.BlockSize
    val nBlocks = (count + bs - 1) / bs

    val docBuf = new ArrayBuffer[Byte](count * 2)
    val tfBuf = new ArrayBuffer[Byte](count)
    val dlBuf = new ArrayBuffer[Byte](count * 2)
    val blockLast = new Array[Long](nBlocks)
    val blockMax = new Array[Float](nBlocks)
    val docOff = new Array[Int](nBlocks)
    val tfOff = new Array[Int](nBlocks)
    val dlOff = new Array[Int](nBlocks)

    var prev = 0L
    var i = 0
    while (i < count) {
      if (i % bs == 0) {
        val b = i / bs
        docOff(b) = docBuf.length
        tfOff(b) = tfBuf.length
        dlOff(b) = dlBuf.length
      }
      VByte.encodeTo(docBuf, if (i == 0) docIds(0) else docIds(i) - prev)
      prev = docIds(i)
      VByte.encodeTo(tfBuf, tfs(i))
      VByte.encodeTo(dlBuf, dls(i))
      val b = i / bs
      val s = BM25.tfNorm(tfs(i), dls(i), avgdl)
      // store as the next float ABOVE the double max so the stored Float is
      // always a valid upper bound on the true double tfNorm
      val f = Math.nextUp(s.toFloat)
      if (i % bs == 0 || f > blockMax(b)) blockMax(b) = f
      blockLast(b) = docIds(i)
      i += 1
    }
    PostingSegment(termBucket, term, segment, df, cf, count,
      docIds(0), docIds(count - 1),
      docBuf.toArray, tfBuf.toArray, dlBuf.toArray,
      blockLast, blockMax, docOff, tfOff, dlOff)
  }

  /** Full sequential decode — used by the exhaustive scorer and tests. */
  def decodeAll(seg: PostingSegment): (Array[Long], Array[Long], Array[Long]) =
    (VByte.decodeDeltas(seg.docIdsVb, seg.count),
     VByte.decode(seg.tfsVb, seg.count),
     VByte.decode(seg.dlsVb, seg.count))
}

/** Lazy block-decoding cursor over one segment. Skipping to a target docId
  * walks blockLastDocId WITHOUT decoding skipped blocks (the VByte gap stream
  * restarts at each block with base = previous block's last docId).
  */
final class SegCursor(val seg: PostingSegment, idfv: Double, avgdl: Double) {
  private val bs = IndexConf.BlockSize
  private val nBlocks = seg.blockLastDocId.length
  private var blockIdx = -1
  private var blockDocs: Array[Long] = null
  private var blockTfs: Array[Long] = null
  private var blockDls: Array[Long] = null
  private var pos = 0
  private var blockLen = 0
  var exhausted = false

  def curDoc: Long = blockDocs(pos)
  def curScore: Double =
    BM25.score(blockTfs(pos), blockDls(pos), avgdl, idfv)
  def curTf: Long = blockTfs(pos)
  /** Upper bound on the BM25 contribution within the current block
    * (idf × stored tfNorm bound).
    */
  def currentBlockMax: Double = idfv * seg.blockMaxTfNorm(blockIdx)
  def currentBlockLast: Long = seg.blockLastDocId(blockIdx)
  def maxScore: Double = {
    var m = 0f; var b = 0
    while (b < nBlocks) {
      if (seg.blockMaxTfNorm(b) > m) m = seg.blockMaxTfNorm(b)
      b += 1
    }
    idfv * m
  }

  private def decodeBlock(b: Int): Unit = {
    blockIdx = b
    blockLen = math.min(bs, seg.count - b * bs)
    val base = if (b == 0) 0L else seg.blockLastDocId(b - 1)
    // decode blockLen gap values starting at the recorded byte offset
    val raw = decodeFrom(seg.docIdsVb, seg.blockDocOff(b), blockLen)
    var i = 0
    var acc = base
    while (i < blockLen) {
      acc += raw(i) // block 0's first value has base 0, i.e. absolute
      raw(i) = acc
      i += 1
    }
    blockDocs = raw
    blockTfs = decodeFrom(seg.tfsVb, seg.blockTfOff(b), blockLen)
    blockDls = decodeFrom(seg.dlsVb, seg.blockDlOff(b), blockLen)
    pos = 0
  }

  private def decodeFrom(bytes: Array[Byte], off: Int, k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var p = off
    var i = 0
    while (i < k) {
      var v = 0L; var shift = 0
      var b = bytes(p); p += 1
      while ((b & 0x80) != 0) { v |= (b & 0x7FL) << shift; shift += 7; b = bytes(p); p += 1 }
      out(i) = v | ((b & 0x7FL) << shift)
      i += 1
    }
    out
  }

  /** Position at the first posting with docId >= target. */
  def advanceTo(target: Long): Unit = {
    if (exhausted) return
    if (blockIdx >= 0 && blockDocs != null && pos < blockLen && curDoc >= target) return
    var b = math.max(blockIdx, 0)
    while (b < nBlocks && seg.blockLastDocId(b) < target) b += 1
    if (b >= nBlocks) { exhausted = true; return }
    if (b != blockIdx || blockDocs == null) decodeBlock(b)
    // binary search within the block for first >= target
    var lo = pos; var hi = blockLen - 1
    if (blockDocs(lo) < target) {
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (blockDocs(mid) < target) lo = mid + 1 else hi = mid
      }
    }
    pos = lo
  }

  /** Skip forward within metadata only: next docId that could start a block
    * whose max exceeds the threshold. Returns a lower bound on the next
    * plausible candidate (for block-max skipping).
    */
  def nextDocAfterCurrentBlock: Long =
    if (blockIdx < 0) seg.firstDocId else seg.blockLastDocId(blockIdx) + 1

  def next(): Unit = {
    if (exhausted) return
    if (blockIdx < 0) { decodeBlock(0); return }
    pos += 1
    if (pos >= blockLen) {
      if (blockIdx + 1 >= nBlocks) exhausted = true
      else decodeBlock(blockIdx + 1)
    }
  }

  def init(): Unit = if (blockIdx < 0 && nBlocks > 0) decodeBlock(0)
}

/** Cursor over ALL segments of one term (docId-disjoint, ordered by
  * firstDocId) restricted to a docId window [lo, hi). Presents the classic
  * docID-ordered posting iterator to the WAND loop.
  */
final class TermCursor(val term: String, segments: Seq[PostingSegment],
    val idfv: Double, avgdl: Double, lo: Long, hi: Long,
    val required: Boolean) {

  private val segs = segments.sortBy(_.firstDocId).toArray
  private var segIdx = 0
  private var cur: SegCursor = null
  var exhausted: Boolean = segs.isEmpty

  /** Term-level score upper bound within this window. */
  val upperBound: Double = {
    var m = 0.0f
    segs.foreach { s =>
      if (s.lastDocId >= lo && s.firstDocId < hi) {
        var b = 0
        while (b < s.blockMaxTfNorm.length) {
          // only blocks overlapping the window matter
          val blockFirst = if (b == 0) s.firstDocId else s.blockLastDocId(b - 1) + 1
          if (s.blockLastDocId(b) >= lo && blockFirst < hi &&
              s.blockMaxTfNorm(b) > m) m = s.blockMaxTfNorm(b)
          b += 1
        }
      }
    }
    idfv * m
  }

  private def openSeg(i: Int): Unit = {
    segIdx = i
    cur = new SegCursor(segs(i), idfv, avgdl)
    cur.init()
  }

  // position at first docId >= lo
  advanceTo(lo)

  def curDoc: Long = cur.curDoc
  def curScore: Double = cur.curScore
  def currentBlockMax: Double =
    if (exhausted) 0.0 else cur.currentBlockMax.toDouble
  def currentBlockLast: Long = if (exhausted) Long.MaxValue else cur.currentBlockLast

  def advanceTo(target: Long): Unit = {
    if (exhausted) return
    var t = math.max(target, lo)
    // find segment containing/after t
    while (segIdx < segs.length && segs(segIdx).lastDocId < t) { segIdx += 1; cur = null }
    if (segIdx >= segs.length) { exhausted = true; return }
    if (cur == null) openSeg(segIdx)
    cur.advanceTo(t)
    while (cur.exhausted) {
      segIdx += 1
      if (segIdx >= segs.length) { exhausted = true; return }
      openSeg(segIdx)
      cur.advanceTo(t)
    }
    if (cur.curDoc >= hi) exhausted = true
  }

  def next(): Unit = {
    if (exhausted) return
    cur.next()
    if (cur.exhausted) {
      segIdx += 1
      if (segIdx >= segs.length) { exhausted = true; return }
      openSeg(segIdx)
    }
    if (!exhausted && cur.curDoc >= hi) exhausted = true
  }
}
