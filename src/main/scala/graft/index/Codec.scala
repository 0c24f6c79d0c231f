package graft.index

/** Variable-byte + delta-gap codecs for posting lists.
  *
  * The reference delegates posting storage to Solr/Lucene (add/search
  * call-sites at /root/reference/src/indexdata.py:1306 and
  * /root/reference/src/searchindex.py:98); the north_rule pins our from-scratch
  * replacement to delta-gap + variable-byte compression with block-max skip
  * metadata. Pure Scala — runs inside `mapPartitions` (already-compiled JVM
  * code; a codegen Expression would buy nothing here, see SURVEY.md §4.3).
  *
  * Encoding: each Long is emitted as little-endian 7-bit groups; the high bit
  * of every byte is a continuation flag (1 = more bytes follow). Values must
  * be non-negative. Deltas: the first docId is stored as-is, each subsequent
  * as the gap `docId(i) - docId(i-1)` (strictly positive for sorted distinct
  * ids, so gaps never waste the zero point).
  */
object VByte {

  /** Append one non-negative value (unboxed buffer — see [[ByteBuf]]). */
  def encodeTo(buf: ByteBuf, value: Long): Unit = {
    require(value >= 0, s"VByte requires non-negative values, got $value")
    var v = value
    while ((v & ~0x7FL) != 0L) {
      buf.add(((v & 0x7F) | 0x80).toByte)
      v >>>= 7
    }
    buf.add(v.toByte)
  }

  /** Encode a plain (non-delta) sequence, e.g. term frequencies. */
  def encode(values: Array[Long]): Array[Byte] = {
    val buf = new ByteBuf(values.length * 2)
    var i = 0
    while (i < values.length) { encodeTo(buf, values(i)); i += 1 }
    buf.toArray
  }

  /** Decode `n` values from `bytes` starting at offset 0. */
  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      v |= (b & 0x7FL) << shift
      out(i) = v
      i += 1
    }
    out
  }

  /** Delta-gap encode a strictly-increasing sorted sequence (docIds). */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val buf = new ByteBuf(sorted.length * 2)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      if (i == 0) encodeTo(buf, v)
      else {
        require(v > prev, s"docIds must be strictly increasing: $prev -> $v")
        encodeTo(buf, v - prev)
      }
      prev = v
      i += 1
    }
    buf.toArray
  }

  /** Inverse of [[encodeDeltas]]. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = decode(bytes, n)
    var i = 1
    while (i < n) { out(i) += out(i - 1); i += 1 }
    out
  }
}
