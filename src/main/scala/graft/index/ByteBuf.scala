package graft.index

/** Minimal growable PRIMITIVE byte buffer. scala.collection.mutable's
  * ArrayBuffer[Byte] boxes: its backing store is Object[], so every appended
  * byte touches 8 bytes of heap — measured as ~8× the index's size in fresh
  * pages during segment encoding, which on this sandbox's fault-expensive
  * VM dominated the whole build (90%+ system CPU). This class is the
  * unboxed replacement for every VByte emission path.
  */
final class ByteBuf(initial: Int = 16) {
  private var arr = new Array[Byte](math.max(4, initial))
  private var len = 0

  def length: Int = len

  def add(b: Byte): Unit = {
    if (len == arr.length) grow(len + 1)
    arr(len) = b
    len += 1
  }

  def addAll(bytes: Array[Byte]): Unit = {
    if (len + bytes.length > arr.length) grow(len + bytes.length)
    System.arraycopy(bytes, 0, arr, len, bytes.length)
    len += bytes.length
  }

  private def grow(min: Int): Unit = {
    var cap = arr.length * 2
    while (cap < min) cap *= 2
    arr = java.util.Arrays.copyOf(arr, cap)
  }

  def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
}

/** Growable PRIMITIVE long buffer — same rationale as [[ByteBuf]]:
  * ArrayBuffer[Long] backs onto Object[] and boxes every element (8× the
  * fresh pages on this fault-expensive VM). Used by the segment encoder's
  * per-run accumulators, which execute once per (term, segment) across the
  * whole corpus. `clear()` lets one instance be reused across runs so the
  * backing array is touched once per task, not once per term.
  */
final class LongBuf(initial: Int = 16) {
  private var arr = new Array[Long](math.max(4, initial))
  private var len = 0
  def length: Int = len
  def add(v: Long): Unit = {
    if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(len) = v
    len += 1
  }
  def clear(): Unit = len = 0
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, len)
}

/** Growable buffer of byte-array references (no per-element boxing — the
  * elements are already references; this just avoids ArrayBuffer's builder
  * overhead and supports reuse via clear()).
  */
final class BytesBuf(initial: Int = 16) {
  private var arr = new Array[Array[Byte]](math.max(4, initial))
  private var len = 0
  def length: Int = len
  def add(v: Array[Byte]): Unit = {
    if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(len) = v
    len += 1
  }
  def clear(): Unit = len = 0
  def toArray: Array[Array[Byte]] = java.util.Arrays.copyOf(arr, len)
}
