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
