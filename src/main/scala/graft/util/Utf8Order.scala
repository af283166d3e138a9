package graft.util

/** Spark orders strings by UTF-8 bytes, which equals code-point order;
  * Java's `String.compareTo` is UTF-16 code-unit order. The two differ only
  * on supplementary characters, but driver-side twins of distributed
  * orderings (routing tie-breaks, nearest-node ties, BPE argmax) must match
  * the engine's sort exactly, so every local comparison goes through here. */
object Utf8Order {
  def compare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def lt(a: String, b: String): Boolean = compare(a, b) < 0
}
