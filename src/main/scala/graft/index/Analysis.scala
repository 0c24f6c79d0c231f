package graft.index

import java.util.Locale

/** Tokenizer + BM25 math — the single definition shared by the distributed
  * engine, the sequential oracle, and the tests, so "rank-identical" is
  * meaningful.
  *
  * The reference's analysis chain lives inside Solr (implied by the add/search
  * call-sites, /root/reference/src/indexdata.py:1306,
  * /root/reference/src/searchindex.py:98); Solr >= 8 defaults to
  * BM25Similarity with k1=1.2, b=0.75 and
  * idf = ln(1 + (N - df + 0.5)/(df + 0.5)). We keep doc-length norms exact
  * (no Lucene SmallFloat quantization) so scores are bit-reproducible across
  * parallelism levels (SURVEY.md §2.7 Q4).
  */
object Analysis {

  /** Tokenize: ASCII lowercase + split on non-[a-z0-9] runs.
    *
    * Deliberately mirrors the codegen'd Spark expression
    * `filter(split(lower(text), "[^a-z0-9]+"), t -> t != '')` and the DuckDB
    * oracle `string_split_regex(lower(text), '[^a-z0-9]+')` so all three
    * agree byte-for-byte on the synthetic corpora.
    */
  val TokenSplitRegex = "[^a-z0-9]+"

  /** Tokenize. Hot path: a zero-regex ASCII scanner (tokenize runs 3× per
    * document per build — the regex form Pattern.compile'd on EVERY call and
    * allocated a full lowercase copy + NFA per invocation, a measured chunk
    * of the build's allocation/page-fault bill on this VM). Any non-ASCII
    * char falls back to the reference regex path, so the two are
    * byte-identical by construction on ASCII and definitionally identical
    * otherwise (AnalysisSpec property-checks the equivalence).
    */
  def tokenize(text: String): Array[String] = {
    val n = text.length
    var i = 0
    while (i < n) {
      if (text.charAt(i) >= 0x80) return tokenizeViaRegex(text)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuilder.ofRef[String]
    i = 0
    while (i < n) {
      var c = text.charAt(i)
      if (isTokChar(c)) {
        val start = i
        var hasUpper = c >= 'A' && c <= 'Z'
        i += 1
        var run = true
        while (run && i < n) {
          c = text.charAt(i)
          if (isTokChar(c)) {
            if (c >= 'A' && c <= 'Z') hasUpper = true
            i += 1
          } else run = false
        }
        out += (if (!hasUpper) text.substring(start, i)
        else {
          val arr = new Array[Char](i - start)
          var j = 0
          while (j < arr.length) {
            val ch = text.charAt(start + j)
            arr(j) = if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch
            j += 1
          }
          new String(arr)
        })
      } else i += 1
    }
    out.result()
  }

  @inline private def isTokChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')

  private val SplitPattern = java.util.regex.Pattern.compile(TokenSplitRegex)

  /** The reference definition (matches the Spark SQL expression
    * `filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')` and the DuckDB
    * oracle regex — see CLAUDE.md tokenizer rule).
    */
  private[graft] def tokenizeViaRegex(text: String): Array[String] =
    SplitPattern.split(text.toLowerCase(Locale.ROOT)).filter(_.nonEmpty)
}

object BM25 {
  val K1 = 1.2
  val B = 0.75

  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** The idf-free half of the score: tf / (tf + k1·(1−b+b·dl/avgdl)).
    * Block-max metadata stores upper bounds of THIS quantity, so posting
    * encoding needs no document-frequency join — idf is multiplied back in
    * at query time (score = idf × tfNorm).
    */
  def tfNorm(tf: Long, dl: Long, avgdl: Double): Double =
    tf / (tf + K1 * (1.0 - B + B * dl / avgdl))

  /** Per-(doc, term) contribution. dl = doc length in tokens. */
  def score(tf: Long, dl: Long, avgdl: Double, idfv: Double): Double =
    idfv * tfNorm(tf, dl, avgdl)
}
