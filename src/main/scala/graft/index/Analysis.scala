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

  def tokenize(text: String): Array[String] =
    text.toLowerCase(Locale.ROOT).split(TokenSplitRegex).filter(_.nonEmpty)
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
