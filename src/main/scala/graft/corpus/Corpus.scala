package graft.corpus

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** The engine's sole external input shape (BASELINE.json input_hint):
  * Common-Crawl-style web pages. In the sandbox this is synthesized
  * deterministically (seed + row index only — independent of partitioning);
  * at scale it is an Iceberg table with the same schema.
  */
final case class WebDoc(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic corpus generator (FIXTURES.md §1, seed=42).
  *
  * Plays the role of the reference's MMD-XML file inventory
  * (/root/reference/src/indexdata.py:1624–1640): a deterministic set of
  * documents to ingest. Every column is a pure function of (seed, i), so the
  * generated table is identical at any parallelism / partition count.
  */
object CorpusGen {
  val DefaultSeed = 42L
  val VocabSize = 50000
  val Stopwords: Array[String] = Array(
    "the", "of", "and", "a", "to", "in", "is", "you", "that", "it",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
    "at", "be", "this", "have", "from", "or", "one", "had", "by", "word")

  /** rank r (1-based) gets weight 1/r^s; ranks 1..30 are the stopword head,
    * ranks 31..50030 are w00000..w49999.
    */
  private val ZipfS = 1.07
  private lazy val cumWeights: Array[Double] = {
    val n = Stopwords.length + VocabSize
    val cw = new Array[Double](n)
    var acc = 0.0
    var r = 1
    while (r <= n) {
      acc += 1.0 / math.pow(r.toDouble, ZipfS)
      cw(r - 1) = acc
      r += 1
    }
    cw
  }

  private def wordForRank(rank0: Int): String =
    if (rank0 < Stopwords.length) Stopwords(rank0)
    else f"w${rank0 - Stopwords.length}%05d"

  /** SplitMix64 — a splittable counter-based PRNG; the per-doc stream is
    * seeded by mix(seed, i) so draws never depend on row order.
    */
  final class SplitMix64(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  def mix(seed: Long, i: Long): Long = {
    var z = seed ^ (i * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def sha1hex(seed: Long, i: Long): String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.digest(s"$seed:$i".getBytes(UTF_8)).map(b => f"$b%02x").mkString
  }

  private def sampleRank(rng: SplitMix64): Int = {
    val u = rng.nextDouble() * cumWeights(cumWeights.length - 1)
    val idx = java.util.Arrays.binarySearch(cumWeights, u)
    if (idx >= 0) idx else -(idx + 1)
  }

  private val BaseEpochMs = 1704067200000L // 2024-01-01T00:00:00Z

  /** Generate doc i of a corpus of n docs. `skew` = FIXTURES webdocs_skew:
    * 20% of docs are 95% stopword tokens (stresses salted segmentation).
    */
  def doc(seed: Long, i: Long, n: Long, skew: Boolean = false): WebDoc = {
    val rng = new SplitMix64(mix(seed, i))
    // LogNormal(mu=ln 200, sigma=0.6) via Box-Muller, clamped [8, 4096]
    val u1 = math.max(rng.nextDouble(), 1e-12)
    val u2 = rng.nextDouble()
    val gauss = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    val len0 = math.exp(math.log(200.0) + 0.6 * gauss).toInt
    val len = math.max(8, math.min(4096, len0))
    val stopHeavy = skew && i % 5 == 0
    val sb = new java.lang.StringBuilder(len * 7)
    var t = 0
    while (t < len) {
      val w =
        if (stopHeavy && rng.nextDouble() < 0.95)
          Stopwords(((rng.nextLong() >>> 1) % Stopwords.length).toInt)
        else wordForRank(sampleRank(rng))
      if (t > 0) sb.append(' ')
      sb.append(w)
      t += 1
    }
    val text = sb.toString
    // host cardinality grows with the doc's own INDEX, never with n: every
    // column must be a pure function of (seed, i) so regenerating the same
    // seed at a different --docs yields byte-identical docs — url-keyed
    // upsert idempotence across runs depends on it (the pre-r5 n/64 formula
    // silently re-ingested "the same" docs as new urls when n changed).
    // Octave scaling (~4 docs/host/octave) keeps cardinality crawl-like:
    // ≤16 hosts under 64 docs, ~1M hosts at 4M docs.
    val hosts = math.max(16L, java.lang.Long.highestOneBit(i + 1L) >> 2)
    val url = s"https://host${i % hosts}.example.org/p/${sha1hex(seed, i).take(12)}"
    val title = s"doc $i"
    val html =
      s"<html><head><title>$title</title></head><body>$text</body></html>"
        .getBytes(UTF_8)
    val lang = (i % 100) match {
      case m if m < 90 => "en"
      case m if m < 97 => "no"
      case _           => "de"
    }
    WebDoc(url, new Timestamp(BaseEpochMs + i * 37000L), html, text, lang)
  }

  /** Distributed generation — `spark.range` partitions the index space; each
    * row is computed independently (embarrassingly parallel, no shuffle).
    */
  def generate(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
      skew: Boolean = false, partitions: Int = 0): Dataset[WebDoc] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.map(i => doc(seed, i, n, skew))
  }

  def generateLocal(n: Long, seed: Long = DefaultSeed,
      skew: Boolean = false): Seq[WebDoc] =
    (0L until n).map(i => doc(seed, i, n, skew))
}

/** Text extraction from raw page bytes — the analog of the reference's
  * XML→fields stage (xmltodict.parse at /root/reference/src/indexdata.py:153–157).
  * Per-row invariant (input_hint): `extract(html) == text` byte-identically,
  * at every scale, independent of partitioning.
  */
object Extractor {
  private val BodyRe = "(?s)<body>(.*)</body>".r
  private val TitleRe = "(?s)<title>(.*?)</title>".r
  // precompiled: String.replaceAll would Pattern.compile on EVERY call, and
  // extract runs once per document per pass over the corpus
  private val TagPattern = java.util.regex.Pattern.compile("(?s)<[^>]*>")

  def extract(html: Array[Byte]): String = {
    val s = new String(html, UTF_8)
    val body = BodyRe.findFirstMatchIn(s).map(_.group(1)).getOrElse {
      // no <body> — strip all tags from the whole page
      TagPattern.matcher(s).replaceAll("")
    }
    decodeEntities(TagPattern.matcher(body).replaceAll(""))
  }

  /** Title text of the page ("" when absent) — the second indexed field
    * (the reference's mmd_title analog, indexdata.py:1516–1523).
    */
  def extractTitle(html: Array[Byte]): String = {
    val s = new String(html, UTF_8)
    TitleRe.findFirstMatchIn(s).map(m => decodeEntities(m.group(1)))
      .getOrElse("")
  }

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&amp;", "&")
}
