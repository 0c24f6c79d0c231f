package graft.oracle

import scala.collection.mutable

import graft.index.{Analysis, BM25}
import graft.query.{QueryAst, QueryParser}

/** Sequential in-memory reference implementation (SURVEY.md §5.1) — the
  * keystone oracle standing in for a live Solr instance. Same tokenizer,
  * exact-arithmetic tf/df/BM25, naive uncompressed postings, exhaustive
  * scoring, top-k by (-score, docId). Every distributed result must be
  * rank-identical (docIds equal, scores within 1e-9) to this on the fixed
  * query set (FIXTURES.md §3).
  *
  * Per-doc score = sum of per-term contributions in TERM-SORTED order —
  * the same summation order the distributed WAND scorer fixes, so scores
  * agree to the last bit, not just within tolerance.
  */
final class SeqOracle(docs: Seq[(Long, String, String)]) {
  // docs: (docId, text, lang)
  val n: Long = docs.size.toLong
  private val doclen = mutable.LongMap.empty[Long]
  private val docLang = mutable.LongMap.empty[String]
  // term -> sorted (docId, tf)
  private val postings = mutable.HashMap.empty[String, mutable.ArrayBuffer[(Long, Long)]]

  docs.sortBy(_._1).foreach { case (id, text, lang) =>
    val toks = Analysis.tokenize(text)
    doclen(id) = toks.length.toLong
    docLang(id) = lang
    val tf = mutable.HashMap.empty[String, Long]
    toks.foreach(t => tf(t) = tf.getOrElse(t, 0L) + 1L)
    tf.foreach { case (t, c) =>
      postings.getOrElseUpdate(t, mutable.ArrayBuffer.empty) += ((id, c))
    }
  }

  val totalTerms: Long = doclen.values.sum
  val avgdl: Double = if (n == 0) 0.0 else totalTerms.toDouble / n
  def df(term: String): Long = postings.get(term).map(_.size.toLong).getOrElse(0L)
  def cf(term: String): Long = postings.get(term).map(_.map(_._2).sum).getOrElse(0L)

  /** Top-k for a parsed query; tiebreak (-score, docId). */
  def topK(query: String, k: Int): Seq[(Long, Double)] = {
    val ast = QueryParser.parse(query)
    val scoringTerms = ast.scoringTerms.distinct.sorted
    val mustTerms = ast.mustTerms.distinct
    val notTerms = ast.notTerms.distinct
    val langPred = ast.langFilter

    val scores = mutable.LongMap.empty[Double]
    val termHits = mutable.LongMap.empty[Int] // how many MUST terms matched
    scoringTerms.foreach { t =>
      postings.get(t).foreach { pl =>
        val idfv = BM25.idf(n, pl.size.toLong)
        pl.foreach { case (id, tf) =>
          scores(id) = scores.getOrElse(id, 0.0) +
            BM25.score(tf, doclen(id), avgdl, idfv)
        }
      }
    }
    mustTerms.foreach { t =>
      postings.get(t).foreach(_.foreach { case (id, _) =>
        termHits(id) = termHits.getOrElse(id, 0) + 1
      })
    }
    val excluded = mutable.HashSet.empty[Long]
    notTerms.foreach(t => postings.get(t).foreach(_.foreach(p => excluded += p._1)))

    scores.toSeq
      .filter { case (id, _) =>
        (mustTerms.isEmpty || termHits.getOrElse(id, 0) == mustTerms.size) &&
        !excluded.contains(id) &&
        langPred.forall(l => docLang(id) == l)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(k)
  }

  /** Exhaustive score of one doc for a term list (test helper). */
  def scoreDoc(docId: Long, terms: Seq[String]): Double =
    terms.distinct.sorted.foldLeft(0.0) { (acc, t) =>
      postings.get(t).flatMap(_.find(_._1 == docId)) match {
        case Some((_, tf)) =>
          acc + BM25.score(tf, doclen(docId), avgdl, BM25.idf(n, df(t)))
        case None => acc
      }
    }
}
