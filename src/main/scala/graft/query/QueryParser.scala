package graft.query

import graft.index.Analysis

/** Parsed query in the flat model the reference actually exercises.
  *
  * The reference passes raw Lucene query strings to Solr
  * (`solrc.search(searchstring, rows=…)`, /root/reference/src/searchindex.py:98;
  * fielded `mmd_title:… df=text_en`, /root/reference/src/indexdata.py:1516–1523).
  * v1 surface (SURVEY.md §2.7 Q2/Q3): bare terms (default OR), AND, NOT,
  * `-term`, `+term`, `"phrase"` (= AND-of-terms), `field:term` where field is
  * the indexed default (`text`) or a stored filter field (`lang`, `url`).
  * Wildcard/fuzzy are a documented non-goal (never exercised by the
  * reference's own code).
  *
  * - scoringTerms: positive text terms — each contributes BM25 score.
  * - mustTerms: all must be present (AND / '+' / phrase semantics).
  * - notTerms: none may be present.
  * - langFilter / urlFilter: stored-field predicates on the docs table.
  */
final case class QueryAst(
    scoringTerms: Seq[String],
    mustTerms: Seq[String],
    notTerms: Seq[String],
    langFilter: Option[String],
    urlFilter: Option[String])

object QueryParser {

  private sealed trait Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  private final case class TermTok(field: Option[String], value: String,
      phrase: Boolean, neg: Boolean, plus: Boolean) extends Tok

  private def lex(q: String): List[Tok] = {
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val s = q.trim
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case _ =>
          var neg = false; var plus = false
          if (s.charAt(i) == '-') { neg = true; i += 1 }
          else if (s.charAt(i) == '+') { plus = true; i += 1 }
          if (i < s.length) {
            // optional field prefix
            var field: Option[String] = None
            val colon = s.indexOf(':', i)
            if (colon > i && s.charAt(i) != '"' &&
                s.substring(i, colon).forall(c => c.isLetterOrDigit || c == '_') &&
                colon + 1 < s.length && !s.charAt(colon + 1).isWhitespace) {
              field = Some(s.substring(i, colon).toLowerCase)
              i = colon + 1
            }
            if (i < s.length && s.charAt(i) == '"') {
              val end = s.indexOf('"', i + 1)
              val stop = if (end < 0) s.length else end
              toks += TermTok(field, s.substring(i + 1, stop), phrase = true, neg, plus)
              i = if (end < 0) s.length else end + 1
            } else {
              var j = i
              while (j < s.length && !s.charAt(j).isWhitespace) j += 1
              val w = s.substring(i, j)
              i = j
              w match {
                case "AND" => toks += AndTok
                case "OR"  => toks += OrTok
                case "NOT" => toks += NotTok
                case _ if w.nonEmpty =>
                  toks += TermTok(field, w, phrase = false, neg, plus)
                case _ =>
              }
            }
          }
      }
    }
    toks.toList
  }

  def parse(q: String): QueryAst = {
    val toks = lex(q)
    val hasAnd = toks.contains(AndTok)
    val scoring = Seq.newBuilder[String]
    val must = Seq.newBuilder[String]
    val not = Seq.newBuilder[String]
    var lang: Option[String] = None
    var url: Option[String] = None

    var negNext = false
    toks.foreach {
      case AndTok | OrTok => negNext = false
      case NotTok         => negNext = true
      case TermTok(field, value, phrase, neg, plus) =>
        val isNeg = neg || negNext
        negNext = false
        field match {
          case Some("lang") => lang = Some(value.toLowerCase)
          case Some("url")  => url = Some(value)
          case Some("text") | None | Some(_) =>
            // unknown fields fall back to the default indexed field, matching
            // Solr's df= behavior (indexdata.py:1519 df='text_en')
            val terms = Analysis.tokenize(value)
            if (isNeg) not ++= terms
            else {
              scoring ++= terms
              if (phrase || plus || hasAnd) must ++= terms
            }
        }
    }
    QueryAst(scoring.result(), must.result(), not.result(), lang, url)
  }
}
