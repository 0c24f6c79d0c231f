package graft.query

import graft.index.Analysis

/** One stored-field range constraint `field:[lo TO hi]` (Lucene bracket
  * syntax at the reference's search call-site, searchindex.py:98). Bounds are
  * inclusive; `*` = open end. Fields: `url`, `lang` (lexicographic) and
  * `warc_ts` (ISO-8601 instant).
  */
final case class RangeFilter(field: String, lo: Option[String],
    hi: Option[String])

/** Parsed query in the flat model the reference actually exercises.
  *
  * The reference passes raw Lucene query strings to Solr
  * (`solrc.search(searchstring, rows=…)`, /root/reference/src/searchindex.py:98;
  * fielded `mmd_title:… df=text_en`, /root/reference/src/indexdata.py:1516–1523).
  * Surface (SURVEY.md §2.7 Q2/Q3): bare terms (default OR), AND, NOT,
  * `-term`, `+term`, `"phrase"` (positional — consecutive tokens), `field:term`
  * where field is an indexed text field (default `text`, overridable via the
  * `df` parameter like Solr's df=) or a stored filter field (`lang`, `url`),
  * and `field:[a TO b]` ranges on stored fields. Wildcard/fuzzy are a
  * documented non-goal (never exercised by the reference's own code).
  *
  * Boolean model (documented v1 divergence from Lucene): AND is flat — the
  * presence of any `AND` promotes every positive term to MUST, so
  * `a AND b OR c` requires all three; there is no precedence tree.
  *
  * - scoringTerms: positive text terms — each contributes BM25 score.
  * - mustTerms: all must be present (AND / '+' / phrase semantics).
  * - notTerms: none may be present.
  * - phrases: ordered term lists that must occur at consecutive positions
  *   (each phrase's terms are also in mustTerms).
  * - langFilter / urlFilter: stored-field predicates on the docs table
  *   (lang: exact match; url: substring containment, the pragmatic analog of
  *   a tokenized url field).
  * - rangeFilters: stored-field range predicates.
  */
final case class QueryAst(
    scoringTerms: Seq[String],
    mustTerms: Seq[String],
    notTerms: Seq[String],
    phrases: Seq[Seq[String]],
    langFilter: Option[String],
    urlFilter: Option[String],
    rangeFilters: Seq[RangeFilter]) {
  def hasFieldFilter: Boolean =
    langFilter.isDefined || urlFilter.isDefined || rangeFilters.nonEmpty
}

object QueryParser {

  /** Stored filter fields (docs-table predicates, not scored index terms). */
  val FilterFields: Set[String] = Set("lang", "url", "warc_ts")

  private sealed trait Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  private final case class TermTok(field: Option[String], value: String,
      phrase: Boolean, neg: Boolean, plus: Boolean) extends Tok
  private final case class RangeTok(field: String, lo: Option[String],
      hi: Option[String]) extends Tok

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
            } else if (i < s.length && s.charAt(i) == '[') {
              // range literal [lo TO hi] — only meaningful with a field
              val end = s.indexOf(']', i + 1)
              val stop = if (end < 0) s.length else end
              val body = s.substring(i + 1, stop)
              i = if (end < 0) s.length else end + 1
              val parts = body.split("(?i)\\s+TO\\s+")
              require(parts.length == 2,
                s"malformed range '[$body]' (expected '[lo TO hi]')")
              val f = field.getOrElse(throw new IllegalArgumentException(
                s"range '[$body]' requires a field prefix"))
              def bound(v: String): Option[String] = {
                val t = v.trim
                if (t == "*" || t.isEmpty) None else Some(t)
              }
              toks += RangeTok(f, bound(parts(0)), bound(parts(1)))
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

  /** @param defaultField the indexed field untargeted terms go to — Solr's
    *   df= parameter (reference: df='text_en' at indexdata.py:1519). Only
    *   `text` is an indexed field in this engine; unknown `field:` prefixes
    *   also fall back to it (Solr schemaless-style leniency), while the
    *   stored filter fields (lang/url/warc_ts) become docs-table predicates.
    */
  def parse(q: String, defaultField: String = "text"): QueryAst = {
    require(defaultField == "text",
      s"df='$defaultField': the only indexed field is 'text'")
    val toks = lex(q)
    val hasAnd = toks.contains(AndTok)
    val scoring = Seq.newBuilder[String]
    val must = Seq.newBuilder[String]
    val not = Seq.newBuilder[String]
    val phrases = Seq.newBuilder[Seq[String]]
    val ranges = Seq.newBuilder[RangeFilter]
    var lang: Option[String] = None
    var url: Option[String] = None

    var negNext = false
    toks.foreach {
      case AndTok | OrTok => negNext = false
      case NotTok         => negNext = true
      case RangeTok(f, lo, hi) =>
        require(FilterFields.contains(f),
          s"range on '$f' unsupported (stored fields: ${FilterFields.mkString(", ")})")
        negNext = false
        ranges += RangeFilter(f, lo, hi)
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
              if (phrase && terms.length >= 2) phrases += terms.toSeq
            }
        }
    }
    QueryAst(scoring.result(), must.result(), not.result(), phrases.result(),
      lang, url, ranges.result())
  }
}
