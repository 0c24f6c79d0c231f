package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index._
import graft.oracle.{OracleDoc, SeqOracle}
import graft.query.QueryEngine

/** Grammar-driven fuzz: generate pseudo-random well-formed queries over the
  * supported surface (boolean precedence, parens, +/NOT, phrases ± slop,
  * prefixes, boosts, field qualifiers, lang/url filters) and assert all
  * three physical paths are rank- and score-identical to the sequential
  * oracle. Fixed seed — the query set is deterministic, so a failure is
  * reproducible; the generator only emits syntax the parser accepts (loud
  * rejection of unsupported Lucene syntax is tested in EngineSpec).
  */
class FuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val NDocs = 300L
  private val conf = IndexConf(numBuckets = 8, segmentMaxDocs = 64)

  private lazy val indexDir: String = {
    val dir = SparkTestSession.tempDir("graft-fuzz")
    IndexBuilder.build(spark, CorpusGen.generate(spark, NDocs), dir, conf)
    dir
  }

  private lazy val oracle: SeqOracle = new SeqOracle(
    CorpusGen.generateLocal(NDocs).sortBy(_.url).zipWithIndex.map {
      case (d, i) => OracleDoc(i.toLong, d.text, d.lang, d.url,
        d.warc_ts.getTime, graft.corpus.Extractor.extractTitle(d.html))
    })

  private lazy val engine = new QueryEngine(spark, indexDir, conf.numBuckets)
  private lazy val distEngine = new QueryEngine(spark, indexDir,
    conf.numBuckets, driverWandMaxSegments = 0)

  // ---------------------------------------------------------- generator

  private val rng = new java.util.Random(20260818L)

  private def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.length))

  /** Mix of hot stopwords, mid-frequency, rare, and nonexistent terms —
    * hit-list sizes from "most docs" down to zero.
    */
  private def term(): String = rng.nextInt(10) match {
    case 0 | 1 | 2    => pick(CorpusGen.Stopwords.toSeq.take(12))
    case 3 | 4 | 5 | 6 => f"w${rng.nextInt(300)}%05d"
    case 7 | 8        => f"w${rng.nextInt(50000)}%05d"
    case _            => "qzzzz" + rng.nextInt(10) // never generated
  }

  private def boost(): String =
    "^" + pick(Seq("0.1", "0.5", "2", "3", "1.5"))

  private def prefix(): String =
    pick(Seq("w00*", "w001*", "w0001*", "w12*", "w4999*"))

  /** `term~N` fuzzy atoms: DL-1/2 neighborhoods of mid/rare terms (wNNNNN
    * digit substitutions hit many dictionary neighbors) and of stopwords.
    */
  private def fuzzy(): String =
    term() + pick(Seq("~1", "~2", "~"))

  /** Glob wildcard atoms: `?` single-char, infix/leading `*`. */
  private def wildcard(): String =
    pick(Seq("w0001?", "w?001", "w*17", "*017", "w00?1*", "w1?3*", "?he"))

  /** Term-range atoms: incl/excl/mixed brackets, open ends, both fields. */
  private def termRange(): String =
    pick(Seq("text:[w00015 TO w00020]", "text:{w0001 TO w0002]",
      "text:[w12 TO w123}", "text:[* TO a]", "text:{w4999 TO *}",
      "title:[1 TO 3}", "title:{doc TO e]"))

  private def phrase(): String = {
    val n = 2 + rng.nextInt(2)
    val ts = Seq.fill(n)(if (rng.nextBoolean())
      pick(CorpusGen.Stopwords.toSeq.take(10)) else term())
    val slop = if (rng.nextInt(3) == 0) s"~${1 + rng.nextInt(3)}" else ""
    s""""${ts.mkString(" ")}"$slop"""
  }

  /** One positive atom (may carry a boost or a field qualifier). */
  private def atom(): String = {
    val base = rng.nextInt(10) match {
      case 0 | 1 | 2 | 3     => term()
      case 4                 => rng.nextInt(3) match {
        case 0 => fuzzy()
        case 1 => wildcard()
        case _ => termRange()
      }
      case 5 | 6             => phrase()
      case 7                 => prefix()
      case 8                 => "title:" + pick(Seq("doc", "1", "9",
        "\"doc 1\"", "\"doc 9\"~1", "(doc 9)", "(doc AND 1)", "(d?c 9~1)"))
      case _                 => "text:" + term()
    }
    if (rng.nextInt(4) == 0) base + boost() else base
  }

  /** A space/AND/OR sequence of 1..4 atoms with optional +, NOT tails,
    * optional parens around a pair, optional lang/url filter. The first
    * atom is always a bare positive literal, so every query has at least
    * one scoring term and never starts with an operator.
    */
  private def genQuery(): String = {
    val sb = new StringBuilder(atom())
    val n = rng.nextInt(4)
    (0 until n).foreach { _ =>
      rng.nextInt(6) match {
        case 0 => sb.append(" AND ").append(atom())
        case 1 => sb.append(" OR ").append(atom())
        case 2 => sb.append(" NOT ")
          .append(if (rng.nextBoolean()) term() else prefix())
        case 3 => sb.append(" +").append(atom())
        case 4 => sb.append(" (").append(atom())
          .append(if (rng.nextBoolean()) " OR " else " AND ")
          .append(atom()).append(")")
        case _ => sb.append(" ").append(atom())
      }
    }
    if (rng.nextInt(5) == 0) sb.append(" lang:").append(pick(Seq("en", "no")))
    if (rng.nextInt(8) == 0) sb.append(" url:host").append(rng.nextInt(10))
      .append(".")
    sb.toString
  }

  // ---------------------------------------------------------- the test

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def assertSame(got: Seq[(Long, Double)],
      expect: Seq[(Long, Double)], ctx: String): Unit = {
    assert(got.map(_._1) == expect.map(_._1),
      s"[$ctx]\n got=${got.take(12)}\n exp=${expect.take(12)}")
    got.zip(expect).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) < 1e-9, s"[$ctx] score $gs != $es")
    }
  }

  test("60 generated queries: driver WAND, distributed WAND, exhaustive " +
      "all rank-identical to the oracle") {
    val queries = Iterator.continually(genQuery()).distinct.take(60).toSeq
    var nonEmpty = 0
    queries.foreach { q =>
      val expect = oracle.topK(q, 10)
      if (expect.nonEmpty) nonEmpty += 1
      assertSame(ids(engine.search(q, 10)), expect, s"driver q='$q'")
      assertSame(ids(distEngine.searchWand(q, 10)), expect, s"dist q='$q'")
      assertSame(ids(engine.searchExhaustive(q, 10)), expect, s"exh q='$q'")
    }
    // the generator must be producing real work, not 60 zero-hit queries
    assert(nonEmpty >= 30, s"only $nonEmpty/60 queries matched anything")
  }

  test("fq + q.op over generated queries: all paths rank-identical " +
      "to the oracle") {
    // random fq sets (pure-filter, term, and full generated queries) and a
    // random default operator — the fq intersection must commute with
    // top-k identically in every physical path
    val combos = Iterator.continually {
      // q=*:* + fq is the canonical Solr query shape — keep it in the mix
      val q = if (rng.nextInt(5) == 0) "*:*" else genQuery()
      // bias fqs toward hot terms — a rare-term fq intersected with a
      // random query is almost always empty, which exercises nothing
      val fqs = Seq.fill(1 + rng.nextInt(2))(rng.nextInt(7) match {
        case 0     => "lang:" + pick(Seq("en", "no"))
        case 1     => "url:host" + rng.nextInt(10) + "."
        case 2 | 3 => pick(CorpusGen.Stopwords.toSeq.take(10))
        case 4     => "*:*" // accepted no-op constraint
        case _     => genQuery()
      })
      val qOp = if (rng.nextInt(3) == 0) "AND" else "OR"
      (q, fqs, qOp)
    }.distinct.take(25).toSeq
    var nonEmpty = 0
    combos.foreach { case (q, fqs, qOp) =>
      val expect = oracle.topK(q, 10, fq = fqs, qOp = qOp)
      if (expect.nonEmpty) nonEmpty += 1
      val ctx = s"q='$q' fq=$fqs qop=$qOp"
      assertSame(ids(engine.searchWand(q, 10, fq = fqs, qOp = qOp)),
        expect, s"driver $ctx")
      assertSame(ids(distEngine.searchWand(q, 10, fq = fqs, qOp = qOp)),
        expect, s"dist $ctx")
      assertSame(ids(engine.searchExhaustive(q, 10, fq = fqs, qOp = qOp)),
        expect, s"exh $ctx")
    }
    // fq intersections empty out many pages; require real work regardless
    assert(nonEmpty >= 5, s"only $nonEmpty/25 fq combos matched anything")
  }

  test("qf over generated queries: multi-field fan-out rank-identical " +
      "in all paths") {
    // random edismax qf configs against the full query grammar: bare terms
    // fan out per field, while every other atom (explicit field, phrase,
    // prefix/fuzzy/wildcard/range, group scope) must keep its own
    // resolution — the generator mixes them freely, so any seam where qf
    // leaks into a non-bare literal diverges from the oracle here
    val configs = Seq(
      Seq("text" -> 1.0, "title" -> 3.0),
      Seq("text" -> 0.5, "title" -> 2.0),
      Seq("title" -> 1.5),
      Seq("text" -> 2.0))
    val combos = Iterator.continually {
      (genQuery(), pick(configs), if (rng.nextInt(3) == 0) "AND" else "OR",
        pick(Seq(0.0, 0.3, 1.0))) // edismax tie (inert here — the shared
        // corpus has disjoint field vocabularies — but the plumbing and the
        // groupless shortcut must hold under every value)
    }.distinct.take(25).toSeq
    var nonEmpty = 0
    combos.foreach { case (q, qf, qOp, tie) =>
      val expect = oracle.topK(q, 10, qOp = qOp, qf = qf, tie = tie)
      if (expect.nonEmpty) nonEmpty += 1
      val ctx = s"q='$q' qf=$qf qop=$qOp tie=$tie"
      assertSame(
        ids(engine.searchWand(q, 10, qOp = qOp, qf = qf, tie = tie)),
        expect, s"driver $ctx")
      assertSame(
        ids(distEngine.searchWand(q, 10, qOp = qOp, qf = qf, tie = tie)),
        expect, s"dist $ctx")
      assertSame(
        ids(engine.searchExhaustive(q, 10, qOp = qOp, qf = qf, tie = tie)),
        expect, s"exh $ctx")
    }
    assert(nonEmpty >= 10, s"only $nonEmpty/25 qf combos matched anything")
  }

  test("match-set consumers under qf: facet/stats/sorted/ngroups vs " +
      "oracle twins") {
    // the oracle's candidatesFq seam carries qf/tie (review r5), so every
    // consumer twin can be fuzzed under multi-field fan-out — a MultiLit
    // match-set regression anywhere in the consumer chain diverges here
    val configs = Seq(
      Seq("text" -> 1.0, "title" -> 3.0),
      Seq("title" -> 2.0))
    val combos = Iterator.continually {
      (genQuery(), pick(configs), pick(Seq(0.0, 1.0)))
    }.distinct.take(10).toSeq
    var nonEmpty = 0
    combos.zipWithIndex.foreach { case ((q, qf, tie), i) =>
      val ctx = s"q='$q' qf=$qf tie=$tie"
      val fc = engine.facet(q, "lang", qf = qf, tie = tie).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      if (fc.nonEmpty) nonEmpty += 1
      assert(fc == oracle.facet(q, "lang", qf = qf, tie = tie),
        s"facet $ctx")
      val f = if (i % 2 == 0) "doclen" else "titleLen"
      val r = engine.statsField(q, f, qf = qf, tie = tie).collect().head
      oracle.statsField(q, f, qf = qf, tie = tie) match {
        case Some(exp) =>
          assert((r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3)) == ((exp._1, exp._2, exp._3, exp._4)) &&
            math.abs(r.getDouble(4) - exp._5) < 1e-9, s"stats $ctx")
        case None => assert(r.getLong(0) == 0L, s"stats-empty $ctx")
      }
      assert(engine.searchSorted(q, "warc_ts", ascending = i % 2 == 0, 10,
        qf = qf, tie = tie).collect().map(_.getLong(0)).toSeq ==
        oracle.topKSorted(q, "warc_ts", ascending = i % 2 == 0, 10,
          qf = qf, tie = tie), s"sorted $ctx")
      assert(engine.countGroups(q, "lang", qf = qf, tie = tie) ==
        oracle.ngroups(q, "lang", qf = qf, tie = tie), s"ngroups $ctx")
    }
    assert(nonEmpty >= 4, s"only $nonEmpty/10 qf consumer combos matched")
  }

  test("sorted search over generated queries: stored-field order matches " +
      "oracle both directions") {
    val queries = Iterator.continually(genQuery()).distinct.take(12).toSeq
    val fields = Seq("warc_ts", "url", "lang", "doclen")
    var nonEmpty = 0
    queries.zipWithIndex.foreach { case (q, i) =>
      val f = fields(i % fields.length)
      val asc = i % 2 == 0
      val got = engine.searchSorted(q, f, asc, 10)
        .collect().map(_.getLong(0)).toSeq
      val exp = oracle.topKSorted(q, f, asc, 10)
      if (exp.nonEmpty) nonEmpty += 1
      assert(got == exp, s"[q='$q' sort=$f asc=$asc]\n got=$got\n exp=$exp")
    }
    assert(nonEmpty >= 6, s"only $nonEmpty/12 sorted queries matched anything")
  }

  test("stats + grouping over generated queries match oracle") {
    val queries = Iterator.continually(genQuery()).distinct.take(8).toSeq
    queries.zipWithIndex.foreach { case (q, i) =>
      val f = if (i % 2 == 0) "doclen" else "titleLen"
      val r = engine.statsField(q, f).collect().head
      oracle.statsField(q, f) match {
        case Some(exp) =>
          val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4))
          assert(got._1 == exp._1 && got._2 == exp._2 && got._3 == exp._3 &&
            got._4 == exp._4 && math.abs(got._5 - exp._5) < 1e-9,
            s"[q='$q' stats=$f] got=$got exp=$exp")
        case None => assert(r.getLong(0) == 0L, s"[q='$q'] spurious matches")
      }
      val g = engine.searchGrouped(q, "lang", 2).collect()
        .map(r2 => (r2.getString(0), r2.getInt(1), r2.getLong(2))).toSeq
      val ge = oracle.topKGrouped(q, "lang", 2).map(t => (t._1, t._2, t._3))
      assert(g == ge, s"[q='$q' group]\n got=$g\n exp=$ge")
    }
  }

  test("facet.pivot + mlt interesting terms over generated inputs match " +
      "oracle") {
    val queries = Iterator.continually(genQuery()).distinct.take(8).toSeq
    queries.zipWithIndex.foreach { case (q, i) =>
      val (fa, fb) = if (i % 2 == 0) ("lang", "url") else ("url", "lang")
      val got = engine.facetPivot(q, fa, fb).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getInt(4))).toSeq
      val exp = oracle.facetPivot(q, fa, fb)
      assert(got == exp, s"[q='$q' pivot=$fa,$fb]\n got=$got\n exp=$exp")
    }
    // MLT inputs: random term soup with duplicates (tf ≥ 2 survivors mix
    // stopwords, mid/rare terms, and never-indexed terms)
    (1 to 6).foreach { _ =>
      val ts = Seq.fill(6)(term())
      val txt = (ts ++ ts ++ Seq.fill(3)(term())).mkString(" ")
      val got = engine.interestingTerms(txt, 5)
      assert(got == oracle.interestingTerms(txt, 5), s"mlt text='$txt'")
      if (got.nonEmpty) {
        val res = ids(engine.moreLikeThis(txt, 10, maxTerms = 5))
        assertSame(res, oracle.topK(got.mkString(" OR "), 10),
          s"mlt topk '$txt'")
      }
    }
  }

  test("collation over generated typos: engine and oracle twins agree") {
    // mutate real mid-frequency terms one char at a time; the twins must
    // produce the SAME collation decision (including every bail-out) and
    // the same rewritten query + hit count when they do collate
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    def typo(t: String): String = {
      val i = rng.nextInt(t.length)
      rng.nextInt(3) match {
        case 0 => t.updated(i, alphabet(rng.nextInt(alphabet.length))) // sub
        case 1 => // delete (keep nonempty)
          val s = t.take(i) + t.drop(i + 1)
          if (s.isEmpty) t + "q" else s
        case _ => t.take(i) + alphabet(rng.nextInt(alphabet.length)) + t.drop(i)
      }
    }
    var collated = 0
    (1 to 15).foreach { _ =>
      val broken = typo(f"w${rng.nextInt(300)}%05d")
      val q = rng.nextInt(3) match {
        case 0 => broken
        case 1 => s"$broken AND ${f"w${rng.nextInt(300)}%05d"}"
        case _ => s"${pick(CorpusGen.Stopwords.toSeq.take(8))} $broken"
      }
      val got = engine.collate(q)
      assert(got == oracle.collate(q), s"collate twins differ on '$q'")
      got.foreach { case (cq, hits) =>
        collated += 1
        assert(hits > 0 && cq != q, s"collation '$cq' of '$q'")
        // the rewritten query is runnable and matches
        assert(ids(engine.search(cq, 5)).nonEmpty, s"dead collation '$cq'")
      }
    }
    // the generator must produce real corrections, not 15 bail-outs
    assert(collated >= 5, s"only $collated/15 typo queries collated")
  }

  test("searchAfter paging over generated queries: page concat == full " +
      "ranking, driver path vs oracle pager") {
    // fresh deterministic sub-stream; small pages force many boundaries
    // (incl. inside score-tie runs on stopword queries)
    val queries = Iterator.continually(genQuery()).distinct.take(12).toSeq
    val pageSize = 9
    var pagedQueries = 0
    queries.foreach { q =>
      val full = oracle.topK(q, NDocs.toInt)
      val acc = scala.collection.mutable.Buffer.empty[(Long, Double)]
      val orcAcc = scala.collection.mutable.Buffer.empty[(Long, Double)]
      var after: Option[graft.query.Wand.Scored] = None
      var done = false
      while (!done) {
        val page = ids(engine.search(q, pageSize, "text", after))
        val orcPage = oracle.topK(q, pageSize, "text",
          after.map(s => (s.docId, s.score)))
        assertSame(page, orcPage, s"page q='$q' after=$after")
        acc ++= page
        orcAcc ++= orcPage
        if (page.length < pageSize || acc.size > 2 * NDocs) done = true
        else after = Some(graft.query.Wand.Scored(page.last._1, page.last._2))
      }
      if (acc.size > pageSize) pagedQueries += 1
      assertSame(acc.toSeq, full, s"page-concat q='$q'")
      assertSame(orcAcc.toSeq, full, s"oracle-page-concat q='$q'")
    }
    // the set must actually cross page boundaries, not fit in page one
    assert(pagedQueries >= 4,
      s"only $pagedQueries/12 queries spanned multiple pages")
  }
}
