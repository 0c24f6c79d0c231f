package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{CorpusGen, Extractor}

class CorpusSpec extends AnyFunSuite {

  test("extraction is byte-identical per url (input_hint invariant)") {
    CorpusGen.generateLocal(500).foreach { d =>
      assert(Extractor.extract(d.html) == d.text, s"url=${d.url}")
    }
  }

  test("generator is deterministic and partition-independent") {
    val spark = SparkTestSession.spark
    val a = CorpusGen.generate(spark, 300, partitions = 1).collect()
      .sortBy(_.url)
    val b = CorpusGen.generate(spark, 300, partitions = 7).collect()
      .sortBy(_.url)
    val local = CorpusGen.generateLocal(300).sortBy(_.url)
    assert(a.length == 300 && b.length == 300)
    a.zip(b).zip(local).foreach { case ((x, y), z) =>
      assert(x.url == y.url && x.url == z.url)
      assert(x.text == y.text && x.text == z.text)
      assert(x.lang == y.lang && x.lang == z.lang)
      assert(x.warc_ts == y.warc_ts && x.warc_ts == z.warc_ts)
      assert(x.html.toSeq == y.html.toSeq)
    }
  }

  test("doc i is byte-identical regardless of corpus size n (upsert idempotence)") {
    // url-keyed upsert across --docs sizes depends on every column being a
    // pure function of (seed, i): appending a 2000-doc corpus over an index
    // built from its first 500 docs must re-ingest those 500 as THE SAME
    // urls (the pre-r5 hosts = n/64 formula broke this silently)
    for (i <- Seq(0L, 1L, 17L, 63L, 64L, 499L)) {
      val small = CorpusGen.doc(CorpusGen.DefaultSeed, i, 500)
      val big = CorpusGen.doc(CorpusGen.DefaultSeed, i, 2000)
      assert(small.url == big.url, s"i=$i url")
      assert(small.text == big.text, s"i=$i text")
      assert(small.html.toSeq == big.html.toSeq, s"i=$i html")
      assert(small.warc_ts == big.warc_ts && small.lang == big.lang, s"i=$i")
    }
  }

  test("urls are unique (docId assignment prerequisite)") {
    val docs = CorpusGen.generateLocal(2000)
    assert(docs.map(_.url).distinct.size == 2000)
  }

  test("skew variant is stopword-heavy") {
    val docs = CorpusGen.generateLocal(200, skew = true)
    val stopSet = CorpusGen.Stopwords.toSet
    val heavy = docs.zipWithIndex.filter(_._2 % 5 == 0).map(_._1)
    val frac = heavy.map { d =>
      val t = graft.index.Analysis.tokenize(d.text)
      t.count(stopSet).toDouble / t.length
    }.sum / heavy.size
    assert(frac > 0.85, s"stopword fraction $frac")
  }
}
