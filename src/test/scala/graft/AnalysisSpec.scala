package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.index.Analysis

/** The scanner tokenizer must be byte-identical to the reference regex
  * definition (CLAUDE.md tokenizer rule: ONE definition, three
  * implementations — Scala, Spark SQL expression, DuckDB regex).
  */
class AnalysisSpec extends AnyFunSuite {

  private def randomText(rng: Random, unicode: Boolean): String = {
    val n = rng.nextInt(200)
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      sb.append(rng.nextInt(if (unicode) 12 else 10) match {
        case 0 | 1 | 2 | 3 => ('a' + rng.nextInt(26)).toChar
        case 4 | 5         => ('A' + rng.nextInt(26)).toChar
        case 6             => ('0' + rng.nextInt(10)).toChar
        case 7             => ' '
        case 8             => "\t\n.,-_<>&:\"'".charAt(rng.nextInt(12))
        case 9             => rng.nextInt(128).toChar // any ASCII incl. ctrl
        case 10            => "ÆøÉßK€".charAt(rng.nextInt(6)) // incl. Kelvin
        case _             => rng.nextInt(0x300).toChar
      })
      i += 1
    }
    sb.toString
  }

  test("scanner == regex tokenizer on random ASCII (10k cases)") {
    val rng = new Random(4242)
    (1 to 10000).foreach { _ =>
      val s = randomText(rng, unicode = false)
      assert(Analysis.tokenize(s).toSeq === Analysis.tokenizeViaRegex(s).toSeq,
        s"input: ${s.take(80)}")
    }
  }

  test("scanner == regex tokenizer on mixed unicode (fallback path, 10k)") {
    val rng = new Random(4243)
    (1 to 10000).foreach { _ =>
      val s = randomText(rng, unicode = true)
      assert(Analysis.tokenize(s).toSeq === Analysis.tokenizeViaRegex(s).toSeq,
        s"input: ${s.take(80)}")
    }
  }

  test("fixed cases") {
    assert(Analysis.tokenize("The  Quick-brown FOX42 ").toSeq ===
      Seq("the", "quick", "brown", "fox42"))
    assert(Analysis.tokenize("").toSeq === Seq.empty)
    assert(Analysis.tokenize("---").toSeq === Seq.empty)
    assert(Analysis.tokenize("a").toSeq === Seq("a"))
  }
}
