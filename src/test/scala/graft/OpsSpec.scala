package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity over the driver-verified ops at sf0.001 (full value-level
  * verification against DuckDB happens driver-side and via
  * scripts/check_oracles.py).
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("every registered query runs and the oracle keys line up") {
    // every oracle key must have a query; rows-only queries are allowed
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os.diff(qs)}")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, name)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("spot values: dedup + fingerprint agree on identical texts") {
    import org.apache.spark.sql.functions._
    val dups = graft.ops.Ops.dedupExact(spark, dir)
      .filter(col("n") > 1).count()
    val ngram = graft.ops.Ops.dedupNgram(spark, dir)
    val high = ngram.filter(col("jaccard") > 0.9).count()
    // the driver's documents table contains synthetic near-dups
    assert(high > 0, "expected near-duplicate pairs with jaccard > 0.9")
    // minhash LSH must recall most high-jaccard pairs
    val lsh = graft.ops.Ops.minhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val highPairs = ngram.filter(col("jaccard") > 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = highPairs.count(lsh).toDouble / math.max(1, highPairs.size)
    assert(recall >= 0.8, s"LSH recall $recall over ${highPairs.size} pairs")
    assert(dups >= 0)
  }

  test("cosine top-k includes the query vector itself at rank 1") {
    val top = graft.ops.Ops.embedCosine(spark, dir).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
  }
}
