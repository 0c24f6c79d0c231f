package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // plan-audit hook: SPARK_GRAFT_EXPLAIN=q_a,q_b prints those queries'
    // formatted physical plans instead of writing results (for recording
    // broadcast/pushdown shapes in BASELINE.md without an ad-hoc main)
    sys.env.get("SPARK_GRAFT_EXPLAIN").foreach { names =>
      names.split(",").foreach { n =>
        println(s"==== explain $n ====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // dynamic oracles (r5): SQL generated against THIS sfDir — the LSH
    // verify stages embed their (deterministic) candidate pair list as a
    // VALUES fixture. A generator failure degrades that query to rows-only
    // (its absence from oracle_sql.json), never fails the dump.
    val dynamic = SparkEntry.oracleSqlDynamic.flatMap { case (name, gen) =>
      try gen(spark, sfDir).map(name -> _)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle $name failed: ${e.getMessage}")
        None
      }
    }
    val json = (SparkEntry.oracleSql ++ dynamic)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
