package graft

/** Extra measurement main for the r6 optimization round (guide §1.4): times
  * individual SparkEntry ops with the SAME action as the frozen harness
  * (`.count()` on the same session config), repeated, with per-Spark-job
  * wall times from a listener so checkpoint/broadcast/main-job splits are
  * visible. Never used by the driver contract — `graft.Bench` stays the
  * record; this exists for isolation numbers cited in OPTIMIZATION_r06.md.
  *
  * Usage: [SPARK_GRAFT_SF_DIR=...] [REPS=n] runbench.sh graft.BenchExtra q_a q_b ...
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("REPS", "4").toInt
    val s = BenchCommon.session(cpus)
    val osb = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLog =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobs.remove(e.jobId)
          jobLog.synchronized {
            jobLog += ((e.jobId, (System.nanoTime() - t0) / 1e9, ""))
          }
        }
      })

    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // INTERLEAVE=1 reproduces graft.Bench's methodology exactly: the rep
    // loop OUTSIDE the op loop, with the same 100M-row canary job
    // bracketing each rep — per-op reps are otherwise back-to-back, which
    // warms JIT/caches differently than the frozen harness does.
    val interleave = sys.env.get("INTERLEAVE").contains("1")
    def sparkCanary(): Double = BenchCommon.timeS {
      import org.apache.spark.sql.functions.{col, max => fmax, xxhash64}
      s.range(0, 100000000L, 1, 32).select(fmax(xxhash64(col("id")))).head()
    }._2
    names.foreach { q =>
      try SparkEntry.queries(q)(s, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"warm $q: $e") }
    }
    def runOne(q: String): (Double, Double, Seq[(Int, Double, String)]) = {
      jobLog.synchronized(jobLog.clear())
      val cpu0 = osb.getProcessCpuTime
      val (_, t) = BenchCommon.timeS {
        try SparkEntry.queries(q)(s, sfDir).count()
        catch { case e: Throwable => System.err.println(s"run $q: $e"); -1L }
      }
      val cpu = (osb.getProcessCpuTime - cpu0) / 1e9
      // settle async listener events before reading the log
      Thread.sleep(50)
      (t, cpu, jobLog.synchronized(jobLog.toSeq))
    }
    val results: Map[String, Seq[(Double, Double, Seq[(Int, Double, String)])]] =
      if (interleave) {
        sparkCanary()
        val reps2 = (1 to reps).map { _ =>
          val c0 = sparkCanary()
          val row = names.map(q => q -> runOne(q))
          System.err.println(f"[canary] $c0%.3f")
          row
        }
        names.map(q => q -> reps2.map(_.toMap.apply(q))).toMap
      } else names.map(q => q -> (1 to reps).map(_ => runOne(q))).toMap
    names.foreach { q =>
      val runs = results(q)
      val best = runs.minBy(_._1)
      println(f"BENCHX $q min=${best._1}%.3f cpu=${best._2}%.2f " +
        s"walls=${runs.map(r => f"${r._1}%.3f").mkString(",")} " +
        s"jobs=[${best._3.map(j => f"${j._2}%.3f").mkString(",")}]")
    }
    s.stop()
  }
}
