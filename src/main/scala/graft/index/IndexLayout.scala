package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Generation layout of an index directory — the atomic-publish machinery
  * (the reference's visibility barrier is `solrc.commit`,
  * /root/reference/src/indexdata.py:1795–1798; Lucene's is the segments_N
  * file, which this mirrors):
  *
  * {{{
  * indexDir/
  *   current-000001.txt     # pointer: live segment dirs, one per line
  *   current-000002.txt     # a NEWER pointer supersedes older ones
  *   seg-000000/{postings,docs,stats,manifest}
  *   seg-000001/...         # appended batch
  *   tombstones/            # deletes, outside generations
  * }}}
  *
  * Readers resolve the HIGHEST-numbered pointer file; writers publish by
  * creating the next-numbered pointer (create-new, never overwrite) after
  * all data is on disk. A crash at any earlier point leaves the previous
  * pointer — and therefore the previous index — fully intact: build, append
  * and compaction are all atomic at the pointer flip. Superseded segment
  * dirs are garbage, GC'd best-effort after publish.
  */
object IndexLayout {

  def segDirName(k: Int): String = f"seg-$k%06d"

  private def fsOf(spark: SparkSession, indexDir: String): FileSystem =
    new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val PointerRe = "current-(\\d{6})\\.txt".r
  private val SegRe = "seg-(\\d{6})".r

  private def pointerK(name: String): Option[Int] = name match {
    case PointerRe(k) => Some(k.toInt)
    case _            => None
  }

  /** Live segment dirs named by the newest pointer (build order preserved);
    * None if the index has never been published.
    */
  def current(spark: SparkSession, indexDir: String): Option[Seq[String]] = {
    val fs = fsOf(spark, indexDir)
    val base = new Path(indexDir)
    if (!fs.exists(base)) return None
    val ptrs = fs.listStatus(base).toSeq
      .flatMap(st => pointerK(st.getPath.getName).map(_ -> st.getPath))
    // newest first; a legitimate pointer always names >= 1 segdir, so an
    // empty read (a pre-rename-era mid-create pointer, or a torn filesystem)
    // falls back to the next-newest instead of resolving an empty index
    ptrs.sortBy(-_._1).iterator.map { case (_, p) =>
      val in = fs.open(p)
      try {
        val txt = new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        txt.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      } finally in.close()
    }.find(_.nonEmpty)
  }

  /** Publish a new pointer naming `segdirs` as the live set. Atomic: the
    * content is written to a `.tmp` name the pointer regex ignores, then
    * renamed into place — a reader either resolves the previous pointer or
    * the complete new one, never a partial.
    */
  def publish(spark: SparkSession, indexDir: String,
      segdirs: Seq[String]): Unit = {
    val fs = fsOf(spark, indexDir)
    val base = new Path(indexDir)
    if (!fs.exists(base)) fs.mkdirs(base)
    val nextK = fs.listStatus(base).toSeq
      .flatMap(st => pointerK(st.getPath.getName)).foldLeft(0)(math.max) + 1
    val p = new Path(indexDir, f"current-$nextK%06d.txt")
    // write-to-temp + rename: the .tmp name never matches PointerRe, so a
    // concurrent reader can NEVER observe a zero-length or half-written
    // pointer (a racing realtimeGet once resolved an empty segdir set from
    // a mid-create pointer and crashed planning over zero paths). rename
    // also keeps the never-clobber guarantee: it fails if the target exists.
    // The tmp name is per-writer unique: two publishers racing to the same
    // nextK must NOT share a tmp (create(_, true) would truncate the other
    // writer's in-flight bytes and the surviving rename could install a
    // torn pointer); with unique tmps exactly one rename wins and the
    // loser's file stays a .tmp no reader ever matches.
    val tmp = new Path(indexDir,
      f"current-$nextK%06d.txt.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(segdirs.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"pointer flip lost the race: $p exists")
    }
  }

  /** Next unused segment dir name (scans existing seg-*, published or not —
    * an unpublished orphan from a crashed job is never reused).
    */
  def nextSegDir(spark: SparkSession, indexDir: String): String = {
    val fs = fsOf(spark, indexDir)
    val base = new Path(indexDir)
    val k = if (!fs.exists(base)) 0
    else fs.listStatus(base).toSeq.flatMap(st => st.getPath.getName match {
      case SegRe(n) => Some(n.toInt + 1)
      case _        => None
    }).foldLeft(0)(math.max)
    segDirName(k)
  }

  /** Newest segment dir present on disk, published or not (resume target). */
  def latestSegDir(spark: SparkSession, indexDir: String): Option[String] = {
    val fs = fsOf(spark, indexDir)
    val base = new Path(indexDir)
    if (!fs.exists(base)) return None
    val ks = fs.listStatus(base).toSeq.flatMap(st => st.getPath.getName match {
      case SegRe(n) => Some(n.toInt)
      case _        => None
    })
    if (ks.isEmpty) None else Some(segDirName(ks.max))
  }

  /** Delete segment dirs not named by the newest pointer (post-publish GC).
    * Best-effort: a failure leaves only dead bytes, never a broken index.
    *
    * Known at-scale gap: a query planned over the OLD pointer can still be
    * executing when its segment dirs are deleted here — the engine's
    * per-query staleness refresh shrinks but cannot close that window
    * (the Lucene analog is reference-counted readers). The production
    * posture on an object store is DELAYED GC — a grace period or bucket
    * versioning — which this local layout models as immediate deletion.
    */
  def gcUnreferenced(spark: SparkSession, indexDir: String): Unit = {
    val live = current(spark, indexDir).getOrElse(return).toSet
    val fs = fsOf(spark, indexDir)
    // Crash-orphaned pointer temps (unique per writer, see publish) are
    // harmless to readers but would otherwise accumulate; an age guard
    // keeps a racing writer's in-flight tmp safe.
    val tmpGraceMs = 60L * 60 * 1000
    val now = System.currentTimeMillis()
    fs.listStatus(new Path(indexDir)).foreach { st =>
      val name = st.getPath.getName
      if (SegRe.pattern.matcher(name).matches() && !live.contains(name)) {
        try fs.delete(st.getPath, true)
        catch { case _: Exception => }
      } else if (name.startsWith("current-") && name.endsWith(".tmp") &&
          now - st.getModificationTime > tmpGraceMs) {
        try fs.delete(st.getPath, false)
        catch { case _: Exception => }
      }
    }
  }

  // ----------------------------------------------------- job descriptors

  /** Written into a segment dir BEFORE any data: what job is materializing
    * it, which docId offset its buckets use, and which segment set the
    * pointer must name when it completes. Resume REPLAYS this record instead
    * of inferring intent from the published pointer (ADVICE r2: inference
    * mis-published crashed rebuilds and crashed compactions).
    */
  def writeJobDescriptor(spark: SparkSession, segPath: String,
      d: JobDescriptor): Unit = {
    val fs = fsOf(spark, segPath)
    val out = fs.create(new Path(segPath, "job.txt"), true)
    val bucketsLine = if (d.buckets > 0) s"buckets=${d.buckets}\n" else ""
    try out.write(
      (s"kind=${d.kind}\nidOffset=${d.idOffset}\n" +
        s"publish=${d.publish.mkString(",")}\n" + bucketsLine)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readJobDescriptor(spark: SparkSession,
      segPath: String): Option[JobDescriptor] = {
    val fs = fsOf(spark, segPath)
    val p = new Path(segPath, "job.txt")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val kv = txt.split("\n").map(_.trim).filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    for (kind <- kv.get("kind"); off <- kv.get("idOffset")) yield
      JobDescriptor(kind, off.toLong,
        kv.getOrElse("publish", "").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq,
        kv.get("buckets").map(_.toInt).getOrElse(0))
  }

  /** The bucket count the live index was encoded with, from the newest
    * published segment that recorded one (job.txt `buckets=`); falls back to
    * counting `termBucket=` dirs for pre-field segments (a lower bound that
    * is exact whenever every bucket is non-empty — true for any real
    * corpus). None when nothing is published. CLIs use this so an operator
    * never has to repeat --buckets at query/compact time, and a WRONG
    * explicit flag can be rejected loudly instead of silently pruning to
    * the wrong termBucket dirs.
    */
  def detectBuckets(spark: SparkSession, indexDir: String): Option[Int] = {
    val segdirs = current(spark, indexDir).getOrElse(return None)
    val recorded = segdirs.reverseIterator
      .flatMap(sd => readJobDescriptor(spark, s"$indexDir/$sd"))
      .map(_.buckets).find(_ > 0)
    recorded.orElse {
      val fs = fsOf(spark, indexDir)
      val counts = segdirs.flatMap { sd =>
        val p = new Path(s"$indexDir/$sd/postings")
        if (!fs.exists(p)) None
        else Some(fs.listStatus(p)
          .count(_.getPath.getName.startsWith("termBucket=")))
      }.filter(_ > 0)
      if (counts.isEmpty) None else Some(counts.max)
    }
  }

  /** All delete/supersede sources for a live segment set: the global
    * `tombstones/` dir (delete-by-id) plus each segment's `supersedes/`
    * (upsert-by-url victims, written INSIDE the segment before the pointer
    * flip so they become visible atomically WITH the new versions — never
    * before, never after).
    */
  def tombstonePaths(spark: SparkSession, indexDir: String,
      segdirs: Seq[String]): Seq[String] = {
    val fs = fsOf(spark, indexDir)
    val cands = s"$indexDir/tombstones" +:
      segdirs.map(sd => s"$indexDir/$sd/supersedes")
    cands.filter(p => fs.exists(new Path(p)))
  }

  def postingsPaths(spark: SparkSession, indexDir: String): Seq[String] =
    live(spark, indexDir).map(sd => s"$indexDir/$sd/postings")

  def docsPaths(spark: SparkSession, indexDir: String): Seq[String] =
    live(spark, indexDir).map(sd => s"$indexDir/$sd/docs")

  def statsPaths(spark: SparkSession, indexDir: String): Seq[String] =
    live(spark, indexDir).map(sd => s"$indexDir/$sd/stats")

  private def live(spark: SparkSession, indexDir: String): Seq[String] =
    current(spark, indexDir).getOrElse(throw new IllegalStateException(
      s"no published index at $indexDir (no current-*.txt pointer)"))

  /** Combined corpus stats across the live segment dirs: counts and token
    * totals add; avgdl is re-derived from the sums (NOT averaged); the
    * docId high-water mark is the max over generations (-1 when any
    * generation predates the column — callers needing it must fall back).
    */
  def combinedStats(spark: SparkSession, indexDir: String): CorpusStats =
    combinedStats(spark, indexDir, live(spark, indexDir))

  /** Stats over an ALREADY-RESOLVED segdir list. Snapshot readers (the
    * engine's buildView) must use this overload with the segdirs they
    * resolved once: the pointer-resolving overload re-reads `current`
    * internally, so a pointer flip between the two reads would pair one
    * generation set's docs/postings with another's stats (wrong idf/norms
    * for every query on that snapshot).
    */
  def combinedStats(spark: SparkSession, indexDir: String,
      segdirs: Seq[String]): CorpusStats = {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val parts = segdirs.map(sd => s"$indexDir/$sd/stats").flatMap { p =>
      val df = spark.read.parquet(p)
      val withMax = // pre-r5 stats files lack maxDocId
        if (df.columns.contains("maxDocId")) df
        else df.withColumn("maxDocId", lit(-1L))
      withMax.as[CorpusStats].collect()
    }
    val n = parts.map(_.n).sum
    val tt = parts.map(_.totalTerms).sum
    val ttl = parts.map(_.titleTerms).sum
    val maxId =
      if (parts.isEmpty || parts.exists(_.maxDocId < 0)) -1L
      else parts.map(_.maxDocId).max
    CorpusStats(n, if (n == 0) 0.0 else tt.toDouble / n, tt,
      if (n == 0) 0.0 else ttl.toDouble / n, ttl, maxId)
  }
}
