package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.index._

/** Query side of the engine — the analog of `searchindex.py` (search → top-k
  * → optional delete). Two physical strategies, rank-identical by test:
  *
  *  - `searchExhaustive`: pure Catalyst plan — pruned postings scan → decode
  *    flatMap → per-doc deterministic score fold → filters →
  *    TakeOrderedAndProject. The regression anchor (SURVEY.md §7 step 3).
  *  - `search` (default): distributed block-max WAND — the docId space is
  *    sliced into disjoint windows, each task runs the BMW loop over lazily
  *    block-decoded cursors, per-window top-k merge globally (exact because
  *    windows are disjoint).
  *
  * Both prune the postings scan to the query terms' buckets: the postings
  * table is directory-partitioned by termBucket, so Spark's partition
  * discovery skips every other bucket, and Parquet min/max on the sorted
  * `term` column prunes row groups within a bucket.
  */
final class QueryEngine(spark: SparkSession, indexDir: String,
    numBuckets: Int = 32) {
  import spark.implicits._

  lazy val stats: CorpusStats =
    spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()

  lazy val docs: DataFrame = spark.read.parquet(s"$indexDir/docs")

  private def tombstones: Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Pruned postings scan for a term set: bucket partition pruning + term
    * predicate (Parquet min-max pruning on the sorted term column).
    */
  def postingsFor(terms: Seq[String]): Dataset[PostingSegment] = {
    val ts = terms.distinct
    if (ts.isEmpty) return spark.emptyDataset[PostingSegment]
    val buckets = ts.map(IndexBuilder.bucketOf(_, numBuckets)).distinct
    spark.read.parquet(s"$indexDir/postings")
      .filter($"termBucket".isin(buckets: _*) && $"term".isin(ts: _*))
      .as[PostingSegment]
  }

  def search(q: String, k: Int): DataFrame = searchWand(q, k)

  // ---------------------------------------------------------------- WAND

  def searchWand(q: String, k: Int): DataFrame = {
    val ast = QueryParser.parse(q)
    val scoring = ast.scoringTerms.distinct.sorted
    val must = ast.mustTerms.toSet
    val not = ast.notTerms.distinct
    if (scoring.isEmpty) return emptyResult
    val n = stats.n
    val avgdl = stats.avgdl

    // stored-field predicate → broadcast allow-bitmap over docIds. Sandbox
    // scale path; at 10^12 docs this becomes a partition-aligned columnar
    // filter file per docId range (same shape, not materialized on the
    // driver). Tombstones ride the same bitmap as exclusions.
    val denyIds: Array[Long] = tombstones match {
      case Some(t) => t.select($"docId").as[Long].collect()
      case None    => Array.empty[Long]
    }
    val allowBitmap: Option[java.util.BitSet] = ast.langFilter.map { l =>
      val bs = new java.util.BitSet(n.toInt)
      docs.filter($"lang" === l).select($"docId").as[Long]
        .collect().foreach(id => bs.set(id.toInt))
      bs
    }
    val needAllow = allowBitmap.isDefined || denyIds.nonEmpty
    val denySet = denyIds.toSet
    val bAllow = spark.sparkContext.broadcast((allowBitmap, denySet))

    val segs = postingsFor(scoring ++ not)
    val parallelism = math.max(1, spark.sparkContext.defaultParallelism)
    val rangeLen = math.max(1L, (n + parallelism - 1) / parallelism)

    val mustB = must
    val notB = not
    val scoringB = scoring
    val kB = k

    val perWindow: Dataset[Wand.Scored] = segs
      .flatMap { s =>
        val first = (s.firstDocId / rangeLen).toInt
        val last = (s.lastDocId / rangeLen).toInt
        (first to last).map(r => (r, s))
      }
      .groupByKey(_._1)
      .flatMapGroups { (rid, it) =>
        val byTerm = it.map(_._2).toSeq.groupBy(_.term)
        val lo = rid.toLong * rangeLen
        val hi = lo + rangeLen
        val allowFn: Option[Long => Boolean] =
          if (needAllow) Some { id =>
            val (bm, deny) = bAllow.value
            bm.forall(_.get(id.toInt)) && !deny.contains(id)
          } else None
        Wand.topK(byTerm, scoringB, mustB, notB, n, avgdl, kB, lo, hi,
          allowFn).iterator
      }

    perWindow.toDF()
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }

  // ---------------------------------------------------------- exhaustive

  def searchExhaustive(q: String, k: Int): DataFrame = {
    val ast = QueryParser.parse(q)
    val scoring = ast.scoringTerms.distinct.sorted
    val must = ast.mustTerms.distinct
    val not = ast.notTerms.distinct
    if (scoring.isEmpty) return emptyResult
    val n = stats.n
    val avgdl = stats.avgdl

    def hitsFor(terms: Seq[String]): DataFrame = {
      val nB = n; val avgdlB = avgdl
      postingsFor(terms).flatMap { s =>
        val idfv = BM25.idf(nB, s.df)
        val (ids, tfs, dls) = PostingCodec.decodeAll(s)
        val out = new Array[(String, Long, Double)](s.count)
        var i = 0
        while (i < s.count) {
          out(i) = (s.term, ids(i), BM25.score(tfs(i), dls(i), avgdlB, idfv))
          i += 1
        }
        out.toSeq
      }.toDF("term", "docId", "score")
    }

    // deterministic per-doc score: fold term contributions in term-sorted
    // order via sort_array + aggregate (bit-identical at any parallelism)
    var scored = hitsFor(scoring)
      .groupBy($"docId")
      .agg(
        aggregate(
          sort_array(collect_list(struct($"term", $"score"))),
          lit(0.0),
          (acc, x) => acc + x.getField("score")).as("score"),
        sum(when($"term".isin(must: _*), 1).otherwise(0)).as("mustHits"))
    if (must.nonEmpty) scored = scored.filter($"mustHits" === must.size)
    scored = scored.select($"docId", $"score")

    if (not.nonEmpty) {
      val excl = hitsFor(not).select($"docId").distinct()
      scored = scored.join(excl, Seq("docId"), "left_anti")
    }
    ast.langFilter.foreach { l =>
      scored = scored.join(
        docs.filter($"lang" === l).select($"docId"), Seq("docId"), "left_semi")
    }
    tombstones.foreach { t =>
      scored = scored.join(t.select($"docId"), Seq("docId"), "left_anti")
    }
    scored.orderBy(desc("score"), asc("docId")).limit(k)
  }

  private def emptyResult: DataFrame =
    spark.emptyDataset[Wand.Scored].toDF()

  /** Search-then-delete (reference: searchindex.py:141–150 iterates hits and
    * deletes each id) — set-based instead of per-hit RPCs.
    */
  def deleteByQuery(q: String, k: Int): Long = {
    val ids = search(q, k).select($"docId").as[Long].collect()
    Deletes.delete(spark, indexDir, ids)
    ids.length.toLong
  }
}

/** Delete-by-id as tombstones (reference: solrc.delete(id=…) at
  * /root/reference/src/searchindex.py:83–92): anti-joined at query time until
  * compaction rewrites the affected segments.
  */
object Deletes {
  def delete(spark: SparkSession, indexDir: String, docIds: Seq[Long]): Unit = {
    import spark.implicits._
    if (docIds.nonEmpty)
      docIds.toDS().toDF("docId")
        .write.mode(SaveMode.Append).parquet(s"$indexDir/tombstones")
  }
}
