package graft.index

import java.sql.Timestamp

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.corpus.{Extractor, WebDoc}

final case class BuildReport(
    docs: Long,
    terms: Long,
    postings: Long,
    segments: Long,
    buckets: Int,
    durationMs: Long)

final case class ExtractedDoc(url: String, warc_ts: Timestamp,
    lang: String, text: String)
final case class IdDoc(docId: Long, url: String, warc_ts: Timestamp,
    lang: String, text: String)

/** One enriched tf row headed into the segment encoder. */
final case class TfRow(term: String, segment: Int, df: Long, cf: Long,
    docId: Long, tf: Long, doclen: Long)

/** Distributed inverted-index build — the from-scratch replacement for the
  * Solr ingestion the reference delegates to (`solrc.add` at
  * /root/reference/src/indexdata.py:1306). One batch job, three shuffles
  * (SURVEY.md §3 E1):
  *
  *   read → extract (narrow) → docId assign (shuffle 1: range by url)
  *        → tokenize flatMap (narrow, codegen) → tf agg (shuffle 2: hash by
  *          (docId,term); map-side partial agg collapses the token stream)
  *        → df/cf agg + segment assign → encode (shuffle 3: hash by
  *          (term,segment)) → write postings partitioned by termBucket
  *        → manifest commit (visibility barrier — the reference's
  *          solrc.commit analog, indexdata.py:1795–1798; write-audit-publish)
  *
  * Scale notes (designed for 10^12 docs / 1000 executors, tested local):
  *  - docIds are dense ranks in global url order: range-partition +
  *    in-partition sort + per-partition offsets (two-pass; the sorted Dataset
  *    is persisted so both passes see identical range boundaries). No window
  *    over a single partition, no RDD zipWithIndex.
  *  - skew: terms with df > segmentMaxDocs (stopwords) are split into
  *    docId-range segments, so shuffle 3 never concentrates a stopword's
  *    postings into one task and no task buffers more than segmentMaxDocs
  *    postings.
  *  - `html`/`text` never cross a shuffle after tokenization — only
  *    (docId, term) pairs move.
  */
object IndexBuilder {

  /** Stable term→directory-partition hash; MUST match the query side. */
  def bucketOf(term: String, numBuckets: Int): Int =
    math.floorMod(term.hashCode, numBuckets)

  /** Assign dense docIds 0..N-1 in global url sort order (deterministic at
    * any parallelism). Returns the id'd docs plus an unpersist handle for the
    * underlying cached sorted Dataset (must stay cached while idDocs is in
    * use, or the sampled range boundaries could drift between jobs).
    */
  def assignDocIds(spark: SparkSession, docs: Dataset[WebDoc],
      partitions: Int = 0): (Dataset[IdDoc], () => Unit) = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else math.max(1, spark.sparkContext.defaultParallelism)
    val extracted = docs.map(d =>
      ExtractedDoc(d.url, d.warc_ts, d.lang, Extractor.extract(d.html)))
    val sorted = extracted
      .repartitionByRange(p, $"url")
      .sortWithinPartitions($"url")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.toDF()
      .select(spark_partition_id().as("pid"))
      .groupBy($"pid").count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = new Array[Long](p + 1)
    var i = 0
    while (i < p) { offsets(i + 1) = offsets(i) + counts.getOrElse(i, 0L); i += 1 }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val idDocs = sorted.mapPartitions { it =>
      var id = bOffsets.value(TaskContext.getPartitionId())
      it.map { d =>
        val out = IdDoc(id, d.url, d.warc_ts, d.lang, d.text)
        id += 1
        out
      }
    }
    (idDocs, () => { sorted.unpersist(); () })
  }

  /** Tokenize with codegen'd built-ins (no UDF in the hot path); the
    * expression mirrors Analysis.tokenize exactly.
    */
  def tokens(idDocs: Dataset[IdDoc]): DataFrame =
    idDocs.toDF()
      .select(col("docId"),
        explode(split(lower(col("text")), Analysis.TokenSplitRegex)).as("term"))
      .filter(length(col("term")) > 0)

  def build(spark: SparkSession, docs: Dataset[WebDoc], outDir: String,
      conf: IndexConf = IndexConf()): BuildReport =
    buildInternal(spark, docs, outDir, conf, onlyBuckets = None)

  /** Resume a partially-completed build: rebuild exactly the termBuckets that
    * have no `complete` manifest row (segment-granular resume per the
    * north_rule). Re-derivation is deterministic, so rebuilt buckets are
    * identical to what the original build would have produced. Partial files
    * from a killed attempt are cleaned before the append.
    */
  def resume(spark: SparkSession, docs: Dataset[WebDoc], outDir: String,
      conf: IndexConf = IndexConf()): BuildReport = {
    import spark.implicits._
    val done: Set[Int] =
      try spark.read.parquet(s"$outDir/manifest")
        .filter($"status" === "complete")
        .select($"partitionId").as[Int].collect().toSet
      catch { case _: Exception => Set.empty }
    val missing = (0 until conf.numBuckets).filterNot(done).toSet
    if (missing.isEmpty) BuildReport(0, 0, 0, 0, conf.numBuckets, 0)
    else {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      missing.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$outDir/postings/termBucket=$b"), true)
      }
      buildInternal(spark, docs, outDir, conf, Some(missing))
    }
  }

  private def buildInternal(spark: SparkSession, docs: Dataset[WebDoc],
      outDir: String, conf: IndexConf,
      onlyBuckets: Option[Set[Int]]): BuildReport = {
    import spark.implicits._
    val t0 = System.nanoTime()
    def phase(name: String): Unit =
      println(f"[graft-build] +${(System.nanoTime() - t0) / 1e9}%.1fs $name")
    val nb = conf.numBuckets
    val append = onlyBuckets.isDefined
    val inputFiles = docs.inputFiles

    val (idDocs, unpersistSorted) = assignDocIds(spark, docs, conf.buildPartitions)
    phase("docIds assigned")

    val tfs = tokens(idDocs)
      .groupBy($"docId", $"term").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // doc lengths derived from tfs (no second tokenize pass)
    val doclens = tfs.groupBy($"docId").agg(sum($"tf").as("doclen"))

    val docsTable = idDocs.toDF()
      .drop("text")
      .join(doclens, Seq("docId"))
      .select($"docId", $"url", $"warc_ts", $"lang", $"doclen")

    phase("tf/doclen plan ready")
    val statsRow = doclens.agg(
      count(lit(1)).as("n"), avg($"doclen").as("avgdl"),
      sum($"doclen").as("totalTerms")).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getDouble(1)
    val totalTerms = statsRow.getLong(2)
    phase(s"stats computed (n=$nDocs)")

    val dfcf = tfs.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))

    val segMax = conf.segmentMaxDocs

    // join doclen + term stats onto tf rows; assign docId-range segment for
    // skewed terms. The dfcf join shuffles by term — the distribution the
    // encode step needs anyway.
    var enriched = tfs
      .join(doclens, Seq("docId"))
      .join(dfcf, Seq("term"))
      .withColumn("nSeg",
        when($"df" <= segMax, lit(1L))
          .otherwise(ceil($"df".cast("double") / segMax).cast("long")))
      .withColumn("segLen",
        ceil(lit(nDocs).cast("double") / $"nSeg").cast("long"))
      .withColumn("segment", ($"docId" / $"segLen").cast("int"))
    onlyBuckets.foreach { bs =>
      val bucketUdf = udf((t: String) => bucketOf(t, nb))
      enriched = enriched.filter(bucketUdf($"term").isin(bs.toSeq: _*))
    }

    val encodePartitions = math.max(
      if (conf.buildPartitions > 0) conf.buildPartitions
      else spark.sparkContext.defaultParallelism, 1)

    val segments: Dataset[PostingSegment] = enriched
      .select($"term", $"segment", $"df", $"cf", $"docId", $"tf", $"doclen")
      .repartition(encodePartitions, $"term", $"segment")
      .sortWithinPartitions($"term", $"segment", $"docId")
      .as[TfRow]
      .mapPartitions(it => new SegmentEncoder(it, nDocs, avgdl, nb))

    segments.toDF()
      .write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .partitionBy("termBucket").parquet(s"$outDir/postings")
    phase("postings written")

    docsTable.write.mode(SaveMode.Overwrite).parquet(s"$outDir/docs")
    phase("docs written")
    Seq(CorpusStats(nDocs, avgdl, totalTerms)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stats")

    // manifest LAST = the commit barrier: a bucket is complete only once its
    // manifest row lands.
    val durationMs = (System.nanoTime() - t0) / 1000000L
    val written = spark.read.parquet(s"$outDir/postings")
    var manifestNew = written
      .groupBy($"termBucket")
      .agg(min($"term").as("termRangeLo"), max($"term").as("termRangeHi"),
        count(lit(1)).as("segCount"), sum($"count").as("rowCount"),
        (sum(length($"docIdsVb")) + sum(length($"tfsVb")) +
          sum(length($"dlsVb"))).as("bytes"))
      .select($"termBucket".cast("int").as("partitionId"),
        $"termRangeLo", $"termRangeHi", $"segCount", $"rowCount", $"bytes",
        typedLit(inputFiles.toSeq).as("inputFiles"),
        lit(durationMs).as("durationMs"), lit("complete").as("status"))
    onlyBuckets.foreach { bs =>
      manifestNew = manifestNew.filter($"partitionId".isin(bs.toSeq: _*))
    }
    val manifestRows: Array[ManifestRow] =
      (if (append)
        try manifestNew.as[ManifestRow].collect() ++
          spark.read.parquet(s"$outDir/manifest").as[ManifestRow].collect()
            .filterNot(m => onlyBuckets.get.contains(m.partitionId))
        catch { case _: Exception => manifestNew.as[ManifestRow].collect() }
      else manifestNew.as[ManifestRow].collect())
    manifestRows.toSeq.toDS().coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/manifest")

    phase("manifest written")
    val segCount = written.count()
    val postingsCount = tfs.count()
    val termCount = dfcf.count()
    phase("report counts done")
    tfs.unpersist()
    unpersistSorted()
    BuildReport(nDocs, termCount, postingsCount, segCount, nb, durationMs)
  }
}

/** Streaming run-encoder: consumes TfRows sorted by (term, segment, docId)
  * within the partition and emits one PostingSegment per (term, segment)
  * run. Memory per run is bounded by segmentMaxDocs postings.
  */
private final class SegmentEncoder(it: Iterator[TfRow], n: Long,
    avgdl: Double, numBuckets: Int) extends Iterator[PostingSegment] {

  private val buf = it.buffered
  override def hasNext: Boolean = buf.hasNext
  override def next(): PostingSegment = {
    val head = buf.head
    val term = head.term
    val segment = head.segment
    val docIds = new scala.collection.mutable.ArrayBuffer[Long]()
    val tfs = new scala.collection.mutable.ArrayBuffer[Long]()
    val dls = new scala.collection.mutable.ArrayBuffer[Long]()
    while (buf.hasNext && buf.head.term == term && buf.head.segment == segment) {
      val r = buf.next()
      docIds += r.docId; tfs += r.tf; dls += r.doclen
    }
    PostingCodec.encode(term, IndexBuilder.bucketOf(term, numBuckets), segment,
      head.df, head.cf, docIds.toArray, tfs.toArray, dls.toArray, n, avgdl)
  }
}
