package graft.index

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Segment compaction — the analog of Solr/Lucene background merges
  * (SURVEY.md §4.2 "segment merge policy" / "deletes as tombstones until
  * merge"). Physically drops tombstoned postings and recomputes df/cf and
  * corpus stats from the survivors (Lucene likewise only corrects df/norms
  * at merge time), so post-compaction BM25 scores equal a fresh build over
  * the surviving corpus with the original docIds.
  *
  * The job never touches the source corpus: it decodes the existing
  * segments (a narrow scan of the postings table), filters, and re-encodes
  * through the builder's shared encode path.
  */
object Compaction {

  def run(spark: SparkSession, indexDir: String,
      conf: IndexConf = IndexConf()): Unit = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    if (!fs.exists(tombPath)) return // nothing to do
    val tombs = spark.read.parquet(tombPath.toString)
      .select($"docId").distinct()

    // surviving docs + new corpus stats
    val docs = spark.read.parquet(s"$indexDir/docs")
      .join(tombs, Seq("docId"), "left_anti")
      .localCheckpoint()
    val statsRow = docs.agg(count(lit(1)).as("n"), avg($"doclen").as("avgdl"),
      sum($"doclen").as("totalTerms")).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getDouble(1)
    val totalTerms = statsRow.getLong(2)

    // decode → drop tombstoned postings
    val rows = spark.read.parquet(s"$indexDir/postings").as[PostingSegment]
      .flatMap { s =>
        val (ids, tfs, dls) = PostingCodec.decodeAll(s)
        Iterator.tabulate(s.count)(i => (s.term, ids(i), tfs(i), dls(i)))
      }
      .toDF("term", "docId", "tf", "doclen")
      .join(tombs, Seq("docId"), "left_anti")
      .localCheckpoint()

    // write-audit-publish into a sibling dir, then swap
    val tmp = s"$indexDir/compact.tmp"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    IndexBuilder.encodePostings(spark, rows, nDocs, avgdl, conf, tmp,
      append = false, onlyBuckets = None)
    docs.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/docs.compact")
    rows.unpersist()
    docs.unpersist()

    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/postings"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/postings"),
      new org.apache.hadoop.fs.Path(s"$indexDir/postings"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/docs"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$indexDir/docs.compact"),
      new org.apache.hadoop.fs.Path(s"$indexDir/docs"))
    Seq(CorpusStats(nDocs, avgdl, totalTerms)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")
    fs.delete(tombPath, true) // tombstones folded in

    // refresh the manifest from the rewritten postings
    val written = spark.read.parquet(s"$indexDir/postings")
    val manifest = written.groupBy($"termBucket")
      .agg(min($"term").as("termRangeLo"), max($"term").as("termRangeHi"),
        count(lit(1)).as("segCount"), sum($"count").as("rowCount"),
        (sum(length($"docIdsVb")) + sum(length($"tfsVb")) +
          sum(length($"dlsVb"))).as("bytes"))
      .select($"termBucket".cast("int").as("partitionId"),
        $"termRangeLo", $"termRangeHi", $"segCount", $"rowCount", $"bytes",
        typedLit(Seq.empty[String]).as("inputFiles"),
        lit(0L).as("durationMs"), lit("complete").as("status"))
      .as[ManifestRow].collect()
    manifest.toSeq.toDS().coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/manifest")
  }
}
