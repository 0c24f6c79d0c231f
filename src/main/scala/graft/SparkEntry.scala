package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.ops.Ops

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every oracle SQL is DuckDB dialect over the same parquet tables; column
  * names are aligned exactly with the Spark results (the driver sorts
  * columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship: BM25 top-k over the documents table at sf0.001 — the
    * engine's "minimum end-to-end slice" as one Catalyst plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Ops.bm25TopK(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // index analogs (SURVEY.md §2.6/§2.7)
    "q_tokenize_tf" -> ((s, d) => Ops.tokenizeTf(s, d)),
    "q_df_cf" -> ((s, d) => Ops.dfCf(s, d)),
    "q_doclen" -> ((s, d) => Ops.doclen(s, d)),
    "q_corpus_stats" -> ((s, d) => Ops.corpusStats(s, d)),
    "q_bm25_topk" -> ((s, d) => Ops.bm25TopK(s, d)),
    "q_bm25_boosted" -> ((s, d) => Ops.bm25Boosted(s, d)),
    "q_bm25_qf" -> ((s, d) => Ops.bm25QfTopK(s, d)),
    "q_fq_topk" -> ((s, d) => Ops.bm25FqTopK(s, d)),
    "q_qop_and" -> ((s, d) => Ops.bm25QopAndTopK(s, d)),
    "q_facet_query" -> ((s, d) => Ops.facetQueryCounts(s, d)),
    "q_fuzzy_topk" -> ((s, d) => Ops.fuzzyTopK(s, d)),
    "q_wildcard_topk" -> ((s, d) => Ops.wildcardTopK(s, d)),
    "q_term_range" -> ((s, d) => Ops.termRangeTopK(s, d)),
    "q_sorted_match" -> ((s, d) => Ops.sortedMatchTopk(s, d)),
    "q_export_sorted" -> ((s, d) => Ops.exportSorted(s, d)),
    "q_facet_prefix" -> ((s, d) => Ops.facetPrefixIndex(s, d)),
    "q_ngroups" -> ((s, d) => Ops.ngroupsMatch(s, d)),
    "q_stats_percentiles" -> ((s, d) => Ops.statsPercentiles(s, d)),
    "q_topk_orders" -> ((s, d) => Ops.topkOrders(s, d)),
    // extraction / validation / join analogs (SURVEY.md §2.3–§2.5)
    "q_id_sanitize" -> ((s, d) => Ops.idSanitize(s, d)),
    "q_required_check" -> ((s, d) => Ops.requiredCheck(s, d)),
    "q_envelope_agg" -> ((s, d) => Ops.envelopeAgg(s, d)),
    "q_validate_range" -> ((s, d) => Ops.validateRange(s, d)),
    "q_parent_semi" -> ((s, d) => Ops.parentSemi(s, d)),
    "q_parent_flag" -> ((s, d) => Ops.parentFlag(s, d)),
    "q_tombstone_anti" -> ((s, d) => Ops.tombstoneAnti(s, d)),
    "q_daterange_overlap" -> ((s, d) => Ops.daterangeOverlap(s, d)),
    "q_window_rank" -> ((s, d) => Ops.windowRank(s, d)),
    "q_lastupdate_max" -> ((s, d) => Ops.lastupdateMax(s, d)),
    "q_field_extract" -> ((s, d) => Ops.fieldExtract(s, d)),
    "q_date_format" -> ((s, d) => Ops.dateFormatIso(s, d)),
    "q_source_lookup" -> ((s, d) => Ops.sourceLookup(s, d)),
    "q_source_manifest" -> ((s, d) => Ops.sourceManifest(s, d)),
    "q_lang_select" -> ((s, d) => Ops.langSelect(s, d)),
    "q_facet_count" -> ((s, d) => Ops.facetCount(s, d)),
    "q_temporal_sanity" -> ((s, d) => Ops.temporalSanity(s, d)),
    // training-data pipeline ops
    "q_dedup_exact" -> ((s, d) => Ops.dedupExact(s, d)),
    "q_fingerprint" -> ((s, d) => Ops.fingerprint(s, d)),
    "q_token_count" -> ((s, d) => Ops.tokenCount(s, d)),
    "q_quality_score" -> ((s, d) => Ops.qualityScore(s, d)),
    "q_repetition" -> ((s, d) => Ops.repetitionRatio(s, d)),
    "q_lang_id" -> ((s, d) => Ops.langId(s, d)),
    "q_dedup_ngram" -> ((s, d) => Ops.dedupNgram(s, d)),
    "q_embed_cosine" -> ((s, d) => Ops.embedCosine(s, d)),
    "q_emb_quantize" -> ((s, d) => Ops.embQuantize(s, d)),
    "q_media_meta" -> ((s, d) => Ops.mediaMeta(s, d)),
    // engine query-surface analogs (Q2/Q3): fielded filter, range, phrase
    "q_url_filter" -> ((s, d) => Ops.urlFilterTopk(s, d)),
    "q_range_filter" -> ((s, d) => Ops.rangeFilterTopk(s, d)),
    "q_phrase_match" -> ((s, d) => Ops.phraseMatch(s, d)),
    "q_phrase_slop" -> ((s, d) => Ops.phraseSlop(s, d)),
    "q_event_window" -> ((s, d) => Ops.eventWindow(s, d)),
    // MMD pivot analogs (r5): P18/P20/P21/P23/P25 computational shapes
    "q_personnel_pivot" -> ((s, d) => Ops.personnelPivot(s, d)),
    "q_access_pivot" -> ((s, d) => Ops.accessPivot(s, d)),
    "q_parent_ref" -> ((s, d) => Ops.parentRef(s, d)),
    "q_related_url_lut" -> ((s, d) => Ops.relatedUrlLut(s, d)),
    "q_keywords_double" -> ((s, d) => Ops.keywordsDouble(s, d)),
    // hash/cluster stages aren't DuckDB-portable; everything downstream
    // (band join+cap, bit voting, cosine top-k) is oracled via dynamic
    // fixture SQL (oracleSqlDynamic, r5)
    "q_minhash_lsh" -> ((s, d) => Ops.minhashLsh(s, d)),
    "q_simhash" -> ((s, d) => Ops.simhash(s, d)),
    "q_ann_ivf" -> ((s, d) => Ops.annIvf(s, d)),
    // verify stages oracled via dynamic fixture SQL (oracleSqlDynamic, r5)
    "q_dedup_lsh_verified" -> ((s, d) => Ops.dedupLshVerified(s, d)),
    // driver embeddings are isotropic noise (no true near-dups), so the
    // driver entry runs the candidate+verify pipeline at a low threshold to
    // exercise it end-to-end; library default is 0.9
    "q_emb_neardup" -> ((s, d) => Ops.embNearDup(s, d, threshold = 0.2)),
    // Solr component analogs (r5 tail): mlt, facet.pivot, hl
    "q_mlt" -> ((s, d) => Ops.moreLikeThis(s, d)),
    "q_facet_pivot" -> ((s, d) => Ops.facetPivot(s, d)),
    "q_highlight" -> ((s, d) => Ops.highlightTopK(s, d)),
    "q_highlight_multi" -> ((s, d) => Ops.highlightSnippets(s, d)),
  )

  private val Tok =
    "string_split_regex(lower(text), '[^a-z0-9]+')"
  private val TfCte =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($Tok) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
       |  WHERE term <> '' GROUP BY doc_id, term
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_tokenize_tf" ->
      s"$TfCte SELECT doc_id, term, tf FROM tf",
    "q_df_cf" ->
      s"$TfCte SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term",
    "q_doclen" ->
      s"$TfCte SELECT doc_id, sum(tf)::BIGINT AS doclen FROM tf GROUP BY doc_id",
    "q_corpus_stats" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id) " +
        "SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl, sum(dl)::BIGINT AS total_terms FROM dl"),
    "q_bm25_topk" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    "q_bm25_boosted" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term) " +
        // boost folds into idf (spark^2, window^0.5) — same rule as the
        // engine (QueryParser boost Scaladoc); CASE cast ::DOUBLE so the
        // DECIMAL literals don't demote the product
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * " +
        "(CASE tf.term WHEN 'spark' THEN 2.0 WHEN 'window' THEN 0.5 ELSE 1.0 END)::DOUBLE * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    "q_bm25_qf" ->
      // edismax qf twin (Ops.bm25QfTopK): two fields = text + source,
      // field-local dl/avgdl/df, global-N idf, weight in the idf position,
      // SUM across fields (tie=1)
      (s"$TfCte, atf AS (" +
        "SELECT 'text' AS fld, doc_id, term, tf FROM tf " +
        "UNION ALL SELECT 'src', doc_id, lower(source), 1::BIGINT FROM documents), " +
        "dl AS (SELECT fld, doc_id, sum(tf)::BIGINT AS dl FROM atf GROUP BY fld, doc_id), " +
        "ad AS (SELECT fld, avg(dl) AS avgdl FROM dl GROUP BY fld), " +
        "nn AS (SELECT count(*)::BIGINT AS n FROM documents), " +
        "dfr AS (SELECT fld, term, count(*)::BIGINT AS df FROM atf " +
        "WHERE term IN ('spark','src3') GROUP BY fld, term) " +
        "SELECT atf.doc_id, round(sum(" +
        "ln(1 + (nn.n - dfr.df + 0.5)/(dfr.df + 0.5)) * " +
        "(CASE atf.fld WHEN 'src' THEN 3.0 ELSE 1.0 END)::DOUBLE * atf.tf / " +
        "(atf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/ad.avgdl))),4) AS score " +
        "FROM atf JOIN dfr ON atf.fld=dfr.fld AND atf.term=dfr.term " +
        "JOIN dl ON atf.fld=dl.fld AND atf.doc_id=dl.doc_id " +
        "JOIN ad ON atf.fld=ad.fld CROSS JOIN nn " +
        "GROUP BY atf.doc_id ORDER BY score DESC, atf.doc_id LIMIT 10"),
    "q_fq_topk" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') " +
        // Solr fq: constrains the doc set, contributes no score
        "AND tf.doc_id IN (SELECT DISTINCT doc_id FROM tf WHERE term = 'data') " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    "q_qop_and" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') " +
        // q.op=AND: every query term required; scoring unchanged
        "AND tf.doc_id IN (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark') " +
        "AND tf.doc_id IN (SELECT DISTINCT doc_id FROM tf WHERE term = 'window') " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    "q_facet_query" ->
      (s"$TfCte, base AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ('spark','window')), " +
        "subs AS (SELECT * FROM (VALUES ('data'),('year'),('zzznosuchterm')) v(fquery)), " +
        "counts AS (SELECT t.term AS fquery, count(DISTINCT t.doc_id)::BIGINT AS cnt " +
        "FROM tf t JOIN base b USING(doc_id) " +
        "WHERE t.term IN ('data','year','zzznosuchterm') GROUP BY t.term) " +
        "SELECT s.fquery, coalesce(c.cnt, 0)::BIGINT AS cnt " +
        "FROM subs s LEFT JOIN counts c USING(fquery) ORDER BY s.fquery"),
    "q_fuzzy_topk" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), " +
        // `spark~2`: DuckDB's damerau_levenshtein is the same full
        // (Lowrance-Wagner) metric as graft.query.Fuzzy — probed
        // bit-compatible on 20k random pairs; sort-and-cap mirrors
        // QueryResolve.MaxPrefixExpansion
        "vocab AS (SELECT DISTINCT term FROM tf " +
        "WHERE damerau_levenshtein(term, 'spark') <= 2 ORDER BY term LIMIT 512) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN (SELECT term FROM vocab) " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    "q_wildcard_topk" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), " +
        // `s?a*`: DuckDB GLOB == graft.query.Glob (WildcardSpec pins both
        // to the same semantics); sort-and-cap mirrors MaxPrefixExpansion
        "vocab AS (SELECT DISTINCT term FROM tf " +
        "WHERE term GLOB 's?a*' ORDER BY term LIMIT 512) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN (SELECT term FROM vocab) " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    // Solr sort=: term match ordered by a stored column, not score
    "q_sorted_match" ->
      (s"$TfCte SELECT d.doc_id, d.n_chars FROM documents d " +
        "WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'spark') " +
        "ORDER BY d.n_chars DESC, d.doc_id LIMIT 20"),
    // Solr /export: the FULL sorted match set, no limit (bulk egress shape)
    "q_export_sorted" ->
      (s"$TfCte SELECT d.doc_id, d.source, d.n_chars FROM documents d " +
        "WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'data') " +
        "ORDER BY d.source, d.doc_id"),
    // Solr facet.prefix + facet.sort=index: prefix-restricted values in
    // lexical order (the limit cuts in THAT order)
    "q_facet_prefix" ->
      (s"$TfCte SELECT d.lang, count(*)::BIGINT AS cnt FROM documents d " +
        "WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'data') " +
        "AND d.lang LIKE 'e%' GROUP BY d.lang ORDER BY d.lang LIMIT 10"),
    // Solr stats percentiles: exact interpolated points over the match set
    "q_stats_percentiles" ->
      (s"$TfCte SELECT round(quantile_cont(d.n_chars, 0.5), 4) AS p50, " +
        "round(quantile_cont(d.n_chars, 0.9), 4) AS p90, " +
        "round(quantile_cont(d.n_chars, 0.99), 4) AS p99 FROM documents d " +
        "WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'data')"),
    // Solr group.ngroups: distinct group values of the match set
    "q_ngroups" ->
      (s"$TfCte SELECT count(DISTINCT d.source)::BIGINT AS ngroups " +
        "FROM documents d " +
        "WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'data')"),
    "q_term_range" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), " +
        // `text:{spark TO sz]`: exclusive-lo/inclusive-hi lexicographic
        // range, plain string compares on both sides; sort-and-cap mirrors
        // QueryResolve.MaxPrefixExpansion
        "vocab AS (SELECT DISTINCT term FROM tf " +
        "WHERE term > 'spark' AND term <= 'sz' ORDER BY term LIMIT 512) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN (SELECT term FROM vocab) " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    // Solr MoreLikeThis: interesting terms of doc 7 (tf·idf ≥ ranked,
    // mintf/mindf = 2, top 10, term-asc tiebreak on the 4-decimal-rounded
    // selection score — the rounding keeps JVM-vs-libm ln() ulp divergence
    // from flipping near-tied selections), then BM25 over the selected
    // terms with the source doc excluded
    "q_mlt" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "src AS (SELECT term, tf AS src_tf FROM tf WHERE doc_id = 7 AND tf >= 2), " +
        "dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf " +
        "WHERE term IN (SELECT term FROM src) GROUP BY term), " +
        // qt carries df along — the scoring join reuses it instead of a
        // second corpus-scale df aggregation (mirrors Ops.moreLikeThis)
        "qt AS (SELECT src.term, dfs.df FROM src JOIN dfs USING(term) CROSS JOIN stats s " +
        "WHERE dfs.df >= 2 " +
        "ORDER BY round(ln(1 + (s.n - dfs.df + 0.5)/(dfs.df + 0.5)) * src.src_tf, 4) DESC, " +
        "src.term LIMIT 10) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - qt.df + 0.5)/(qt.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN qt USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.doc_id <> 7 " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    // Solr facet.pivot=lang,source: top-5 langs by total count, top-3
    // sources within each (count-desc, value-asc at both levels)
    "q_facet_pivot" ->
      ("WITH ab AS (SELECT lang, source, count(*)::BIGINT AS cnt " +
        "FROM documents GROUP BY 1, 2), " +
        "a AS (SELECT lang, sum(cnt)::BIGINT AS lang_cnt FROM ab GROUP BY 1 " +
        "ORDER BY lang_cnt DESC, lang LIMIT 5) " +
        "SELECT lang, lang_cnt, source, cnt, rn::INT AS rn FROM (" +
        "SELECT ab.lang, a.lang_cnt, ab.source, ab.cnt, " +
        "row_number() OVER (PARTITION BY ab.lang ORDER BY ab.cnt DESC, ab.source) AS rn " +
        "FROM ab JOIN a USING(lang)) WHERE rn <= 3"),
    // Solr hl: BM25 top-10 with a ±5-token snippet around the first
    // query-term occurrence in the ANALYZED token stream, matches wrapped
    // in <em> — list_position is NULL when absent (Spark array_position:
    // 0), hence the coalesce
    "q_highlight" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), " +
        "topk AS (SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10), " +
        s"tokl AS (SELECT doc_id, list_filter($Tok, x -> x <> '') AS t FROM documents), " +
        "anch AS (SELECT doc_id, t, CASE WHEN p1 > 0 AND p2 > 0 THEN least(p1, p2) " +
        "ELSE greatest(p1, p2) END AS p FROM (SELECT doc_id, t, " +
        "coalesce(list_position(t, 'spark'), 0) AS p1, " +
        "coalesce(list_position(t, 'window'), 0) AS p2 FROM tokl)) " +
        "SELECT k.doc_id, k.score, array_to_string(list_transform(" +
        "list_slice(a.t, greatest(1, a.p - 5), a.p + 5), " +
        "x -> CASE WHEN x IN ('spark','window') THEN '<em>' || x || '</em>' ELSE x END), ' ') AS snippet " +
        "FROM topk k JOIN anch a USING(doc_id)"),
    // hl.snippets: up to 2 fragments per doc, one per present query term,
    // anchored at that term's first occurrence, in anchor order
    "q_highlight_multi" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), " +
        "topk AS (SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10), " +
        s"tokl AS (SELECT doc_id, list_filter($Tok, x -> x <> '') AS t FROM documents), " +
        "anch AS (SELECT doc_id, t, unnest(list_slice(list_sort(list_filter(" +
        "[coalesce(list_position(t, 'spark'), 0), " +
        "coalesce(list_position(t, 'window'), 0)], x -> x > 0)), 1, 2))::BIGINT AS p " +
        "FROM tokl) " +
        "SELECT k.doc_id, k.score, a.p, array_to_string(list_transform(" +
        "list_slice(a.t, greatest(1, a.p - 5), a.p + 5), " +
        "x -> CASE WHEN x IN ('spark','window') THEN '<em>' || x || '</em>' ELSE x END), ' ') AS snippet " +
        "FROM topk k JOIN anch a USING(doc_id) ORDER BY k.score DESC, k.doc_id, a.p"),
    "q_topk_orders" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"),
    "q_id_sanitize" ->
      "SELECT DISTINCT source, translate(source, ':/.', '---') AS id FROM documents",
    "q_required_check" ->
      ("SELECT event_id, coalesce(props, 'Unknown') AS props_checked, " +
        "(props IS NOT NULL) AS had_value FROM events"),
    "q_envelope_agg" ->
      ("SELECT l_returnflag, min(l_quantity) AS w, max(l_quantity) AS e, " +
        "min(l_extendedprice) AS s, max(l_extendedprice) AS n " +
        "FROM lineitem GROUP BY l_returnflag"),
    "q_validate_range" ->
      ("SELECT CASE WHEN l_discount < 0 OR l_discount > 0.08 OR l_tax < 0 " +
        "OR l_tax > 0.06 THEN 'Inactive' ELSE 'Active' END AS status, " +
        "count(*)::BIGINT AS cnt FROM lineitem GROUP BY 1"),
    "q_parent_semi" ->
      ("SELECT o_orderkey FROM orders WHERE EXISTS " +
        "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)"),
    "q_parent_flag" ->
      ("SELECT o_orderkey, (k.l_orderkey IS NOT NULL) AS is_parent FROM orders " +
        "LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) k " +
        "ON o_orderkey = k.l_orderkey"),
    "q_tombstone_anti" ->
      ("SELECT l_orderkey, l_linenumber FROM lineitem WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')"),
    "q_daterange_overlap" ->
      ("SELECT o_orderkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-03-01' " +
        "AND o_orderdate + INTERVAL 30 DAY >= TIMESTAMP '1995-01-01'"),
    "q_window_rank" ->
      ("SELECT doc_id, n_chars, rn::INT AS rn FROM (SELECT doc_id, n_chars, " +
        "row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn " +
        "FROM documents) WHERE rn <= 50"),
    "q_lastupdate_max" ->
      "SELECT user_id, max(ts) AS max_ts FROM events GROUP BY user_id",
    "q_field_extract" ->
      // nullif: DuckDB's no-match result is '' and ''::INT ERRORS where
      // Spark's cast yields null — digitless props must agree as null
      ("SELECT event_id, nullif(regexp_extract(props, '([0-9]+)', 1), '')::INT " +
        "AS k FROM events"),
    "q_date_format" ->
      ("SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso " +
        "FROM orders"),
    "q_source_lookup" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id = 123",
    "q_source_manifest" ->
      ("SELECT doc_id, source FROM documents " +
        "WHERE doc_id IN (1, 5, 99, 250, 499, 9999)"),
    "q_lang_select" ->
      ("SELECT source, min(doc_id) AS first_en_doc FROM documents " +
        "WHERE lang = 'en' GROUP BY source"),
    "q_facet_count" ->
      ("SELECT lang, source, count(*)::BIGINT AS cnt FROM documents " +
        "GROUP BY lang, source"),
    "q_temporal_sanity" ->
      ("SELECT (o_orderdate >= TIMESTAMP '1992-01-01' AND " +
        "o_orderdate < TIMESTAMP '1999-01-01') AS valid, " +
        "count(*)::BIGINT AS cnt FROM orders GROUP BY 1"),
    "q_dedup_exact" ->
      ("SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*)::BIGINT AS n " +
        "FROM documents GROUP BY 1"),
    "q_fingerprint" ->
      ("SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents"),
    "q_token_count" ->
      ("SELECT doc_id, " +
        "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::INT AS n_ws, " +
        s"len(list_filter($Tok, x -> x <> ''))::INT AS n_tok FROM documents"),
    "q_quality_score" ->
      (s"WITH d AS (SELECT doc_id, text, list_filter($Tok, x -> x <> '') AS t FROM documents) " +
        "SELECT doc_id, len(t)::INT AS words, " +
        "CASE WHEN len(t) = 0 THEN 0.0::DOUBLE ELSE round(len(list_filter(t, " +
        "x -> list_contains(['the','a','of','and','is'], x)))::DOUBLE / len(t), 4) END AS stop_ratio, " +
        "round((length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')))::DOUBLE " +
        "/ length(text), 4) AS punct_ratio FROM d"),
    "q_repetition" ->
      // Gopher-style repetition signals (Ops.repetitionRatio): duplicate-
      // trigram fraction + top-term mass, docs with >= 3 tokens
      (s"WITH d AS (SELECT doc_id, list_filter($Tok, x -> x <> '') AS a FROM documents), " +
        "e AS (SELECT doc_id, a FROM d WHERE len(a) >= 3), " +
        "idx AS (SELECT doc_id, a, unnest(generate_series(1, len(a)-2)) AS i FROM e), " +
        "tri AS (SELECT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS g FROM idx), " +
        "trs AS (SELECT doc_id, round(1 - count(DISTINCT g)::DOUBLE/count(*), 4) AS dup_trigram_frac FROM tri GROUP BY doc_id), " +
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM (SELECT doc_id, unnest(a) AS term FROM e) GROUP BY doc_id, term), " +
        "tops AS (SELECT doc_id, round(max(tf)::DOUBLE/sum(tf), 4) AS top_tf_frac FROM tf GROUP BY doc_id) " +
        "SELECT trs.doc_id, dup_trigram_frac, top_tf_frac FROM trs JOIN tops USING(doc_id)"),
    "q_lang_id" ->
      (s"WITH d AS (SELECT doc_id, list_filter($Tok, x -> x <> '') AS t FROM documents), " +
        "h AS (SELECT doc_id, " +
        "len(list_filter(t, x -> list_contains(['the','a','of','and','is'], x))) AS hits_en, " +
        "len(list_filter(t, x -> list_contains(['der','die','das','und','ist'], x))) AS hits_de, " +
        "len(list_filter(t, x -> list_contains(['el','la','de','y','es'], x))) AS hits_es, " +
        "len(list_filter(t, x -> list_contains(['le','les','de','et','est'], x))) AS hits_fr FROM d) " +
        "SELECT doc_id, CASE " +
        "WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en' " +
        "WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de' " +
        "WHEN hits_es >= hits_fr THEN 'es' ELSE 'fr' END AS predicted FROM h"),
    "q_dedup_ngram" ->
      (s"WITH tok AS (SELECT doc_id, list_filter($Tok, x -> x <> '') AS t FROM documents), " +
        "sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1), " +
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM tok WHERE len(t) >= 3), " +
        // symmetric hot-shingle cap (matches Ops.HotShingleDf = 1000): drop
        // boilerplate shingles from pair generation AND set sizes
        "hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000), " +
        "sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)), " +
        "sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS inter " +
        "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2) " +
        "SELECT id_a, id_b, round(inter::DOUBLE / (sa.n + sb.n - inter), 4) AS jaccard " +
        "FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b " +
        "WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.05"),
    "q_url_filter" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') AND tf.doc_id IN " +
        "(SELECT doc_id FROM documents WHERE source = 'src3') " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    "q_range_filter" ->
      (s"$TfCte, dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id), " +
        "stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl), " +
        "dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term) " +
        "SELECT tf.doc_id, round(sum(ln(1 + (s.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf / " +
        "(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl))),4) AS score " +
        "FROM tf JOIN dfr USING(term) JOIN dl USING(doc_id) CROSS JOIN stats s " +
        "WHERE tf.term IN ('spark','window') AND tf.doc_id IN " +
        "(SELECT doc_id FROM documents WHERE n_chars BETWEEN 100 AND 300) " +
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10"),
    "q_phrase_match" ->
      ("SELECT doc_id FROM documents WHERE regexp_matches(lower(text), " +
        "'(^|[^a-z0-9])data[^a-z0-9]+group([^a-z0-9]|$)')"),
    "q_phrase_slop" ->
      ("SELECT doc_id FROM documents WHERE regexp_matches(lower(text), " +
        "'(^|[^a-z0-9])data([^a-z0-9]+[a-z0-9]+){0,2}[^a-z0-9]+group([^a-z0-9]|$)') " +
        "OR regexp_matches(lower(text), " +
        "'(^|[^a-z0-9])group[^a-z0-9]+data([^a-z0-9]|$)')"),
    "q_event_window" ->
      ("SELECT date_trunc('hour', ts) AS ws, event_type, " +
        "count(*)::BIGINT AS cnt, round(sum(value), 4) AS sum_value " +
        "FROM events GROUP BY 1, 2"),
    "q_embed_cosine" ->
      ("SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], " +
        "q.embedding::DOUBLE[]), 4) AS c FROM embeddings e, " +
        "(SELECT embedding FROM embeddings WHERE vec_id = 0) q " +
        "ORDER BY c DESC, e.vec_id LIMIT 10"),
    "q_emb_quantize" ->
      // int8 absmax quantization (Ops.embQuantize): the rounding rule is an
      // explicit floor(x/scale + 0.5) on both sides (round() tie behavior
      // differs between engines); zero vectors quantize to all-zero
      ("WITH m AS (SELECT vec_id, len(embedding)::INT AS n_dims, " +
        "list_transform(embedding, v -> v::DOUBLE) AS x, " +
        "list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS amax " +
        "FROM embeddings), " +
        "s AS (SELECT vec_id, n_dims, x, amax, amax / 127.0::DOUBLE AS scale FROM m) " +
        "SELECT vec_id, n_dims, scale, " +
        "CASE WHEN amax = 0 THEN 0 ELSE list_sum(list_transform(x, " +
        "v -> floor(v/scale + 0.5)))::BIGINT END AS q_sum, " +
        "CASE WHEN amax = 0 THEN 0 ELSE list_sum(list_transform(x, " +
        "v -> abs(floor(v/scale + 0.5))))::BIGINT END AS q_l1, " +
        "CASE WHEN amax = 0 THEN 0.0 ELSE list_max(list_transform(x, " +
        "v -> abs(v - floor(v/scale + 0.5)*scale))) END AS max_err FROM s"),
    "q_media_meta" ->
      ("SELECT doc_id, strlen(text)::INT AS n_bytes, " +
        "hex(encode(substr(text, 1, 8))) AS header_hex FROM documents"),
    // MMD pivot analogs (r5). Empty role slots: count FILTER = 0 matches
    // Spark's count(when), and coalesce('') matches array_join of an empty
    // array; id lists are ORDER BY id numeric before stringify on BOTH sides.
    "q_personnel_pivot" ->
      ("SELECT user_id, " +
        Seq("click" -> "investigator", "view" -> "technical_contact",
          "purchase" -> "metadata_author", "signup" -> "datacenter_contact")
          .map { case (typ, role) =>
            s"count(*) FILTER (WHERE event_type = '$typ')::BIGINT AS personnel_${role}_n, " +
              s"coalesce(string_agg(event_id::VARCHAR, ',' ORDER BY event_id) " +
              s"FILTER (WHERE event_type = '$typ'), '') AS personnel_${role}_ids"
          }.mkString(", ") +
        " FROM events GROUP BY user_id"),
    "q_access_pivot" ->
      ("SELECT user_id, lower(regexp_replace(event_type, '[ -]', '_', 'g')) AS access_type, " +
        "string_agg(event_id::VARCHAR, ',' ORDER BY event_id) AS access_ids, " +
        "arg_min(props, event_id) AS first_props " +
        "FROM events GROUP BY 1, 2"),
    "q_parent_ref" ->
      ("SELECT o_orderkey, translate('order:' || o_orderkey, ':/.', '---') AS parent_id " +
        "FROM orders WHERE o_orderstatus = 'P'"),
    "q_related_url_lut" ->
      ("SELECT event_id, CASE event_type WHEN 'click' THEN 'documentation' " +
        "WHEN 'view' THEN 'landing_page' WHEN 'purchase' THEN 'order_data' " +
        "WHEN 'signup' THEN 'registration' END AS related_url_slot, " +
        "coalesce(props, 'Not Available') AS description FROM events " +
        "WHERE event_type IN ('click','view','purchase','signup')"),
    "q_keywords_double" ->
      (s"WITH toks AS (SELECT doc_id, list_sort(list_distinct(list_filter(" +
        s"$Tok, x -> x <> ''))) AS kw FROM documents) " +
        // array_to_string of an empty filtered list is NULL in DuckDB 1.0
        // where Spark's array_join gives '' — coalesce to match
        "SELECT doc_id, coalesce(array_to_string(kw, ','), '') AS keywords_keyword, " +
        "coalesce(array_to_string(list_filter(kw, x -> x IN " +
        "('spark','window','data','group','the','of')), ','), '') AS keywords_gcmd, " +
        "'' AS keywords_wigos FROM toks"),
  )

  /** Ceiling on fixture pairs a dynamic oracle embeds as a VALUES list.
    * Sized for sf0.1, not just the sf0.01 driver gate: measured there,
    * embNearDupCandidates ≈ 36k pairs and minhashBanded = 4 bands × ~5k
    * docs ≈ 20k rows (the old 20000 cap silently dropped those oracles at
    * any scale past the gate). 150k rows ≈ 2–3 MB of SQL — well inside
    * what DuckDB parses; the cap now only guards true degeneracy.
    */
  private val MaxFixturePairs = 150000

  private def guarded(n: Int): Option[Unit] =
    // a None silently downgrades the query to rows-only in the driver gate —
    // make the drop LOUD so "all queries oracled" can't regress unnoticed
    if (n == 0) { System.err.println(
      "[graft-oracle] fixture empty — dynamic oracle dropped"); None }
    else if (n > MaxFixturePairs) { System.err.println(
      s"[graft-oracle] fixture $n rows > cap $MaxFixturePairs — " +
        "dynamic oracle dropped"); None }
    else Some(())

  private def pairsOf(df: DataFrame): Option[String] = {
    val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    guarded(pairs.length).map(_ =>
      pairs.map { case (a, b) => s"($a,$b)" }.mkString(","))
  }

  /** VALUES list from each row's columns rendered by `render` — same
    * size/emptiness guard as [[pairsOf]].
    */
  private def valuesOf(df: DataFrame)(
      render: org.apache.spark.sql.Row => String): Option[String] = {
    val rows = df.collect().map(render).sorted
    guarded(rows.length).map(_ => rows.mkString(","))
  }

  /** Oracles whose SQL depends on the data (r5 — VERDICT r4 #3): some
    * stages hash with functions DuckDB doesn't have (wrapping 64-bit
    * mixing, iterative k-means), but everything downstream of the hash is
    * exact math over a small intermediate. Verify computes that
    * intermediate (deterministic — the same code path the query entry
    * runs), embeds it as a VALUES fixture, and the oracle recomputes the
    * downstream logic in plain SQL:
    *  - q_dedup_lsh_verified / q_emb_neardup: candidate PAIRS fixture →
    *    exact Jaccard / cosine + threshold (fully independent verify).
    *  - q_minhash_lsh: (doc_id, band, h) signature fixture → bucket cap +
    *    band equi-join + pair distinct.
    *  - q_simhash: corpus (token, hash) vocabulary fixture → tokenize +
    *    tf-weighted bit voting + signature packing.
    *  - q_ann_ivf: probed candidate-id fixture → exact cosine top-k.
    * The fixture values themselves are Spark-computed, so the hash/cluster
    * math is attested by OpsSpec's planted-dup recall tests, not by DuckDB;
    * what the oracle buys is an independent check of every join, cap,
    * aggregation, ordering, and bit-packing step built on top of them.
    */
  def oracleSqlDynamic: Map[String, (SparkSession, String) => Option[String]] =
    Map(
      "q_dedup_lsh_verified" -> ((spark, dir) =>
        pairsOf(Ops.minhashLsh(spark, dir)).map { values =>
          // shingle CTE mirrors Ops.shingles exactly (tokens ≥ 3, DISTINCT
          // per-doc word triples, no hot cap — dedupLshVerified uses the
          // uncapped sets); threshold 0.5 matches dedupLshVerified
          "WITH cand(id_a, id_b) AS (VALUES " + values + "), " +
            "tok AS (SELECT doc_id, list_filter(" + Tok +
            ", x -> x <> '') AS t FROM documents), " +
            "sh AS (SELECT DISTINCT doc_id, unnest(list_transform(" +
            "range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]" +
            ")) AS s FROM tok WHERE len(t) >= 3), " +
            "sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id), " +
            "i AS (SELECT c.id_a, c.id_b, count(*)::BIGINT AS inter FROM cand c " +
            "JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b " +
            "AND b.s = a.s GROUP BY 1, 2) " +
            "SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, " +
            "round(inter::DOUBLE / (sa.n + sb.n - inter), 4) AS jaccard " +
            "FROM i JOIN sz sa ON sa.doc_id = id_a " +
            "JOIN sz sb ON sb.doc_id = id_b " +
            "WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5"
        }),
      "q_emb_neardup" -> ((spark, dir) =>
        pairsOf(Ops.embNearDupCandidates(spark, dir)).map { values =>
          // threshold 0.2 matches the driver entry in `queries` (isotropic
          // noise embeddings have no 0.9-cosine near-dups to exercise)
          "WITH cand(id_a, id_b) AS (VALUES " + values + ") " +
            "SELECT c.id_a::BIGINT AS id_a, c.id_b::BIGINT AS id_b, " +
            "round(list_cosine_similarity(a.embedding::DOUBLE[], " +
            "b.embedding::DOUBLE[]), 4) AS cos FROM cand c " +
            "JOIN embeddings a ON a.vec_id = c.id_a " +
            "JOIN embeddings b ON b.vec_id = c.id_b " +
            "WHERE list_cosine_similarity(a.embedding::DOUBLE[], " +
            "b.embedding::DOUBLE[]) >= 0.2"
        }),
      "q_minhash_lsh" -> ((spark, dir) =>
        valuesOf(Ops.minhashBanded(spark, dir)) { r =>
          s"(${r.getLong(0)},${r.getInt(1)},${r.getLong(2)})"
        }.map { values =>
          // mirrors minhashLsh downstream of the signatures: drop rows in
          // over-cap buckets, then pairs = same-bucket collisions, distinct
          "WITH banded(doc_id, band, h) AS (VALUES " + values + "), " +
            "ok AS (SELECT band, h FROM banded GROUP BY band, h " +
            s"HAVING count(*) <= ${Ops.LshBucketCap}), " +
            "c AS (SELECT banded.doc_id, banded.band, banded.h " +
            "FROM banded JOIN ok USING (band, h)) " +
            "SELECT DISTINCT x.doc_id::BIGINT AS id_a, " +
            "y.doc_id::BIGINT AS id_b FROM c x JOIN c y " +
            "ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id"
        }),
      "q_simhash" -> ((spark, dir) =>
        valuesOf(Ops.simhashTokenHashes(spark, dir)) { r =>
          // tokens are Analysis.tokenize output: [a-z0-9]+ only, so the
          // literal needs no escaping
          s"('${r.getString(0)}',${r.getLong(1)})"
        }.map { values =>
          // tf-weighted voting: every token OCCURRENCE votes ±1 per bit;
          // bit 63 is assembled via two's complement (1<<63 overflows
          // BIGINT); a doc with no tokens has signature 0 (LEFT JOIN)
          "WITH th(tok, h) AS (VALUES " + values + "), " +
            s"tk AS (SELECT doc_id, unnest($Tok) AS t FROM documents), " +
            "hv AS (SELECT tk.doc_id, th.h FROM tk " +
            "JOIN th ON th.tok = tk.t WHERE tk.t <> ''), " +
            "bits AS (SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 " +
            "THEN 1 ELSE -1 END) AS v FROM hv CROSS JOIN " +
            "(SELECT unnest(range(0, 64)) AS b) bs GROUP BY doc_id, b), " +
            "sig AS (SELECT doc_id, (sum(CASE WHEN v > 0 AND b < 63 " +
            "THEN (1::BIGINT << b) ELSE 0 END) + min(CASE WHEN v > 0 " +
            "AND b = 63 THEN (-9223372036854775807 - 1) ELSE 0 END)" +
            ")::BIGINT AS simhash FROM bits GROUP BY doc_id) " +
            "SELECT d.doc_id::BIGINT AS doc_id, " +
            "coalesce(s.simhash, 0)::BIGINT AS simhash FROM documents d " +
            "LEFT JOIN sig s ON s.doc_id = d.doc_id"
        }),
      "q_ann_ivf" -> ((spark, dir) =>
        valuesOf(Ops.annIvfCandidates(spark, dir).select("vec_id")) { r =>
          s"(${r.getLong(0)})"
        }.map { values =>
          // same scoring SQL as q_embed_cosine, restricted to the probe
          // set and centered on the IVF query vector (vec_id = 42)
          "WITH cand(vec_id) AS (VALUES " + values + ") " +
            "SELECT e.vec_id::BIGINT AS vec_id, " +
            "round(list_cosine_similarity(e.embedding::DOUBLE[], " +
            "q.embedding::DOUBLE[]), 4) AS c FROM cand " +
            "JOIN embeddings e USING (vec_id), " +
            "(SELECT embedding FROM embeddings WHERE vec_id = 42) q " +
            "ORDER BY c DESC, e.vec_id LIMIT 10"
        }),
    )
}
