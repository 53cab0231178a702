package graft

import graft.functions.{BinaryDecoders, JsonSchemaRender, StatusRange}
import graft.ops.{CdcQueries, CurateOps, GraphOps, MixOps, MultimodalOps, PackOps, PageOps, TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — SURVEY.md §2 operator inventory as runnable queries.
  * Every SQL-expressible operator has a DuckDB oracle in [[oracleSql]] with
  * IDENTICAL column names and ordering; pipeline-shaped / hash-based ops are
  * rows-only checked here and oracle-checked in the ScalaTest suites.
  */
object SparkEntry {

  /** Flagship: full CDC replay (feed → streaming → icelite MERGE) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.upsertFromEvents(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- CDC / streaming core (SURVEY §2.1 S3-S9, §2.5, §2.9) ----
    "cdc_upsert_lww" -> ((s, d) => CdcQueries.upsertFromEvents(s, d)),
    "cdc_bucket_prune" -> ((s, d) => CdcQueries.bucketPrunedSlice(s, d)),
    "schema_evolution_read" -> ((s, d) => CdcQueries.evolvedUpsert(s, d)),
    "cdc_lww_window" -> ((s, d) => CdcQueries.lwwLatestPerKey(s, d)),
    "cdc_route_counts" -> ((s, d) => CdcQueries.routeCounts(s, d)),
    "cdc_dead_letter" -> ((s, d) => CdcQueries.deadLetterSummary(s, d)),
    "cdc_replay_audit" -> ((s, d) => CdcQueries.replayAudit(s, d)),
    "cdc_skew_hotkey" -> ((s, d) => CdcQueries.skewedUpsert(s, d)),
    "cdc_changes_since" -> ((s, d) => CdcQueries.changesSinceUpsert(s, d)),
    // The table consumed as a Structured Streaming SOURCE (format("icelite"),
    // snapshot-version offsets owned by the consumer's checkpoint): run 1
    // drains phase 1, run 2 resumes the checkpoint and gets ONLY phase 2.
    "cdc_stream_consume" -> ((s, d) => CdcQueries.streamConsume(s, d)),
    // CDC fan-out: a filtered materialized view maintained as a SECOND
    // icelite table by a checkpointed stream over the base table, each
    // micro-batch MERGEd exactly-once (materialized-view D/U rule for a
    // non-LWW-commuting payload predicate).
    "cdc_derived_view" -> ((s, d) => CdcQueries.derivedView(s, d)),
    // Two independent writers racing commits on one table (occRetry OCC +
    // attempt-unique data dirs + orphan vacuum); oracle is the plain LWW.
    "cdc_concurrent_writers" -> ((s, d) => CdcQueries.concurrentWriters(s, d)),
    "cdc_time_travel" -> ((s, d) => CdcQueries.timeTravelRead(s, d)),
    "cdc_rollback_replay" -> ((s, d) => CdcQueries.rollbackReplay(s, d)),
    "cdc_patch_upsert" -> ((s, d) => CdcQueries.patchUpsert(s, d)),
    "cdc_patch_changes" -> ((s, d) => CdcQueries.patchChanges(s, d)),
    "cdc_bootstrap_handoff" -> ((s, d) => CdcQueries.bootstrapHandoff(s, d)),
    "cdc_version_diff" -> ((s, d) => CdcQueries.versionDiff(s, d)),
    "cdc_wap_publish" -> ((s, d) => CdcQueries.wapPublish(s, d)),
    "transcript_render" -> ((s, d) => CdcQueries.transcriptRender(s, d)),
    "cdc_wap_abort" -> ((s, d) => CdcQueries.wapAbort(s, d)),
    "sessionize" -> ((s, d) => graft.streaming.Sessionize.sessions(s, d)),
    "sessionize_changes" -> ((s, d) => CdcQueries.sessionizeChanges(s, d)),
    "schema_infer_props" -> ((s, d) => CdcQueries.inferPropsSchema(s, d)),

    // ---- aggregations (§2.4 A1-A6) ----
    "agg_count_by_type" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),
    "agg_sum_value" -> ((s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(round(sum("value"), 4).as("total"), count(lit(1)).as("n"))
        .orderBy("user_id")),
    "agg_page_concat" -> ((s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(concat_ws("\n",
          transform(array_sort(collect_list(struct(col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("pages"))
        .orderBy("user_id")),
    "distinct_types" -> ((s, d) =>
      t(s, d, "events").select("event_type").distinct().orderBy("event_type")),

    // ---- filters / predicates / routing (§2.2 P1-P9) ----
    "filter_status_range" -> ((s, d) =>
      t(s, d, "events")
        .filter(StatusRange.predicate(col("value"), "200-299,304"))
        .select("event_id", "event_type", "value").orderBy("event_id")),
    "project_prune" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),
    "json_extract_k" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy("event_id")),
    "coalesce_override" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.missing"), col("event_type")).as("resolved"))
        .orderBy("event_id")),
    "format_detect" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        col("text").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}").as("has_email"),
        col("text").rlike("\\d{4}-\\d{2}-\\d{2}").as("has_date"),
        col("text").rlike("(https?|ftp)://").as("has_uri"))
        .orderBy("doc_id")),

    // ---- windows / sorts / limits (§2.5, §2.6) ----
    "window_topk_per_user" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      t(s, d, "events").withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("user_id", "event_id", "value")
        .orderBy("user_id", "event_id")
    }),
    "sort_limit_topk" -> ((s, d) =>
      t(s, d, "events").orderBy(col("value").desc, col("event_id")).limit(10)
        .select("event_id", "value")),
    "window_tumbling" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
        .select(col("window.start").as("w_start"), col("n"), col("total"))
        .orderBy("w_start")),

    // ---- set ops (§2.7) ----
    "set_union_pages" -> ((s, d) => {
      val e = t(s, d, "events")
      e.filter(col("event_type") === "click").select(col("event_id"), lit("p1").as("page"))
        .unionByName(
          e.filter(col("value") > 150.0).select(col("event_id"), lit("p2").as("page")))
        .orderBy("page", "event_id")
    }),

    // ---- scalar functions (§2.8 F1-F18) ----
    "split_mx" -> ((s, d) => {
      val sp = split(concat(col("user_id").cast("string"), lit(" "), col("event_type")), " ")
      t(s, d, "events")
        .select(col("event_id"),
          element_at(sp, 1).cast("int").as("prio"), element_at(sp, 2).as("host"))
        .orderBy("event_id")
    }),
    "base64_auth" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          base64(concat(col("event_type"), lit(":"), col("user_id").cast("string"))
            .cast("binary")).as("auth"))
        .orderBy("event_id")),
    "txt_join_frag" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 5), "").as("frag"))
        .orderBy("doc_id")),
    "decode_guid_sid" -> ((s, d) => {
      val e = t(s, d, "events").filter(col("event_id") < 100)
      val guidBytes = unhex(md5(col("event_type")))
      val sidBytes = concat(
        lit(Array[Byte](1, 2, 0, 0, 0, 0, 0, 5)),
        unhex(substring(md5(concat(col("event_id").cast("string"))), 1, 16)))
      e.select(col("event_id"),
        BinaryDecoders.guid_decode(guidBytes).as("guid"),
        BinaryDecoders.sid_decode(sidBytes).as("sid"))
        .orderBy("event_id")
    }),

    // ---- reference-parity scalar pack: F7 sd_summary, F9 hex/unhex,
    // P6 header map_filter, P8 empty-result routing, F19 masking ----
    "scalar_parity_pack" -> ((s, d) => {
      val e = t(s, d, "events").filter(col("event_id") < 500)
      // 32 deterministic bytes (two md5s) → exercises the ≥20-byte offset path
      val sdBytes = concat(unhex(md5(col("event_type"))),
        unhex(md5(col("user_id").cast("string"))))
      val headers = map(
        lit("accept"), col("event_type"),
        lit("authorization"), concat(lit("Bearer "), md5(col("event_id").cast("string"))),
        lit("content-type"), lit("application/json"),
        lit("x-request-id"), col("event_id").cast("string"))
      // P6: drop proxied/sensitive headers (x-* and authorization),
      // reference precedent InsecureInvokeHTTP.java:656-658
      val kept = map_filter(headers, (k, _) => !k.startsWith("x-") && k =!= "authorization")
      val p8src = when(col("event_id") % 3 === 0, col("event_type"))
        .otherwise(concat(col("event_type"), lit("-"), col("event_id").cast("string")))
      val cred = concat(lit("user:"), col("user_id").cast("string"),
        lit(":pw="), md5(col("event_id").cast("string")))
      e.select(col("event_id"),
        BinaryDecoders.sd_summary(sdBytes).as("sd"),
        hex(encode(col("event_type"), "UTF-8")).as("hex_type"),
        decode(unhex(hex(encode(col("event_type"), "UTF-8"))), "UTF-8").as("unhexed"),
        array_join(array_sort(transform(map_entries(kept),
          kv => concat(kv.getField("key"), lit("="), kv.getField("value")))), ";")
          .as("headers_kept"),
        // P8: route rows whose extraction came back empty
        // (DNSClientProcessor.java:256-261 empty-answer precedent)
        when(size(regexp_extract_all(p8src, lit("\\d+"), lit(0))) === 0, "empty")
          .otherwise("ok").as("p8_status"),
        // F19: mask the credential-shaped tail (InsecureInvokeHTTP.java:803-810)
        regexp_replace(cred, lit("pw=.*"), lit("pw=********")).as("masked"))
        .orderBy("event_id")
    }),

    // ---- F20 control-spec parse: "OID|criticality|BER-base64" with both
    // optional (InsecureLDAPProcessor.java:299-378; BER decode :343-349);
    // criticality parsed Boolean.parseBoolean-style (non-"true" → false) ----
    "control_spec_parse" -> ((s, d) => {
      val e = t(s, d, "events").filter(col("event_id") < 1000)
      val ber = base64(unhex(substring(md5(col("event_id").cast("string")), 1, 12)))
      val spec = when(col("event_id") % 3 === 0,
        concat(lit("1.2.840."), col("event_id") % 5, lit("|true|"), ber))
        .when(col("event_id") % 3 === 1,
          concat(lit("2.16.840."), col("event_id") % 7, lit("|false")))
        .otherwise(concat(lit("1.3.6."), col("event_id") % 11))
      val parts = split(spec, "\\|")
      e.select(col("event_id"), spec.as("spec"),
        element_at(parts, 1).as("oid"),
        when(size(parts) >= 2, lower(element_at(parts, 2)) === "true")
          .otherwise(lit(false)).as("critical"),
        when(size(parts) >= 3, hex(unbase64(element_at(parts, 3))))
          .otherwise(lit(null).cast("string")).as("ber_hex"))
        .orderBy("event_id")
    }),

    // ---- joins (§2.3 J1-J3) ----
    "join_dim_broadcast" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n"))
        .orderBy("r_name")),
    "join_anti_orders" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),

    // ---- classic pricing summary (exact integer-cents arithmetic) ----
    "q1_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("bigint")).as("sum_base_cents"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- training-data ops: dedup / text analysis ----
    "dedup_exact" -> ((s, d) => TextOps.dedupExact(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => TextOps.dedupMinhashLsh(s, d)),
    "dedup_incremental" -> ((s, d) => CdcQueries.incrementalDedup(s, d)),
    "dedup_cluster" -> ((s, d) => GraphOps.dedupCluster(s, d)),
    "dedup_cluster_inc" -> ((s, d) => CdcQueries.incrementalDedupCluster(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => TextOps.dedupNgramJaccard(s, d)),
    "dedup_substring" -> ((s, d) => TextOps.dedupSubstring(s, d)),
    "lm_surprisal" -> ((s, d) => TextOps.lmSurprisal(s, d)),
    // §2.10 Aggregator tier: Count-Min token-frequency sketch (typed
    // Aggregator, fixed mergeable buffer — no vocab-key shuffle).
    "sketch_token_cms" -> ((s, d) => TextOps.sketchTokenCms(s, d)),
    "dedup_simhash" -> ((s, d) => TextOps.dedupSimhash(s, d)),
    // Corpus-scale simhash config: 16-bit blocks + 1-bit multi-index
    // probes. SAME oracle as dedup_simhash — the driver proves the scaled
    // banding loses zero radius-7 recall.
    "dedup_simhash_mip" -> ((s, d) => TextOps.dedupSimhash(s, d, blockBits = 16)),
    "text_quality" -> ((s, d) => TextOps.qualityScore(s, d)),
    "doc_fingerprint" -> ((s, d) => TextOps.docFingerprint(s, d)),
    "token_counts" -> ((s, d) => TextOps.tokenCounts(s, d)),
    "lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "seq_pack" -> ((s, d) => PackOps.seqPack(s, d)),
    // the dual of seq_pack: split long documents into overlapping
    // fixed-width token windows (win=64, stride=48, cover semantics).
    "chunk_stride" -> ((s, d) => PackOps.chunkStride(s, d)),
    // deterministic global training shuffle: contiguous md5-order positions
    // via 256 hash-prefix range buckets (no SinglePartition exchange).
    "shuffle_order" -> ((s, d) => PackOps.shuffleDocs(s, d)),
    // disjoint-exhaustive train/val/test assignment, hash-keyed with a salt
    // independent of the sampling salt.
    "split_assign" -> ((s, d) => CurateOps.splitAssign(s, d)),
    // transcripts→training-batches end-to-end: converged CDC conversation
    // table packed into fixed-budget training windows (PackOps.packOver).
    "transcript_pack" -> ((s, d) => CdcQueries.transcriptPack(s, d)),
    // transcripts × dedup: conversation-level near-dup pairs over the
    // CONVERGED table (assembled turns, planted truncated clones, minhash
    // LSH + exact verify) vs an exact all-pairs Jaccard oracle.
    "transcript_dedup" -> ((s, d) => CdcQueries.transcriptDedup(s, d)),
    // dedup under UPDATES: the pair set maintained incrementally (LWW state
    // tables, band retraction, pair revocation) across a two-phase replay,
    // refreshing only the changesSince-touched conversations — must equal
    // the SAME from-scratch oracle as transcript_dedup.
    "transcript_dedup_inc" -> ((s, d) => CdcQueries.transcriptDedupInc(s, d)),

    // ---- corpus curation: decontamination / repetition / PII / sampling ----
    "decontaminate" -> ((s, d) => CurateOps.decontaminate(s, d)),
    "rep_stats" -> ((s, d) => CurateOps.repetitionStats(s, d)),
    "pii_scrub" -> ((s, d) => CurateOps.piiScrub(s, d)),
    "sample_stratified" -> ((s, d) => CurateOps.sampleStratified(s, d)),
    "mix_domains" -> ((s, d) => MixOps.mixLangs(s, d)),
    "curate_pipeline" -> ((s, d) => CurateOps.curatePipeline(s, d)),

    // ---- similarity search ----
    "sim_cosine_topk" -> ((s, d) => VectorOps.cosineTopK(s, d)),
    "sim_ann_lsh" -> ((s, d) => VectorOps.annLsh(s, d)),
    "sim_ann_ivf" -> ((s, d) => VectorOps.annIvf(s, d)),
    "dedup_embedding" -> ((s, d) => VectorOps.dedupEmbedding(s, d)),
    "dedup_semantic" -> ((s, d) => VectorOps.dedupSemantic(s, d)),

    // ---- page combine / LDIF / DNS shaping (SURVEY §2.4 A2, §2.8 F15/F16/F12, §2.2 P7) ----
    "odata_page_combine" -> ((s, d) => PageOps.odataPageCombine(s, d)),
    "pagination_follow" -> ((s, d) => PageOps.paginationFollow(s, d)),
    "ldif_render" -> ((s, d) => PageOps.ldifRender(s, d)),
    "dns_shape" -> ((s, d) => PageOps.dnsShape(s, d)),
    "auth_token_chain" -> ((s, d) => PageOps.authTokenChain(s, d)),

    // ---- per-record JSON-Schema document generation (the JSG output itself) ----
    "jsg_json_schema" -> ((s, d) => {
      val render = udf((j: String) => JsonSchemaRender.forDocument(j).orNull)
      s.read.parquet(s"$d/events.parquet")
        .select(col("event_id"), render(col("props")).as("json_schema"))
        .orderBy("event_id")
    }),

    // ---- multimodal plumbing ----
    "multimodal_features" -> ((s, d) => MultimodalOps.mediaFeatures(s, d))
  )

  // ---- DuckDB expression generators for byte-level oracles (GUID/SID/SD
  // decode over md5-derived bytes: hex pair at position i = one byte) ----
  private def nib(h: String, i: Int): String =
    s"(strpos('0123456789abcdef', substr($h,$i,1))-1)"
  private def dbyte(h: String, i: Int): String =
    s"(${nib(h, i)}*16+${nib(h, i + 1)})"
  /** Little-endian uint32 from the 4 bytes at hex position `i` (1-based). */
  private def leUint(h: String, i: Int): String =
    s"(${dbyte(h, i)}+${dbyte(h, i + 2)}*256+${dbyte(h, i + 4)}*65536+${dbyte(h, i + 6)}*16777216)"
  /** Same, signed int32 (the reference's bytesToInt returns Java int). */
  private def leInt(h: String, i: Int): String =
    s"(CASE WHEN ${leUint(h, i)} >= 2147483648 THEN ${leUint(h, i)} - 4294967296 ELSE ${leUint(h, i)} END)"

  /** Planted-duplicate corpus + distinct 3-shingle sets, DuckDB form —
    * mirrors TextOps.withPlantedDups / TextOps.shingles exactly.
    */
  // ONE from-scratch oracle for BOTH transcript-dedup verbs: the
  // incremental form's contract is "same answer as the batch form", so
  // duplicating the SQL would let the two silently desynchronize.
  // Conversations re-derived from events (LWW winners, turn-ordered
  // concat), every 5th cloned minus its last turn, exact 3-shingle
  // Jaccard over all pairs — the LSH pipeline's verified pair set must
  // equal it exactly.
  private val transcriptDedupOracleSql: String =
    """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed),
        |live AS (SELECT conv_id, turn_idx, text FROM ranked WHERE rn = 1 AND op <> 'D'),
        |conv AS (
        |  SELECT conv_id AS doc_id, string_agg(text, ' ' ORDER BY turn_idx) AS text
        |  FROM live GROUP BY conv_id),
        |dup AS (
        |  SELECT conv_id || '~dup' AS doc_id, string_agg(text, ' ' ORDER BY turn_idx) AS text
        |  FROM (SELECT conv_id, turn_idx, text,
        |               max(turn_idx) OVER (PARTITION BY conv_id) AS mt FROM live)
        |  WHERE CAST(substr(conv_id, 6) AS INTEGER) % 5 = 0 AND turn_idx < mt
        |  GROUP BY conv_id),
        |corpus AS (SELECT * FROM conv UNION ALL SELECT * FROM dup),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |           range(0, greatest(len(w)-3, 0)+1),
        |           i -> array_to_string(w[(i+1):(i+3)], ' '))) AS s
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus)),
        |jac AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         len(list_intersect(a.s, b.s)) * 1.0 /
        |         len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin

  private val corpusShingleSql: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |         array_to_string(string_split(text, ' ')[2:], ' ') AS text
      |  FROM documents WHERE doc_id % 25 = 0),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |           range(0, greatest(len(w)-3, 0)+1),
      |           i -> array_to_string(w[(i+1):(i+3)], ' '))) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus)),
      |jac AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         len(list_intersect(a.s, b.s)) * 1.0 /
      |         len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)""".stripMargin

  /** One 32-bit SimHash half as a DuckDB expression over `hs` (per-word md5
    * hex list) — bit-for-bit the fingerprint graft.functions.SimhashBits emits.
    */
  private def simhashHalfSql(bits: Range): String =
    bits.map { b =>
      val pos = b / 4 + 1; val shift = 3 - (b % 4); val weight = 1L << (b % 32)
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN " +
        s"((strpos('0123456789abcdef', substr(h,$pos,1))-1) >> $shift) & 1 = 1 " +
        s"THEN 1 ELSE -1 END)) > 0 THEN $weight ELSE 0 END)"
    }.mkString("+")

  /** The random-hyperplane LSH signature as a DuckDB expression (same md5
    * plane construction as VectorOps.planeSign/lshSignature; `t` is the
    * table-index column, `embedding` the vector column).
    */
  private def annSigSql(nPlanes: Int): String =
    (0 until nPlanes).map { p =>
      val proj = s"list_sum(list_transform(range(0, len(embedding)), i -> " +
        s"CAST(embedding[CAST(i+1 AS INTEGER)] AS DOUBLE) * " +
        s"(CASE WHEN strpos('01234567', substr(md5(CAST(t*$nPlanes+$p AS VARCHAR) || '-' || i), 1, 1)) > 0 " +
        s"THEN 1.0 ELSE -1.0 END)))"
      s"(CASE WHEN $proj >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("+")

  /** Brute-force all-pairs Hamming ≤ 7 over the planted-dup corpus — the
    * recall ground truth both simhash banding configs must reproduce.
    */
  private val simhashOracleSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id,
       |         array_to_string(string_split(text, ' ')[2:], ' ') AS text
       |  FROM documents WHERE doc_id % 25 = 0),
       |hx AS (SELECT doc_id, list_transform(string_split(lower(text), ' '),
       |                h -> md5(h)) AS hs FROM corpus),
       |s AS (SELECT doc_id, ${simhashHalfSql(0 until 32)} AS lo,
       |             ${simhashHalfSql(32 until 64)} AS hi FROM hx)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 7
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Near-dup cluster assignment = connected components over the ≥0.5-
    * Jaccard pair graph; canon = component minimum. The oracle closes the
    * reachability relation with a recursive CTE (fine at oracle scale; the
    * Spark side is the O(log² n)-round large-star/small-star algorithm).
    */
  private val clusterOracleSql: String =
    s"""WITH RECURSIVE $corpusShingleSql,
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM jac WHERE jaccard >= 0.5),
       |sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
       |walk AS (
       |  SELECT u AS id, u AS reach FROM (SELECT DISTINCT u FROM sym)
       |  UNION
       |  SELECT w.id, s.v AS reach FROM walk w JOIN sym s ON s.u = w.reach),
       |comp AS (SELECT id AS doc_id, min(reach) AS canon FROM walk GROUP BY id)
       |SELECT doc_id, canon, count(*) OVER (PARTITION BY canon) AS cluster_sz
       |FROM comp ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "decode_guid_sid" ->
      s"""WITH b AS (
         |  SELECT event_id, md5(event_type) AS g, md5(CAST(event_id AS VARCHAR)) AS h
         |  FROM events WHERE event_id < 100)
         |SELECT event_id,
         |       substr(g,7,2)||substr(g,5,2)||substr(g,3,2)||substr(g,1,2)||'-'||
         |       substr(g,11,2)||substr(g,9,2)||'-'||substr(g,15,2)||substr(g,13,2)||'-'||
         |       substr(g,17,4)||'-'||substr(g,21,12) AS guid,
         |       'S-1-5-'||${leUint("h", 1)}||'-'||${leUint("h", 9)} AS sid
         |FROM b ORDER BY event_id""".stripMargin,
    "scalar_parity_pack" -> {
      val flagNames = Seq(1 -> "SE_OWNER_DEFAULTED", 2 -> "SE_GROUP_DEFAULTED",
        4 -> "SE_DACL_PRESENT", 8 -> "SE_DACL_DEFAULTED",
        16 -> "SE_SACL_PRESENT", 32 -> "SE_SACL_DEFAULTED")
        .map { case (bit, n) => s"(CASE WHEN (flags & $bit) <> 0 THEN ' $n' ELSE '' END)" }
        .mkString("||")
      s"""WITH b AS (
         |  SELECT event_id, event_type, user_id,
         |         md5(event_type) AS h1, md5(CAST(user_id AS VARCHAR)) AS h2
         |  FROM events WHERE event_id < 500),
         |f AS (SELECT *, (${dbyte("h1", 3)}*256+${dbyte("h1", 5)}) AS flags FROM b)
         |SELECT event_id,
         |       'Security Descriptor (Rev:'||${dbyte("h1", 1)}||', Flags:0x'||printf('%x',flags)||
         |       $flagNames||')'||
         |       ' Offsets: Owner='||${leInt("h1", 9)}||', Group='||${leInt("h1", 17)}||
         |       ', SACL='||${leInt("h1", 25)}||', DACL='||${leInt("h2", 1)} AS sd,
         |       hex(encode(event_type)) AS hex_type,
         |       event_type AS unhexed,
         |       'accept='||event_type||';content-type=application/json' AS headers_kept,
         |       CASE WHEN len(regexp_extract_all(
         |              CASE WHEN event_id % 3 = 0 THEN event_type
         |                   ELSE event_type||'-'||CAST(event_id AS VARCHAR) END,
         |              '\\d+')) = 0 THEN 'empty' ELSE 'ok' END AS p8_status,
         |       'user:'||CAST(user_id AS VARCHAR)||':pw=********' AS masked
         |FROM f ORDER BY event_id""".stripMargin
    },
    "control_spec_parse" ->
      """WITH b AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 3 = 0 THEN '1.2.840.' || CAST(event_id % 5 AS VARCHAR) ||
        |              '|true|' || to_base64(unhex(substr(md5(CAST(event_id AS VARCHAR)), 1, 12)))
        |         WHEN event_id % 3 = 1 THEN '2.16.840.' || CAST(event_id % 7 AS VARCHAR) || '|false'
        |         ELSE '1.3.6.' || CAST(event_id % 11 AS VARCHAR) END AS spec
        |  FROM events WHERE event_id < 1000)
        |SELECT event_id, spec,
        |       split_part(spec, '|', 1) AS oid,
        |       lower(split_part(spec, '|', 2)) = 'true' AS critical,
        |       CASE WHEN len(string_split(spec, '|')) >= 3
        |            THEN hex(from_base64(split_part(spec, '|', 3))) END AS ber_hex
        |FROM b ORDER BY event_id""".stripMargin,
    "cdc_dead_letter" ->
      """SELECT reason, n FROM (
        |  SELECT 'envelope' AS reason, count(*) AS n FROM events WHERE event_id % 97 = 0
        |  UNION ALL
        |  SELECT 'payload', count(*) FROM events
        |  WHERE event_id % 101 = 0 AND event_id % 97 <> 0 AND event_type <> 'error')
        |WHERE n > 0 ORDER BY reason""".stripMargin,
    // Two-phase resume replay through one checkpoint (4 files per phase, 2
    // per trigger ⇒ exactly 2+2 batches; a third replay finds nothing ⇒ 0),
    // lineage folded to batch-invariant totals: the counts, LSN range and
    // version arithmetic are pure functions of events.parquet.
    "cdc_replay_audit" ->
      """SELECT CAST(4 AS BIGINT) AS n_batches, CAST(0 AS BIGINT) AS rerun_batches,
        |       count(*) AS total_events, count(*) AS total_applied,
        |       CAST(0 AS BIGINT) AS total_malformed,
        |       min(event_id) AS min_lsn, max(event_id) AS max_lsn,
        |       CAST(4 AS BIGINT) AS final_version,
        |       TRUE AS all_committed, TRUE AS timings_consistent
        |FROM events""".stripMargin,
    "schema_infer_props" ->
      """WITH st AS (SELECT json_group_structure(json(props)) AS s FROM events)
        |SELECT u.k AS field,
        |       CASE json_extract_string(s, '$.'||u.k)
        |         WHEN 'UBIGINT' THEN 'bigint' WHEN 'BIGINT' THEN 'bigint'
        |         WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
        |         WHEN 'BOOLEAN' THEN 'boolean' END AS type
        |FROM st, unnest(json_keys(s)) AS u(k) ORDER BY field""".stripMargin,
    "jsg_json_schema" ->
      """WITH kv AS (
        |  SELECT event_id, u.k AS k, json_extract(props, '$.'||u.k) AS v
        |  FROM events, unnest(json_keys(props)) AS u(k)),
        |frags AS (
        |  SELECT event_id, k,
        |    CASE WHEN json_type(v) IN ('UBIGINT','BIGINT')
        |           THEN '{"type":"integer","minimum":' ||
        |                CASE WHEN CAST(v AS BIGINT) < 0
        |                     THEN '-9223372036854775808' ELSE '0' END || '}'
        |         WHEN json_type(v) = 'DOUBLE' THEN '{"type":"number"}'
        |         WHEN json_type(v) = 'BOOLEAN' THEN '{"type":"boolean"}'
        |         WHEN json_type(v) = 'NULL' THEN '{"type":"null"}'
        |         ELSE '{"type":"string"' ||
        |              CASE WHEN regexp_matches(json_extract_string(v,'$'), '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$') THEN ',"format":"uuid"'
        |                   WHEN regexp_matches(json_extract_string(v,'$'), '^\d{4}-\d{2}-\d{2}$') THEN ',"format":"date"'
        |                   WHEN regexp_matches(json_extract_string(v,'$'), '^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}') THEN ',"format":"date-time"'
        |                   WHEN regexp_matches(json_extract_string(v,'$'), '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$') THEN ',"format":"email"'
        |                   WHEN starts_with(lower(json_extract_string(v,'$')), 'http://')
        |                     OR starts_with(lower(json_extract_string(v,'$')), 'https://') THEN ',"format":"uri"'
        |                   ELSE '' END ||
        |              CASE WHEN length(json_extract_string(v,'$')) BETWEEN 1 AND 100
        |                   THEN ',"maxLength":100' ELSE '' END || '}'
        |    END AS frag
        |  FROM kv)
        |SELECT event_id,
        |       '{"$schema":"http://json-schema.org/draft-07/schema#","type":"object","properties":{' ||
        |       string_agg('"' || k || '":' || frag, ',' ORDER BY k) || '}}' AS json_schema
        |FROM frags GROUP BY event_id ORDER BY event_id""".stripMargin,
    // Transcript-level near-dup: conversations re-derived from events (LWW
    // winners, turn-ordered concat), every 5th cloned minus its last turn,
    // exact 3-shingle Jaccard over all pairs — the LSH pipeline's verified
    // pair set must equal it exactly.
    "transcript_dedup" -> transcriptDedupOracleSql,
    "transcript_dedup_inc" -> transcriptDedupOracleSql,
    "dedup_minhash_lsh" ->
      s"""WITH $corpusShingleSql
         |SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $corpusShingleSql
         |SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.4
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Corpus-unigram-LM quality score: integer bit-length surprisal
    // (len(bin(N)) - len(bin(c)) per token, weighted by per-doc tf) — the
    // perplexity-filter signal with no float log in the comparison path.
    // Count-Min sketch cells recomputed exactly: cell(d, tok) = first 3 hex
    // chars of md5(d || ':' || tok); estimate = min over the 4 depth rows.
    // Integer counts end to end — the CMS ≥-true-count guarantee is visible
    // in the compared rows themselves.
    "sketch_token_cms" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tok AS (SELECT tok FROM toks WHERE len(tok) > 0),
        |vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |depths AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |cells AS (
        |  SELECT d, substr(md5(CAST(d AS VARCHAR) || ':' || tok), 1, 3) AS cell,
        |         sum(c) AS cc
        |  FROM vocab CROSS JOIN depths GROUP BY 1, 2),
        |probes AS (SELECT tok, c FROM vocab ORDER BY c DESC, tok LIMIT 8)
        |SELECT p.tok, CAST(p.c AS BIGINT) AS true_cnt,
        |       CAST(min(cells.cc) AS BIGINT) AS cms_est
        |FROM probes p
        |CROSS JOIN depths
        |JOIN cells ON cells.d = depths.d
        | AND cells.cell = substr(md5(CAST(depths.d AS VARCHAR) || ':' || p.tok), 1, 3)
        |GROUP BY 1, 2
        |ORDER BY p.tok""".stripMargin,
    "lm_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |       WHERE len(tok) > 0 GROUP BY 1, 2),
        |vocab AS (SELECT tok, sum(tf) AS c FROM tf GROUP BY 1),
        |n AS (SELECT len(bin(sum(c))) AS nbits FROM vocab)
        |SELECT tf.doc_id,
        |       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |       CAST(sum(tf.tf * (n.nbits - len(bin(vocab.c)))) AS BIGINT) AS surprisal_bits,
        |       CAST(sum(tf.tf * (n.nbits - len(bin(vocab.c)))) AS DOUBLE)
        |         / CAST(sum(tf.tf) AS BIGINT) AS mean_bits
        |FROM tf JOIN vocab USING (tok), n
        |GROUP BY tf.doc_id
        |ORDER BY tf.doc_id""".stripMargin,
    // Exact-substring pairs: docs sharing ≥1 exact 8-word window of
    // lowercased text, windows in >16 docs dropped (the frequency cap is
    // part of the semantics); short docs contribute their whole text.
    "dedup_substring" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(string_split(text, ' ')[2:], ' ') AS text
        |  FROM documents WHERE doc_id % 25 = 0),
        |w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus),
        |win AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |           range(0, greatest(len(w) - 8, 0) + 1),
        |           i -> md5(array_to_string(w[(i+1):(i+8)], ' '))))) AS h
        |  FROM w),
        |rare AS (SELECT h FROM win GROUP BY h HAVING count(*) BETWEEN 2 AND 16)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_windows
        |FROM win a JOIN rare USING (h) JOIN win b USING (h)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Survivors of the incremental (batch-staged) dedup = docs with no
    // ≥0.5-Jaccard partner of smaller id anywhere in the corpus (the rule is
    // batch-split-invariant); batch = which doc_id range the doc arrived in.
    "dedup_incremental" ->
      s"""WITH $corpusShingleSql,
         |h AS (SELECT CAST(floor(max(doc_id) / 2) AS BIGINT) AS half FROM documents)
         |SELECT CAST(CASE WHEN c.doc_id < (SELECT half FROM h) THEN 0
         |                 WHEN c.doc_id < 100000 THEN 1 ELSE 2 END AS BIGINT) AS batch,
         |       c.doc_id
         |FROM corpus c
         |WHERE NOT EXISTS (SELECT 1 FROM jac
         |                  WHERE jac.doc_b = c.doc_id AND jac.jaccard >= 0.5)
         |ORDER BY doc_id""".stripMargin,
    "dedup_cluster" -> clusterOracleSql,
    // Identical oracle on purpose: the incremental variant reconstructs the
    // cluster assignment from the per-batch verified-pair LOG the CDC state
    // accumulates — a green row certifies incremental == whole-corpus.
    "dedup_cluster_inc" -> clusterOracleSql,
    // GPT-style concat-and-slice sequence packing: global token offsets in
    // doc_id order, sliced into 512-token training windows. The oracle is
    // the naive single-stream window cumsum; the Spark side computes the
    // same offsets with a two-phase distributed prefix scan (no
    // SinglePartition exchange — PlanSpec asserts).
    "seq_pack" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |o AS (SELECT doc_id, n_tok,
        |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS start_off
        |      FROM d)
        |SELECT doc_id, n_tok, start_off,
        |       CAST(floor(start_off / 512.0) AS BIGINT) AS pack_first,
        |       CAST(floor((start_off + n_tok - 1) / 512.0) AS BIGINT) AS pack_last
        |FROM o ORDER BY doc_id""".stripMargin,
    // Stride chunking (cover semantics): chunk starts 0, 48, 96, … up to
    // the smallest start whose 64-token window reaches the end of the
    // document; every chunk except possibly the last is exactly 64 tokens.
    "chunk_stride" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, n, words,
        |        unnest(range(0, greatest((n - 64 + 48 - 1) // 48, 0) + 1))
        |          AS chunk_idx
        |      FROM w)
        |SELECT doc_id, chunk_idx,
        |       least(64, n - chunk_idx * 48) AS chunk_tok,
        |       array_to_string(words[(chunk_idx * 48 + 1):(chunk_idx * 48 + 64)],
        |                       ' ') AS chunk_text
        |FROM c""".stripMargin,
    // Deterministic global shuffle: the naive single-window rank the 256-
    // bucket distributed form must equal (ties broken by doc_id).
    "shuffle_order" ->
      """SELECT doc_id,
        |       CAST(row_number() OVER (
        |         ORDER BY md5('shuf-' || CAST(doc_id AS VARCHAR)), doc_id)
        |         - 1 AS BIGINT) AS pos
        |FROM documents""".stripMargin,
    // Train/val/test assignment: first 16 bits of md5('spl-'||doc_id)
    // against the 5%/10% holdout boundaries.
    "split_assign" -> {
      val hexpr = "md5('spl-' || CAST(doc_id AS VARCHAR))"
      val h16 = s"(${nib(hexpr, 1)}*4096 + ${nib(hexpr, 2)}*256 + " +
        s"${nib(hexpr, 3)}*16 + ${nib(hexpr, 4)})"
      s"""SELECT doc_id, lang,
         |       CASE WHEN $h16 < ${graft.ops.CurateOps.SplitTestUpper} THEN 'test'
         |            WHEN $h16 < ${graft.ops.CurateOps.SplitValUpper} THEN 'val'
         |            ELSE 'train' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // Transcript packing: the oracle recomputes the converged conversation
    // table from events alone (the cdc_lww_window LWW rule), sums each
    // conversation's live-turn text lengths (the deterministic token
    // proxy), and packs conversations in conv_id order with the naive
    // cumulative sum the distributed prefix scan must equal.
    "transcript_pack" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed),
        |live AS (SELECT conv_id, text FROM ranked WHERE rn = 1 AND op <> 'D'),
        |tok AS (SELECT conv_id, CAST(sum(length(text)) AS BIGINT) AS n_tok
        |        FROM live GROUP BY conv_id),
        |o AS (SELECT conv_id, n_tok,
        |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY conv_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS start_off
        |      FROM tok)
        |SELECT conv_id, n_tok, start_off,
        |       CAST(floor(start_off / 512.0) AS BIGINT) AS pack_first,
        |       CAST(floor((start_off + n_tok - 1) / 512.0) AS BIGINT) AS pack_last
        |FROM o ORDER BY conv_id""".stripMargin,
    // Chat-template render: the oracle recomputes the converged table, maps
    // roles (purchase→assistant, signup→system, else user), renders each
    // turn as a ChatML segment, derives per-turn character spans with a
    // running sum, masks loss to assistant turns, and hashes the ordered
    // full-conversation render — every step in plain SQL.
    "transcript_render" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text
        |  FROM events),
        |ranked AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f),
        |seg AS (
        |  SELECT conv_id, turn_idx,
        |         CASE role WHEN 'purchase' THEN 'assistant'
        |                   WHEN 'signup' THEN 'system' ELSE 'user' END AS chat_role,
        |         '<|im_start|>' ||
        |           CASE role WHEN 'purchase' THEN 'assistant'
        |                     WHEN 'signup' THEN 'system' ELSE 'user' END ||
        |           chr(10) || text || '<|im_end|>' || chr(10) AS seg
        |  FROM ranked WHERE rn = 1 AND op <> 'D'),
        |sp AS (
        |  SELECT conv_id, turn_idx, chat_role, seg,
        |         CAST(SUM(length(seg)) OVER (PARTITION BY conv_id ORDER BY turn_idx
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_char
        |  FROM seg),
        |h AS (
        |  SELECT conv_id, md5(string_agg(seg, '' ORDER BY turn_idx)) AS conv_hash
        |  FROM seg GROUP BY conv_id)
        |SELECT sp.conv_id, sp.turn_idx, sp.chat_role,
        |       CAST(sp.end_char - length(sp.seg) AS BIGINT) AS start_char,
        |       sp.end_char,
        |       CASE WHEN sp.chat_role = 'assistant' THEN 1 ELSE 0 END AS loss,
        |       h.conv_hash
        |FROM sp JOIN h USING (conv_id)
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Benchmark decontamination: 5-gram overlap vs the derived benchmark set
    // (words 3..10 of every doc_id % 40 == 0 doc). Same shingle window
    // semantics as CurateOps.decontaminate / TextOps.shingles.
    "decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |b AS (SELECT DISTINCT unnest(list_distinct(list_transform(
        |        range(0, greatest(len(w[3:10]) - 5, 0) + 1),
        |        i -> array_to_string((w[3:10])[(i+1):(i+5)], ' ')))) AS gram
        |      FROM w WHERE doc_id % 40 = 0),
        |tg AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |        range(0, greatest(len(w) - 5, 0) + 1),
        |        i -> array_to_string(w[(i+1):(i+5)], ' ')))) AS gram
        |      FROM w)
        |SELECT tg.doc_id, count(*) AS n_hits
        |FROM tg JOIN b USING (gram)
        |GROUP BY tg.doc_id ORDER BY doc_id""".stripMargin,
    // Gopher repetition metrics over the planted-repeat corpus (first three
    // words repeated 12x at doc_id + 500000 for doc_id % 50 == 0).
    "rep_stats" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000,
        |         array_to_string(flatten(list_transform(range(0, 12),
        |           i -> string_split(text, ' ')[1:3])), ' ')
        |  FROM documents WHERE doc_id % 50 = 0),
        |w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus),
        |r AS (SELECT doc_id, len(w) AS n_words,
        |        round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4) AS dup_word_frac
        |      FROM w),
        |g AS (SELECT doc_id, unnest(list_transform(range(0, greatest(len(w) - 2, 0) + 1),
        |        i -> array_to_string(w[(i+1):(i+2)], ' '))) AS gram FROM w),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        |a AS (SELECT doc_id, max(c) AS top_c, sum(c) AS tot,
        |        sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_c FROM c GROUP BY 1)
        |SELECT r.doc_id, r.n_words, r.dup_word_frac,
        |       round(a.top_c * 1.0 / a.tot, 4) AS top2_share,
        |       round(a.dup_c * 1.0 / a.tot, 4) AS dup2_frac,
        |       (round(a.top_c * 1.0 / a.tot, 4) <= 0.18 AND
        |        round(a.dup_c * 1.0 / a.tot, 4) <= 0.5) AS keep
        |FROM r JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,
    // PII scrub over the planted-PII corpus; emails redacted before the
    // phone pass in both engines.
    "pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |         THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |              '@example.com for details'
        |         ELSE text END ||
        |    CASE WHEN doc_id % 15 = 0
        |         THEN ' or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END AS text
        |  FROM documents),
        |d AS (SELECT doc_id, text,
        |        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                       '<EMAIL>', 'g') AS de
        |      FROM p)
        |SELECT doc_id,
        |       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |         AS n_emails,
        |       len(regexp_extract_all(de, '\d{3}-\d{4}')) AS n_phones,
        |       regexp_replace(de, '\d{3}-\d{4}', '<PHONE>', 'g') AS scrubbed
        |FROM d ORDER BY doc_id""".stripMargin,
    // Deterministic stratified sample: first 16 bits of md5('smp-'||doc_id)
    // under the per-language rate (fractions of 2^16).
    "sample_stratified" -> {
      val hexpr = "md5('smp-' || CAST(doc_id AS VARCHAR))"
      val h16 = s"(${nib(hexpr, 1)}*4096 + ${nib(hexpr, 2)}*256 + " +
        s"${nib(hexpr, 3)}*16 + ${nib(hexpr, 4)})"
      val rateCase = graft.ops.CurateOps.StratumRates
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""SELECT doc_id, lang FROM documents
         |WHERE $h16 < CASE lang $rateCase ELSE 0 END
         |ORDER BY doc_id""".stripMargin
    },
    // Exact domain-mixture resampling: T = min_d(n_d / w_d), each lang keeps
    // its floor(w_d·T) lowest docs by (md5("mix-"||doc_id), doc_id) — the
    // oracle's plain per-domain window rank must equal the engine's bucketed
    // distributed rank row-for-row.
    "mix_domains" -> {
      val wsql = MixOps.LangWeights
        .map { case (l, w) => s"SELECT '$l' AS domain, CAST($w AS DOUBLE) AS wt" }
        .mkString(" UNION ALL ")
      s"""WITH w AS ($wsql),
         |c AS (SELECT lang AS domain, CAST(count(*) AS DOUBLE) AS n
         |      FROM documents GROUP BY 1),
         |t AS (SELECT min(COALESCE(c.n, 0) / w.wt) AS T
         |      FROM w LEFT JOIN c USING (domain)),
         |k AS (SELECT w.domain, CAST(floor(w.wt * t.T) AS BIGINT) AS kd FROM w, t),
         |ranked AS (
         |  SELECT doc_id, lang, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY md5('mix-' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents)
         |SELECT r.doc_id, r.lang
         |FROM ranked r JOIN k ON r.lang = k.domain
         |WHERE r.rn <= k.kd
         |ORDER BY lang, doc_id""".stripMargin
    },
    // The five-stage curation chain over the planted-dup corpus: near-dup
    // drop (smaller-id ≥0.5-Jaccard partner), decontamination (benchmark
    // from the BASE table only), Gopher repetition keep, PII scrub, and the
    // stratified sample — one CTE stack, identical stage rules. Planted-dup
    // rows inherit their source doc's lang (doc_id % 100000).
    "curate_pipeline" -> {
      val hexpr = "md5('smp-' || CAST(c0.doc_id AS VARCHAR))"
      val h16 = s"(${nib(hexpr, 1)}*4096 + ${nib(hexpr, 2)}*256 + " +
        s"${nib(hexpr, 3)}*16 + ${nib(hexpr, 4)})"
      val rateCase = graft.ops.CurateOps.StratumRates
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""WITH $corpusShingleSql,
         |w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus),
         |b AS (SELECT DISTINCT unnest(list_distinct(list_transform(
         |        range(0, greatest(len(w[3:10]) - 5, 0) + 1),
         |        i -> array_to_string((w[3:10])[(i+1):(i+5)], ' ')))) AS gram
         |      FROM w WHERE doc_id % 40 = 0 AND doc_id < 100000),
         |tg AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |        range(0, greatest(len(w) - 5, 0) + 1),
         |        i -> array_to_string(w[(i+1):(i+5)], ' ')))) AS gram
         |      FROM w),
         |contam AS (SELECT DISTINCT tg.doc_id FROM tg JOIN b USING (gram)),
         |g AS (SELECT doc_id, unnest(list_transform(range(0, greatest(len(w) - 2, 0) + 1),
         |        i -> array_to_string(w[(i+1):(i+2)], ' '))) AS gram FROM w),
         |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
         |a AS (SELECT doc_id, max(c) AS top_c, sum(c) AS tot,
         |        sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_c FROM c GROUP BY 1),
         |keep AS (SELECT doc_id FROM a
         |         WHERE round(top_c * 1.0 / tot, 4) <= 0.18
         |           AND round(dup_c * 1.0 / tot, 4) <= 0.5),
         |piid AS (SELECT doc_id,
         |    CASE WHEN doc_id % 10 = 0
         |         THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |              '@example.com for details'
         |         ELSE text END ||
         |    CASE WHEN doc_id % 15 = 0
         |         THEN ' or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |         ELSE '' END AS text
         |  FROM corpus),
         |scr AS (SELECT doc_id,
         |        regexp_replace(regexp_replace(text,
         |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |          '\\d{3}-\\d{4}', '<PHONE>', 'g') AS scrubbed
         |      FROM piid)
         |SELECT c0.doc_id, d.lang, md5(s.scrubbed) AS fp
         |FROM corpus c0
         |JOIN documents d ON d.doc_id = c0.doc_id % 100000
         |JOIN scr s ON s.doc_id = c0.doc_id
         |WHERE NOT EXISTS (SELECT 1 FROM jac
         |                  WHERE jac.doc_b = c0.doc_id AND jac.jaccard >= 0.5)
         |  AND c0.doc_id NOT IN (SELECT doc_id FROM contam)
         |  AND c0.doc_id IN (SELECT doc_id FROM keep)
         |  AND $h16 < CASE d.lang $rateCase ELSE 0 END
         |ORDER BY c0.doc_id""".stripMargin
    },
    "dedup_simhash" -> simhashOracleSql,
    // Identical brute-force oracle on purpose: a green row here certifies
    // the 16-bit-block + multi-index-probe banding finds the SAME exact
    // radius-7 pair set as the 8-bit pigeonhole config.
    "dedup_simhash_mip" -> simhashOracleSql,
    "sim_ann_lsh" ->
      s"""WITH sigs AS (
         |  SELECT vec_id, t, ${annSigSql(8)} AS sig
         |  FROM embeddings, (SELECT unnest(range(0, 4)) AS t)),
         |q AS (SELECT t, sig, vec_id AS qid FROM sigs WHERE vec_id < 10),
         |cands AS (
         |  SELECT DISTINCT q.qid, s.vec_id AS nid
         |  FROM sigs s JOIN q ON s.t = q.t AND s.sig = q.sig
         |  WHERE s.vec_id <> q.qid),
         |scored AS (
         |  SELECT c.qid, c.nid,
         |         round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |               CAST(ne.embedding AS DOUBLE[])), 4) AS cos
         |  FROM cands c JOIN embeddings qe ON qe.vec_id = c.qid
         |  JOIN embeddings ne ON ne.vec_id = c.nid)
         |SELECT qid, nid, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |  FROM scored)
         |WHERE rn <= 5 ORDER BY qid, nid""".stripMargin,
    // IVF ANN: the oracle re-runs the identical algorithm — hash-stratified
    // centroid sample (min-md5 vector per md5 stratum, 16 strata from the
    // hash's first two bytes), nearest-cell assignment, nprobe=4 probe
    // cells per query, exact cosine re-rank — with the same round(·,4) +
    // id tie-break ordering discipline as every vector query.
    "sim_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hs AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h FROM e),
        |cent AS (
        |  SELECT vec_id AS cid, v AS cv FROM hs
        |  QUALIFY row_number() OVER (
        |    PARTITION BY (${dbyte("h", 1)}*256+${dbyte("h", 3)}) % 16
        |    ORDER BY h, vec_id) = 1),
        |ranked AS (
        |  SELECT e.vec_id, c.cid,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC, c.cid) AS rn
        |  FROM e, cent c),
        |inv AS (SELECT cid, vec_id AS nid FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid FROM ranked
        |           WHERE vec_id < 10 AND rn <= 4),
        |scored AS (
        |  SELECT p.qid, i.nid,
        |         round(list_cosine_similarity(qe.v, ne.v), 4) AS cos
        |  FROM probes p JOIN inv i ON i.cid = p.cid
        |  JOIN e qe ON qe.vec_id = p.qid JOIN e ne ON ne.vec_id = i.nid
        |  WHERE i.nid <> p.qid)
        |SELECT qid, nid, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY qid, nid""".stripMargin,
    // SemDeDup: the oracle re-runs the identical pipeline — the IVF
    // hash-stratified centroid sample, nearest-cell assignment (with each
    // vector's rounded centroid cosine), then the within-cell prune: b is
    // dropped iff a cell-mate a with pair-cosine ≥ 0.30 ranks before it
    // (lower centroid similarity first, id tie-break); kept_by = the
    // ranking-first such a.
    "dedup_semantic" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hs AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h FROM e),
        |cent AS (
        |  SELECT vec_id AS cid, v AS cv FROM hs
        |  QUALIFY row_number() OVER (
        |    PARTITION BY (${dbyte("h", 1)}*256+${dbyte("h", 3)}) % 16
        |    ORDER BY h, vec_id) = 1),
        |ranked AS (
        |  SELECT e.vec_id, e.v, c.cid,
        |         round(list_cosine_similarity(e.v, c.cv), 4) AS ccos,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC, c.cid) AS rn
        |  FROM e, cent c),
        |asn AS (SELECT cid, vec_id, v, ccos FROM ranked WHERE rn = 1),
        |qual AS (
        |  SELECT b.vec_id, a.vec_id AS kept_by, a.ccos AS ca,
        |         round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |  FROM asn a JOIN asn b ON a.cid = b.cid
        |   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.30)
        |SELECT vec_id, kept_by, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ca, kept_by) AS rn
        |  FROM qual)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // Every modality round-trips a REAL JDK codec; the oracle reproduces the
    // DECODED features from the generator formulas, never container bytes
    // (encoder-dependent). Image (PNG): pixel = (7x+13y+doc_id) mod 256.
    // Audio (WAV): 8 kHz mono 8-bit PCM, sample(i) = (11·doc_id+5i) mod 256,
    // n = doc_id%160+16; fingerprint = md5 of the PCM hex. Video (GVID
    // container of PNG frames): frame f pixel = (7x+13y+doc_id+31f) mod 256,
    // nFrames = doc_id%12+2, every 4th frame decoded; fingerprint = md5 of
    // the sampled frames' pixel hex in (frame, row, col) order.
    "multimodal_features" ->
      """SELECT doc_id,
        |       ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
        |       CASE WHEN doc_id % 3 <> 1 THEN CAST(doc_id % 16 + 1 AS INTEGER) END AS width,
        |       CASE WHEN doc_id % 3 <> 1 THEN CAST(doc_id % 12 + 1 AS INTEGER) END AS height,
        |       CASE WHEN doc_id % 3 = 0 THEN round(list_avg(flatten(
        |            list_transform(range(0, doc_id % 12 + 1), y ->
        |              list_transform(range(0, doc_id % 16 + 1), x ->
        |                (7*x + 13*y + doc_id) % 256)))), 4)
        |            WHEN doc_id % 3 = 2 THEN round(list_avg(flatten(list_transform(
        |              range(0, doc_id % 12 + 2, 4), f -> flatten(
        |                list_transform(range(0, doc_id % 12 + 1), y ->
        |                  list_transform(range(0, doc_id % 16 + 1), x ->
        |                    (7*x + 13*y + doc_id + 31*f) % 256)))))), 4) END AS mean_pixel,
        |       CASE WHEN doc_id % 3 = 1 THEN CAST(8000 AS INTEGER) END AS sample_rate,
        |       CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 160 + 16 AS INTEGER) END AS n_samples,
        |       CASE WHEN doc_id % 3 = 1 THEN round(list_avg(
        |            list_transform(range(0, CAST(doc_id % 160 + 16 AS INTEGER)),
        |              i -> (11*doc_id + 5*i) % 256)), 4) END AS mean_sample,
        |       CASE WHEN doc_id % 3 = 2 THEN CAST(doc_id % 12 + 2 AS INTEGER) END AS n_frames,
        |       CASE WHEN doc_id % 3 = 2 THEN CAST((doc_id % 12 + 5) // 4 AS INTEGER) END AS frames_sampled,
        |       CASE WHEN doc_id % 3 = 1 THEN md5(list_reduce(
        |              list_transform(range(0, CAST(doc_id % 160 + 16 AS INTEGER)),
        |                i -> format('{:02x}', (11*doc_id + 5*i) % 256)),
        |              (a, x) -> a || x))
        |            WHEN doc_id % 3 = 2 THEN md5(list_reduce(
        |              list_transform(flatten(list_transform(
        |                range(0, doc_id % 12 + 2, 4), f -> flatten(
        |                  list_transform(range(0, doc_id % 12 + 1), y ->
        |                    list_transform(range(0, doc_id % 16 + 1), x ->
        |                      (7*x + 13*y + doc_id + 31*f) % 256))))),
        |                p -> format('{:02x}', p)),
        |              (a, x) -> a || x)) END AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Partial-update merge: every cell recomputed independently — a column's
    // value is the one at its latest setter (I sets all columns, U its
    // non-null ones) AFTER the key's latest delete; the row is live iff the
    // latest op is not D. arg_max over a struct keeps NULL values eligible
    // (an I's explicit null must WIN, and DuckDB's bare arg_max skips null
    // values); the CASE order column makes arg_max ignore non-setters.
    "cdc_patch_upsert" ->
      """WITH p AS (
        |  SELECT event_id AS lsn,
        |         CASE WHEN event_type = 'error' THEN 'D'
        |              WHEN event_id % 5 = 0 THEN 'I'
        |              WHEN event_id % 7 = 3 THEN 'R' ELSE 'U' END AS op,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         event_type, "value" AS v, ts
        |  FROM events),
        |m AS (
        |  SELECT lsn, op, conv_id, turn_idx,
        |    CASE WHEN op = 'I' OR (op = 'U' AND lsn % 3 = 0) THEN event_type END AS role,
        |    CASE WHEN op = 'I' OR (op = 'U' AND lsn % 3 IN (0, 2))
        |         THEN event_type || '#' || CAST(lsn AS VARCHAR) END AS text,
        |    CASE WHEN (op = 'I' AND lsn % 7 <> 0) OR (op = 'U' AND lsn % 3 = 1) THEN v END AS "value",
        |    CASE WHEN op = 'I' OR (op = 'U' AND lsn % 3 = 2) THEN ts END AS ts
        |  FROM p),
        |d AS (
        |  SELECT conv_id, turn_idx,
        |         coalesce(max(CASE WHEN op = 'D' THEN lsn END), -1) AS dl
        |  FROM m GROUP BY 1, 2)
        |SELECT m.conv_id, m.turn_idx,
        |  (arg_max({x: role}, CASE WHEN op <> 'D' AND lsn > dl
        |     AND (op = 'I' OR role IS NOT NULL
        |          OR (op = 'R' AND lsn % 3 = 0)) THEN lsn END)).x AS role,
        |  (arg_max({x: text}, CASE WHEN op <> 'D' AND lsn > dl
        |     AND (op = 'I' OR text IS NOT NULL
        |          OR (op = 'R' AND lsn % 3 = 1)) THEN lsn END)).x AS text,
        |  (arg_max({x: "value"}, CASE WHEN op <> 'D' AND lsn > dl
        |     AND (op = 'I' OR "value" IS NOT NULL
        |          OR (op = 'R' AND lsn % 3 = 2)) THEN lsn END)).x AS "value",
        |  (arg_max({x: ts}, CASE WHEN op <> 'D' AND lsn > dl
        |     AND (op = 'I' OR ts IS NOT NULL) THEN lsn END)).x AS ts
        |FROM m JOIN d USING (conv_id, turn_idx)
        |GROUP BY 1, 2
        |HAVING (arg_max({x: op}, lsn)).x <> 'D'
        |ORDER BY 1, 2""".stripMargin,
    // Incremental consumption of a PATCH table: the oracle folds ONLY the
    // post-cutoff window's events under the per-column setter arbitration
    // (window-internal wipe boundary included) — the net PARTIAL state a
    // patch-CDF consumer applies downstream; deletes ride as op='D' rows
    // with null payload.
    "cdc_patch_changes" ->
      """WITH p AS (
        |  SELECT event_id AS lsn,
        |         CASE WHEN event_type = 'error' THEN 'D'
        |              WHEN event_id % 5 = 0 THEN 'I'
        |              WHEN event_id % 7 = 3 THEN 'R' ELSE 'U' END AS op,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         event_type, "value" AS v
        |  FROM events
        |  WHERE event_id > (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)),
        |m AS (
        |  SELECT lsn, op, conv_id, turn_idx,
        |    CASE WHEN op = 'I' OR (op = 'U' AND lsn % 3 = 0) THEN event_type END AS role,
        |    CASE WHEN op = 'I' OR (op = 'U' AND lsn % 3 IN (0, 2))
        |         THEN event_type || '#' || CAST(lsn AS VARCHAR) END AS text,
        |    CASE WHEN (op = 'I' AND lsn % 7 <> 0) OR (op = 'U' AND lsn % 3 = 1) THEN v END AS "value"
        |  FROM p),
        |d AS (
        |  SELECT conv_id, turn_idx,
        |         coalesce(max(CASE WHEN op = 'D' THEN lsn END), -1) AS dl
        |  FROM m GROUP BY 1, 2)
        |SELECT m.conv_id, m.turn_idx,
        |  CASE WHEN (arg_max({x: op}, lsn)).x = 'D' THEN 'D' ELSE 'U' END AS op,
        |  (arg_max({x: role}, CASE WHEN op <> 'D' AND lsn > dl
        |     AND (op = 'I' OR role IS NOT NULL
        |          OR (op = 'R' AND lsn % 3 = 0)) THEN lsn END)).x AS role,
        |  (arg_max({x: text}, CASE WHEN op <> 'D' AND lsn > dl
        |     AND (op = 'I' OR text IS NOT NULL
        |          OR (op = 'R' AND lsn % 3 = 1)) THEN lsn END)).x AS text,
        |  (arg_max({x: "value"}, CASE WHEN op <> 'D' AND lsn > dl
        |     AND (op = 'I' OR "value" IS NOT NULL
        |          OR (op = 'R' AND lsn % 3 = 2)) THEN lsn END)).x AS "value"
        |FROM m JOIN d USING (conv_id, turn_idx)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // Two racing writers + commit-retry + vacuum converge to the SAME state
    // a single straight-through LWW pass computes — the oracle is identical
    // to cdc_upsert_lww (it never heard of writers, retries, or the GC).
    "cdc_concurrent_writers" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value", ts
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed)
        |SELECT conv_id, turn_idx, role, text, "value", ts
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    "cdc_upsert_lww" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value", ts
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed)
        |SELECT conv_id, turn_idx, role, text, "value", ts
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Same converged table as cdc_upsert_lww, restricted to the 10 lowest
    // conv_ids (user_id < 10) — the slice the engine serves via bucket
    // pruning (only the matching buckets' files are opened; IceLiteSpec
    // asserts the input-file set).
    "cdc_bucket_prune" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value", ts
        |  FROM events WHERE user_id < 10),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed)
        |SELECT conv_id, turn_idx, role, text, "value", ts
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Two-phase staged feed: even event_ids carry integer `score`, odd ones
    // fractional `score` + a new `model` field — the converged table after
    // Long→Double widening and ADD COLUMN, per-key LWW.
    "schema_evolution_read" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         CASE WHEN event_id % 2 = 0 THEN CAST(floor("value") AS DOUBLE)
        |              ELSE "value" END AS score,
        |         CASE WHEN event_id % 2 = 1 THEN 'm-' || CAST(user_id % 5 AS VARCHAR) END AS model
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed)
        |SELECT conv_id, turn_idx, role, text, score, model
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Hot-key skew replay (St7): every tenth user collapses onto one
    // conversation (wide event_id%500 turn domain); converged table state
    // must equal the LWW window over the same remapped feed.
    "cdc_skew_hotkey" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         CASE WHEN user_id % 10 = 0 THEN 'conv-hot'
        |              ELSE 'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') END AS conv_id,
        |         CASE WHEN user_id % 10 = 0 THEN CAST(event_id % 500 AS INTEGER)
        |              ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 END AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed)
        |SELECT conv_id, turn_idx, role, text, "value"
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Net change set since the phase-1 snapshot (events with lsn ≤ half):
    // for every key phase 2 touched, its final LWW winner; net deletes keep
    // op='D' with null payload (tombstones carry no payload in the table).
    // Derived view: the from-scratch recompute — per-key LWW over ALL
    // events, keep live winners passing the predicate (role ≠ 'view').
    "cdc_derived_view" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed)
        |SELECT conv_id, turn_idx, role, text, "value"
        |FROM ranked WHERE rn = 1 AND op <> 'D' AND role <> 'view'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Streaming consumption: run 1 = per-key LWW at lsn ≤ cutoff (net
    // deletes included as op='D' null-payload rows), run 2 = per-key LWW
    // among lsn > cutoff only — the checkpoint-resumed second window.
    "cdc_stream_consume" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |cutoff AS (
        |  SELECT max(lsn) AS l FROM feed
        |  WHERE lsn <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)),
        |w1 AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f, cutoff c WHERE f.lsn <= c.l),
        |w2 AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f, cutoff c WHERE f.lsn > c.l),
        |both_runs AS (
        |  SELECT 1 AS run, * FROM w1 WHERE rn = 1
        |  UNION ALL
        |  SELECT 2 AS run, * FROM w2 WHERE rn = 1)
        |SELECT run, conv_id, turn_idx, op,
        |       CASE WHEN op = 'D' THEN NULL ELSE role END AS role,
        |       CASE WHEN op = 'D' THEN NULL ELSE text END AS text,
        |       CASE WHEN op = 'D' THEN NULL ELSE "value" END AS "value",
        |       lsn
        |FROM both_runs
        |ORDER BY run, conv_id, turn_idx""".stripMargin,
    "cdc_changes_since" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |cutoff AS (
        |  SELECT max(lsn) AS l FROM feed
        |  WHERE lsn <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)),
        |ranked AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f, cutoff c WHERE f.lsn > c.l)
        |SELECT conv_id, turn_idx, op,
        |       CASE WHEN op = 'D' THEN NULL ELSE role END AS role,
        |       CASE WHEN op = 'D' THEN NULL ELSE text END AS text,
        |       CASE WHEN op = 'D' THEN NULL ELSE "value" END AS "value",
        |       lsn
        |FROM ranked WHERE rn = 1
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Time travel: converged live state AS OF the phase-1 snapshot — LWW
    // winner per key among events with lsn ≤ the cutoff, deletes dropped —
    // read back after phase 2 fully committed over it.
    "cdc_time_travel" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events
        |  WHERE event_id <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)),
        |ranked AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f)
        |SELECT conv_id, turn_idx, role, text, "value"
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Point-in-time recovery: rollback to the phase-1 snapshot then a
    // fresh-checkpoint re-replay of the whole feed must converge to the
    // straight-through full-feed LWW state — the oracle never heard of the
    // rollback.
    "cdc_rollback_replay" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |ranked AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f)
        |SELECT conv_id, turn_idx, role, text, "value"
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Snapshot bootstrap + tail handoff: the engine replays a FOLDED
    // consistent snapshot of the ≤cutoff prefix (one I per live key at its
    // original LSN) and then only the >cutoff tail — the oracle is the
    // straight-through full-history LWW state, which the handoff must equal
    // bit-for-bit (snapshot ∘ tail ≡ full replay).
    "cdc_bootstrap_handoff" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |ranked AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f)
        |SELECT conv_id, turn_idx, role, text, "value"
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Classified CDF between the phase-1 snapshot and the head: per touched
    // key, insert/update/delete with before/after text. The oracle rebuilds
    // both states from events alone and classifies by liveness at each end
    // (keys dead at both ends are no visible change and dropped).
    "cdc_version_diff" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text
        |  FROM events),
        |cut AS (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS half FROM events),
        |a AS (
        |  SELECT conv_id, turn_idx, text FROM (
        |    SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |    FROM feed f, cut c WHERE f.lsn <= c.half)
        |  WHERE rn = 1 AND op <> 'D'),
        |b AS (
        |  SELECT conv_id, turn_idx, op, text FROM (
        |    SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |    FROM feed f)
        |  WHERE rn = 1),
        |touched AS (SELECT DISTINCT conv_id, turn_idx FROM feed, cut WHERE lsn > half)
        |SELECT t.conv_id, t.turn_idx,
        |       CASE WHEN b.op <> 'D' AND a.text IS NULL THEN 'insert'
        |            WHEN b.op <> 'D' THEN 'update'
        |            ELSE 'delete' END AS change,
        |       a.text AS old_text,
        |       CASE WHEN b.op <> 'D' THEN b.text END AS new_text
        |FROM touched t
        |JOIN b USING (conv_id, turn_idx)
        |LEFT JOIN a USING (conv_id, turn_idx)
        |WHERE NOT (b.op = 'D' AND a.text IS NULL)
        |ORDER BY conv_id, turn_idx""".stripMargin,
    // Write-audit-publish, passing gate: the consumer view DURING staging is
    // phase-1 converged state (isolation), the audit counts violations over
    // the staged live winners (zero on the clean feed), and the view after
    // publish is the full converged state.
    "cdc_wap_publish" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |cutoff AS (
        |  SELECT max(lsn) AS l FROM feed
        |  WHERE lsn <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)),
        |p1 AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f, cutoff c WHERE f.lsn <= c.l),
        |fullr AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f),
        |staged AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed f, cutoff c WHERE f.lsn > c.l)
        |SELECT * FROM (
        |  SELECT 'staged_view' AS phase, conv_id, turn_idx, role, text, "value",
        |         CAST(NULL AS BIGINT) AS n
        |  FROM p1 WHERE rn = 1 AND op <> 'D'
        |  UNION ALL
        |  SELECT 'audit', 'role_not_null', CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
        |         CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
        |         (SELECT count(*) FROM staged WHERE rn = 1 AND op <> 'D' AND role IS NULL)
        |  UNION ALL
        |  SELECT 'audit', 'text_not_null', CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
        |         CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
        |         (SELECT count(*) FROM staged WHERE rn = 1 AND op <> 'D' AND text IS NULL)
        |  UNION ALL
        |  SELECT 'published_view', conv_id, turn_idx, role, text, "value", CAST(NULL AS BIGINT)
        |  FROM fullr WHERE rn = 1 AND op <> 'D')
        |ORDER BY phase, conv_id, turn_idx""".stripMargin,
    // Write-audit-publish, failing gate: phase 2 poisons every 7th LSN's
    // upsert text; the audit counts staged live winners with null text, and
    // after abort the consumer view is exactly phase-1 state.
    "cdc_wap_abort" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |cutoff AS (
        |  SELECT max(lsn) AS l FROM feed
        |  WHERE lsn <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)),
        |poisoned AS (
        |  SELECT lsn, conv_id, turn_idx, op, role,
        |         CASE WHEN op = 'U' AND lsn > c.l AND lsn % 7 = 0 THEN NULL
        |              ELSE text END AS text,
        |         "value"
        |  FROM feed, cutoff c),
        |p1 AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM poisoned f, cutoff c WHERE f.lsn <= c.l),
        |staged AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM poisoned f, cutoff c WHERE f.lsn > c.l)
        |SELECT * FROM (
        |  SELECT 'audit' AS phase, 'text_not_null' AS conv_id, CAST(NULL AS INTEGER) AS turn_idx,
        |         CAST(NULL AS VARCHAR) AS role, CAST(NULL AS VARCHAR) AS text,
        |         CAST(NULL AS DOUBLE) AS "value",
        |         (SELECT count(*) FROM staged WHERE rn = 1 AND op <> 'D' AND text IS NULL) AS n
        |  UNION ALL
        |  SELECT 'after_abort', conv_id, turn_idx, role, text, "value", CAST(NULL AS BIGINT)
        |  FROM p1 WHERE rn = 1 AND op <> 'D')
        |ORDER BY phase, conv_id, turn_idx""".stripMargin,
    // Sessionized-view refresh delta: LWW winner per (conv, turn) key →
    // conversations touched after the phase-1 cutoff (any key whose winner
    // lsn > cutoff — exactly the keys changesSince emits) → 24 h gap
    // sessions over those conversations' SURVIVING winners, bounds as
    // epoch microseconds.
    "sessionize_changes" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         "value", ts
        |  FROM events),
        |win AS (
        |  SELECT * FROM (
        |    SELECT f.*, row_number() OVER (PARTITION BY conv_id, turn_idx
        |                                   ORDER BY lsn DESC) AS rn
        |    FROM feed f) WHERE rn = 1),
        |cutoff AS (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS h FROM events),
        |touched AS (
        |  SELECT DISTINCT conv_id FROM win, cutoff WHERE lsn > h),
        |live AS (
        |  SELECT w.conv_id, w.turn_idx, epoch_us(w.ts) AS us, w."value"
        |  FROM win w JOIN touched t USING (conv_id)
        |  WHERE w.op = 'U'),
        |g AS (
        |  SELECT conv_id, turn_idx, us, "value",
        |         CASE WHEN us - lag(us) OVER (PARTITION BY conv_id ORDER BY us, turn_idx)
        |              > 86400000000 THEN 1 ELSE 0 END AS brk
        |  FROM live),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY conv_id ORDER BY us, turn_idx
        |                           ROWS UNBOUNDED PRECEDING) AS si
        |  FROM g)
        |SELECT conv_id, CAST(si AS BIGINT) AS session_idx, count(*) AS n_events,
        |       min(us) AS start_us, max(us) AS end_us,
        |       round(sum("value"), 4) AS sum_value
        |FROM s GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // Gap sessionization (24 h split, strictly-greater rule, microsecond-
    // integer compare): one row per (user, session) with bounds + aggregates.
    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, "value",
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > 86400000000 THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS si
        |  FROM g)
        |SELECT user_id, CAST(si AS BIGINT) AS session_idx, count(*) AS n_events,
        |       min(ts) AS t_start, max(ts) AS t_end,
        |       round(sum("value"), 4) AS sum_value
        |FROM s GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "cdc_lww_window" ->
      """WITH feed AS (
        |  SELECT event_id AS lsn,
        |         'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS turn_idx,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_type AS role,
        |         event_type || '#' || CAST(event_id AS VARCHAR) AS text,
        |         "value"
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
        |  FROM feed)
        |SELECT conv_id, turn_idx, role, text, "value"
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY conv_id, turn_idx""".stripMargin,
    "cdc_route_counts" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'retry'
        |            WHEN "value" >= 300.0 THEN 'failure'
        |            ELSE 'success' END AS relationship, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY relationship""".stripMargin,
    "agg_count_by_type" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "agg_sum_value" ->
      """SELECT user_id, round(sum("value"), 4) AS total, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_page_concat" ->
      """SELECT user_id, string_agg(event_type, chr(10) ORDER BY event_id) AS pages
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "filter_status_range" ->
      """SELECT event_id, event_type, "value" FROM events
        |WHERE ("value" BETWEEN 200.0 AND 299.0) OR "value" = 304.0
        |ORDER BY event_id""".stripMargin,
    "project_prune" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "json_extract_k" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "coalesce_override" ->
      """SELECT event_id, coalesce(json_extract_string(props, '$.missing'), event_type) AS resolved
        |FROM events ORDER BY event_id""".stripMargin,
    "format_detect" ->
      """SELECT doc_id,
        |       regexp_matches(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') AS has_email,
        |       regexp_matches(text, '\d{4}-\d{2}-\d{2}') AS has_date,
        |       regexp_matches(text, '(https?|ftp)://') AS has_uri
        |FROM documents ORDER BY doc_id""".stripMargin,
    "window_topk_per_user" ->
      """SELECT user_id, event_id, "value" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY "value" DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3
        |ORDER BY user_id, event_id""".stripMargin,
    "sort_limit_topk" ->
      """SELECT event_id, "value" FROM events
        |ORDER BY "value" DESC, event_id LIMIT 10""".stripMargin,
    "window_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
        |       count(*) AS n, round(sum("value"), 4) AS total
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    "set_union_pages" ->
      """SELECT * FROM (
        |  SELECT event_id, 'p1' AS page FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, 'p2' AS page FROM events WHERE "value" > 150.0)
        |ORDER BY page, event_id""".stripMargin,
    "split_mx" ->
      """SELECT event_id,
        |       CAST(split_part(CAST(user_id AS VARCHAR) || ' ' || event_type, ' ', 1) AS INTEGER) AS prio,
        |       split_part(CAST(user_id AS VARCHAR) || ' ' || event_type, ' ', 2) AS host
        |FROM events ORDER BY event_id""".stripMargin,
    "base64_auth" ->
      """SELECT event_id, to_base64(encode(event_type || ':' || CAST(user_id AS VARCHAR))) AS auth
        |FROM events ORDER BY event_id""".stripMargin,
    "txt_join_frag" ->
      """SELECT doc_id, array_to_string(string_split(text, ' ')[1:5], '') AS frag
        |FROM documents ORDER BY doc_id""".stripMargin,
    "join_dim_broadcast" ->
      """SELECT r_name, count(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_anti_orders" ->
      """SELECT count(*) AS n FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, n_chars,
        |       len(string_split(text, ' ')) AS n_words,
        |       round(len(list_filter(string_split(text, ' '),
        |             x -> x IN ('the','a','of','to','and','in','is'))) * 1.0
        |             / len(string_split(text, ' ')), 4) AS stopword_ratio,
        |       round(len(regexp_extract_all(text, '[.,;:!?]')) * 1.0 / n_chars, 4) AS punct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Winnowing fingerprint: min over k=16-char windows of the Horner
    // polynomial hash (base 31, mod 1e9+7) — list_reduce reproduces
    // RollingMinHash's loop bit-exact (text is ASCII, so the engine's byte
    // windows == these char windows); texts shorter than 16 hash as one
    // whole-text window, empty text hashes to 0.
    "doc_fingerprint" ->
      """SELECT doc_id,
        |       greatest(len(text) - 15, 1) AS n_windows,
        |       CASE WHEN len(text) = 0 THEN 0 ELSE
        |         list_min(list_transform(
        |           range(1, len(text) - least(16, len(text)) + 2), i ->
        |             list_reduce(list_transform(range(0, least(16, len(text))),
        |               j -> CAST(ascii(substr(text, CAST(i + j AS INTEGER), 1)) AS BIGINT)),
        |               (a, x) -> (a * 31 + x) % 1000000007)))
        |       END AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "token_counts" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Disjoint per-language stopword profiles (TextOps.LangProfiles) over
    // the base corpus + deterministic planted fr/de/es docs; argmax with
    // declaration-order tie-break and a ≥2-hit threshold.
    "lang_id" ->
      """WITH corpus AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, 'fr', 'le les et une est pour doc-' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 = 0
        |  UNION ALL
        |  SELECT doc_id + 300000, 'de', 'der die das und ist nicht doc-' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 = 0
        |  UNION ALL
        |  SELECT doc_id + 400000, 'es', 'el los que y para como doc-' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 = 0),
        |c AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x IN ('the','a','of','to','and','in','is'))) AS c_en,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x IN ('le','les','et','une','est','pour'))) AS c_fr,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x IN ('der','die','das','und','ist','nicht'))) AS c_de,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x IN ('el','los','que','y','para','como'))) AS c_es
        |  FROM corpus)
        |SELECT doc_id, lang,
        |  CASE WHEN c_en >= c_fr AND c_en >= c_de AND c_en >= c_es AND c_en >= 2 THEN 'en'
        |       WHEN c_fr >= c_de AND c_fr >= c_es AND c_fr >= 2 THEN 'fr'
        |       WHEN c_de >= c_es AND c_de >= 2 THEN 'de'
        |       WHEN c_es >= 2 THEN 'es'
        |       ELSE 'unk' END AS pred
        |FROM c ORDER BY doc_id""".stripMargin,
    "dedup_embedding" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |allv AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000, v FROM base WHERE vec_id % 25 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.999
        |ORDER BY id_a, id_b""".stripMargin,
    "pagination_follow" ->
      """WITH RECURSIVE pages AS (
        |  SELECT user_id % 50 AS chain, event_id,
        |         row_number() OVER (PARTITION BY user_id % 50 ORDER BY event_id) AS seq,
        |         count(*) OVER (PARTITION BY user_id % 50) AS cnt
        |  FROM events),
        |p AS (
        |  SELECT chain, seq,
        |         'pg-' || chain || '-' || seq AS id,
        |         'v' || CAST(event_id AS VARCHAR) AS val,
        |         CASE WHEN seq < cnt THEN 'pg-' || chain || '-' || (seq + 1) END AS next
        |  FROM pages),
        |walk AS (
        |  SELECT chain, val, next, 1 AS depth FROM p WHERE seq = 1
        |  UNION ALL
        |  SELECT p.chain, p.val, p.next, w.depth + 1
        |  FROM walk w JOIN p ON p.id = w.next
        |  WHERE w.depth < 10)
        |SELECT chain, count(*) AS n_pages,
        |       string_agg(val, ',' ORDER BY depth) AS combined
        |FROM walk GROUP BY chain ORDER BY chain""".stripMargin,
    "odata_page_combine" ->
      """WITH pages AS (
        |  SELECT user_id % 50 AS chain, event_id AS page_no,
        |         [CAST(event_id AS VARCHAR), CAST(event_id * 2 AS VARCHAR)] AS value,
        |         '$metadata#chain-' || CAST(user_id % 50 AS VARCHAR) AS ctx
        |  FROM events)
        |SELECT chain, count(*) AS n_pages,
        |       arg_min(ctx, page_no) AS ctx,
        |       array_to_string(flatten(list(value ORDER BY page_no)), ',') AS combined
        |FROM pages GROUP BY chain ORDER BY chain""".stripMargin,
    "ldif_render" ->
      """WITH n AS (
        |  SELECT event_id,
        |         event_type,
        |         CASE WHEN event_id % 3 = 0 THEN ' leading-' || event_type
        |              ELSE event_type END AS note
        |  FROM events)
        |SELECT event_id,
        |       concat_ws(chr(10),
        |         'dn: uid=' || CAST(event_id AS VARCHAR) || ',ou=events,dc=example,dc=com',
        |         'objectClass: event',
        |         'eventType: ' || event_type,
        |         CASE WHEN starts_with(note, ' ')
        |              THEN 'note:: ' || to_base64(encode(note))
        |              ELSE 'note: ' || note END) AS ldif
        |FROM n ORDER BY event_id""".stripMargin,
    "dns_shape" ->
      """WITH q AS (
        |  SELECT event_id,
        |         ['A','AAAA','MX','TXT','NS','CNAME','PTR','SOA','SRV']
        |           [CAST(event_id % 9 AS INTEGER) + 1] AS qtype
        |  FROM events),
        |r AS (
        |  SELECT event_id, qtype,
        |         CASE WHEN qtype = 'A' THEN
        |                CASE WHEN event_id % 2 = 0 THEN '10.0.0.' || CAST(event_id % 256 AS VARCHAR)
        |                     ELSE 'alias-' || CAST(event_id AS VARCHAR) || '.example.com' END
        |              WHEN qtype = 'AAAA' THEN '2001:db8::' || CAST(event_id % 16 AS VARCHAR)
        |              WHEN qtype = 'MX' THEN
        |                CASE WHEN event_id % 45 = 2
        |                     THEN 'badprio mx-' || CAST(event_id AS VARCHAR) || '.example.com'
        |                     ELSE CAST(event_id % 100 AS VARCHAR) || ' mx-' ||
        |                          CAST(event_id AS VARCHAR) || '.example.com' END
        |              WHEN qtype = 'TXT' THEN 'txt-fragment-' || CAST(event_id AS VARCHAR)
        |              WHEN qtype = 'NS' THEN 'ns' || CAST(event_id % 4 AS VARCHAR) || '.example.com'
        |              WHEN qtype = 'CNAME' THEN 'target-' || CAST(event_id AS VARCHAR) || '.example.com'
        |              WHEN qtype = 'PTR' THEN 'host-' || CAST(event_id % 64 AS VARCHAR) || '.example.com'
        |              WHEN qtype = 'SOA' THEN 'ns1.example.com. admin.example.com. ' ||
        |                   CAST(event_id AS VARCHAR) || ' 3600 900 604800 86400'
        |              ELSE CAST(event_id % 10 AS VARCHAR) || ' 5 ' ||
        |                   CAST(8000 + event_id % 100 AS VARCHAR) || ' srv-' ||
        |                   CAST(event_id AS VARCHAR) || '.example.com' END AS raw
        |  FROM q)
        |SELECT event_id, qtype, raw,
        |       CASE WHEN qtype = 'A' AND regexp_matches(raw, '^\d+\.\d+\.\d+\.\d+$')
        |            THEN raw END AS ip,
        |       CASE WHEN qtype = 'A' AND NOT regexp_matches(raw, '^\d+\.\d+\.\d+\.\d+$')
        |            THEN raw END AS cname,
        |       CASE WHEN qtype = 'MX' AND regexp_matches(split_part(raw, ' ', 1), '^\d+$')
        |            THEN CAST(split_part(raw, ' ', 1) AS INTEGER) END AS mx_prio,
        |       CASE WHEN qtype = 'MX' AND regexp_matches(split_part(raw, ' ', 1), '^\d+$')
        |            THEN split_part(raw, ' ', 2) END AS mx_host,
        |       CASE WHEN qtype = 'MX' AND NOT regexp_matches(split_part(raw, ' ', 1), '^\d+$')
        |            THEN raw END AS mx_record,
        |       CASE WHEN qtype IN ('NS','CNAME','PTR') THEN raw END AS target,
        |       CASE WHEN qtype = 'SOA' THEN CAST(split_part(raw, ' ', 3) AS BIGINT) END AS soa_serial,
        |       CASE WHEN qtype = 'SRV' THEN CAST(split_part(raw, ' ', 3) AS INTEGER) END AS srv_port,
        |       CASE WHEN qtype = 'SRV' THEN split_part(raw, ' ', 4) END AS srv_target
        |FROM r ORDER BY event_id""".stripMargin,
    // Auth modes + token chain: the oracle computes the same extracted
    // token scalar the Spark side pulls out of the lowercased response
    // header MAP (the map plumbing is Spark-side; values must agree).
    "auth_token_chain" ->
      """WITH x AS (
        |  SELECT event_id, event_type, user_id,
        |         ['None','Basic Authentication','Bearer Token','API Key','Custom']
        |           [CAST(event_id % 5 AS INTEGER) + 1] AS auth_type,
        |         CASE WHEN event_id % 3 = 0 THEN md5(CAST(event_id AS VARCHAR)) END AS next_token
        |  FROM events)
        |SELECT event_id, auth_type,
        |       CASE WHEN auth_type IN ('Basic Authentication','Bearer Token') THEN 'Authorization'
        |            WHEN auth_type = 'API Key' THEN 'X-API-Key'
        |            WHEN auth_type = 'Custom' THEN 'X-Custom-Auth' END AS auth_header,
        |       CASE WHEN auth_type = 'Basic Authentication'
        |              THEN 'Basic ' || to_base64(encode(event_type || ':' || CAST(user_id AS VARCHAR)))
        |            WHEN auth_type = 'Bearer Token'
        |              THEN 'Bearer ' || coalesce(next_token, 'cfg-token-0')
        |            WHEN auth_type = 'API Key' THEN 'key-' || CAST(user_id AS VARCHAR)
        |            WHEN auth_type = 'Custom' THEN md5(event_type) END AS auth_value,
        |       next_token
        |FROM x ORDER BY event_id""".stripMargin,
    "sim_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT qid, vec_id AS nid,
        |         round(list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])), 4) AS cos
        |  FROM embeddings, q WHERE vec_id <> qid)
        |SELECT qid, nid, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        |  FROM pairs) WHERE rn <= 5
        |ORDER BY qid, nid""".stripMargin
  )
}
