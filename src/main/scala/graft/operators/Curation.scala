package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Staged, Tables}

/** Corpus-curation composites — the end-to-end shapes a 100 TB training-
  * data pipeline actually runs, composed from the catalog operators:
  * quality gating + language selection + near-dup exclusion, deterministic
  * stratified sampling for data mixing, and token-budget shard packing.
  * All deterministic and DuckDB-oracle-exact (integer arithmetic, md5-based
  * pseudo-randomness, total ordering).
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  /** X6 — curation pipeline: keep en/de/es documents in a token-length
    * band, drop every near-duplicate pair member except its lowest-id
    * representative (using the same rare-5-gram Jaccard candidates as
    * x2c), and emit the surviving corpus with its quality features.
    * The "would a user of the reference switch" query: filter → near-dup
    * anti-join → project, one declarative plan.
    */
  /** Run-A curation config (the x6 gate), shared by x6/x6Sql and the
    * x6i diff's run-A side so "diff vs the x6 config" can never silently
    * drift from the config it claims to compare against (the
    * splitValPct / x2cCtePrefix sharing discipline).
    */
  val curationLangsA: Seq[String] = Seq("en", "de", "es")
  val curationBandA: (Int, Int) = (20, 90)
  private def curationLangsASql: String =
    curationLangsA.map(l => s"'$l'").mkString(", ")

  val x6Curation: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val kept = docs
      .filter(col("lang").isin(curationLangsA: _*))
      .filter(col("n_tokens").between(curationBandA._1, curationBandA._2))
    // near-dup members (da < db): db is the duplicate to drop. The pair
    // table is staged (graft.Staged) — built once per session and shared
    // with x2c instead of re-running the whole Jaccard pipeline here.
    val dupPairs = Text.stagedJaccardPairs(spark, dir).select(col("db").as("dup_id"))
    kept.join(dupPairs, kept("doc_id") === dupPairs("dup_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_chars"))
      .orderBy(col("doc_id"))
  }
  val x6Sql: String = {
    // reuse the exact x2c candidate/verify CTE chain, then anti-join
    Text.x2cCtePrefix() + ",\n" +
      """dups AS (
        | SELECT DISTINCT db AS dup_id
        | FROM shared JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
        | WHERE shared * 10 >= (ca.n + cb.n - shared) * 7)
        |SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, n_chars
        |FROM documents
        |WHERE lang IN (""".stripMargin + curationLangsASql + s""")
        | AND len(string_split(text, ' ')) BETWEEN ${curationBandA._1} AND ${curationBandA._2}
        | AND NOT EXISTS (SELECT 1 FROM dups WHERE dup_id = doc_id)
        |ORDER BY doc_id""".stripMargin
  }

  /** X6b — deterministic stratified sample: k documents per language,
    * selected by md5 order (portable pseudo-randomness — same "random"
    * sample in any engine, any run).
    *
    * Two-phase top-k: a language has ~corpus/5 documents, so a window
    * partitioned by `lang` alone is one task per language at any scale.
    * Phase 1 ranks within (lang, hash-bucket) — `subBuckets` parallel
    * tasks per language, each emitting ≤ k rows; phase 2 ranks the
    * ≤ subBuckets·k survivors per language (tiny). Global top-k = top-k
    * of the union of per-bucket top-ks, so the output is IDENTICAL to the
    * single-window formulation — same oracle SQL.
    */
  def stratifiedSample(docs: DataFrame, k: Int, subBuckets: Int = 16): DataFrame = {
    val keyed = docs
      .withColumn("skey", md5(concat(lit("samp:"), col("doc_id").cast("string"))))
      .withColumn("bkt", pmod(xxhash64(col("doc_id")), lit(subBuckets)))
    val w1 = Window.partitionBy(col("lang"), col("bkt"))
      .orderBy(col("skey"), col("doc_id"))
    val w2 = Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))
    keyed
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("lang"), col("rn"), col("doc_id"))
  }

  val x6bStratifiedSample: Q = (spark, dir) =>
    stratifiedSample(Tables.documents(spark, dir), k = 20)
      .orderBy(col("lang"), col("rn"))
  val x6bSql: String =
    """SELECT lang, CAST(rn AS INT) AS rn, doc_id FROM (
      | SELECT lang, doc_id,
      |  row_number() OVER (PARTITION BY lang
      |    ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      | FROM documents)
      |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin

  /** X6c — token-budget shard packing: stream documents in id order per
    * language, cut a new shard whenever the running token count passes the
    * budget — the batch approximation of sequence packing. Integer-exact.
    *
    * Two-phase prefix sum (a running total partitioned by `lang` alone
    * would be one full-sort task per language at scale): bucket by
    * CONTIGUOUS doc_id range (floor(doc_id / bucketWidth) — ranges, not
    * hashes, so per-bucket prefix sums compose), compute the local running
    * total per (lang, bucket) in parallel, then add each bucket's offset =
    * the sum of all earlier buckets' totals (a window over #buckets rows,
    * tiny, broadcast-joined back). Identical output to the single-window
    * formulation — same oracle SQL.
    */
  def tokenPacking(docs: DataFrame, budget: Long,
      bucketWidth: Long = 500L,
      nTokensCol: Option[String] = None): DataFrame = {
    val counted = nTokensCol match {
      // a precomputed per-doc count (e.g. the BPE tokenizer's actual
      // sequence length, x9c) replaces the whitespace proxy
      case Some(c) => docs.withColumn("n_tokens", col(c).cast("long"))
      case None =>
        docs.withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    }
    val keyed = counted
      .withColumn("bkt", (col("doc_id") / bucketWidth).cast("long"))
    val w1 = Window.partitionBy(col("lang"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("local_cum", sum(col("n_tokens")).over(w1))
    val wOff = Window.partitionBy(col("lang")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("lang"), col("bkt"))
      .agg(sum(col("n_tokens")).as("btot"))
      .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select(col("lang"), col("bkt"), col("off"))
    local.join(broadcast(offsets), Seq("lang", "bkt"))
      .withColumn("cum_tokens", col("local_cum") + col("off"))
      .withColumn("shard", ((col("cum_tokens") - 1) / budget).cast("long"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
  }

  val x6cTokenPacking: Q = (spark, dir) =>
    tokenPacking(Tables.documents(spark, dir), budget = 2000L)
      .orderBy(col("lang"), col("shard"))
  val x6cSql: String =
    """WITH t AS (
      | SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      | FROM documents),
      |c AS (
      | SELECT lang, doc_id, n_tokens,
      |  sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      | FROM t)
      |SELECT lang, CAST((cum_tokens - 1) // 2000 AS BIGINT) AS shard,
      | CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** X6e — quality-weighted Bernoulli sampling: keep each document with
    * probability proportional to a quality weight (here min(1, n_tokens /
    * `cap`) — longer docs more likely kept), decided by a deterministic
    * per-document coin: the first 8 md5 hex digits as a uint32. The keep
    * test `h32 · cap < n_tokens · 2³²` is ALL-INTEGER — exact in both
    * engines, no float threshold to disagree on — and depends only on
    * doc_id, so the sample is identical across runs, partitionings, and
    * engines (the importance-sampling analogue of x6b's md5 ranking).
    *
    * Scale: pure per-row expression work, zero shuffle — the filter
    * composes with any scan.
    */
  def weightedSample(docs: DataFrame, cap: Long = 100L): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("h32", expr(
        "CAST(conv(substr(md5(CAST(concat('w:', CAST(doc_id AS STRING)) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"))
      .filter(col("h32") * cap < col("n_tokens") * 4294967296L)
      .select(col("doc_id"), col("lang"), col("n_tokens"))

  val x6eWeightedSample: Q = (spark, dir) =>
    weightedSample(Tables.documents(spark, dir)).orderBy(col("doc_id"))
  val x6eSql: String =
    """WITH d AS (SELECT doc_id, lang,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
      | FROM documents)
      |SELECT doc_id, lang, n_tokens FROM d
      |WHERE h32 * 100 < n_tokens * 4294967296
      |ORDER BY doc_id""".stripMargin

  /** X6f — deterministic training-order shuffle: the terminal step of a
    * data pipeline materializes the curated corpus into N shard files in
    * pseudo-random order (so consecutive training batches are not
    * correlated by crawl/source order). Seeded md5 coin per document:
    * shard = top-32-bits mod N (uniform by construction — no shard can be
    * hot, whatever the key distribution), within-shard position = rank by
    * the same coin. One task per shard sorts |corpus|/N rows — exactly the
    * shape of the shard writer that materializes the file, so the
    * per-shard window IS the output stage, not an extra pass. Identical
    * output for any input partitioning, any engine (all-integer/md5).
    */
  def corpusShuffle(docs: DataFrame, shards: Int,
      seed: String = "shuf"): DataFrame = {
    val coin = expr(
      s"md5(CAST(concat('$seed:', CAST(doc_id AS STRING)) AS BINARY))")
    val wS = Window.partitionBy(col("shard")).orderBy(col("__coin"), col("doc_id"))
    // payload columns ride along (that's what a shard writer materializes;
    // Catalyst prunes any a consumer doesn't use) — so a consumer like the
    // x9b manifest never has to join the input subtree back onto its own
    // output, which would plan the whole upstream pipeline twice.
    // Internals are __-prefixed so a payload column can never be silently
    // overwritten; the two output names the operator mints are guarded.
    require(Seq("shard", "pos", "__coin", "__h32")
        .forall(!docs.columns.contains(_)),
      "corpusShuffle emits 'shard' and 'pos' and uses '__coin'/'__h32' " +
        "internally; rename the input's columns")
    val carried = docs.columns.filterNot(_ == "doc_id").map(col)
    docs
      .withColumn("__coin", coin)
      .withColumn("__h32", expr(
        "CAST(conv(substr(__coin, 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("shard", pmod(col("__h32"), lit(shards)).cast("int"))
      .withColumn("pos", row_number().over(wS).cast("long"))
      .select(Seq(col("shard"), col("pos"), col("doc_id")) ++ carried: _*)
  }

  /** X6g — curriculum ORDER: a deterministic short-to-long training
    * order (the classic length-based curriculum — models see easy/short
    * sequences first), with an md5 coin breaking length ties so
    * same-length documents interleave pseudo-randomly instead of by
    * ingest order. Global positions come from the two-phase
    * partition-offset ranking ([[Partitioning.ordinalIds]]), so no
    * single task ever sorts the corpus — the `row_number() OVER (ORDER
    * BY ...)` the oracle uses IS the formulation this replaces at
    * 100 TB. Composes with x6f: curriculum for epoch 0, seeded shuffle
    * for later epochs.
    */
  val x6gCurriculum: Q = (spark, dir) => {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("coin",
        md5(concat(lit("cur:"), col("doc_id").cast("string")).cast("binary")))
    graft.operators.Partitioning.ordinalIds(d,
        Seq(col("n_tokens"), col("coin"), col("doc_id")), "pos")
      .select(col("doc_id"), col("n_tokens"), col("pos"))
      .orderBy(col("pos"))
  }
  val x6gSql: String =
    """WITH d AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  md5('cur:' || CAST(doc_id AS VARCHAR)) AS coin
      | FROM documents)
      |SELECT doc_id, n_tokens,
      | CAST(row_number() OVER (ORDER BY n_tokens, coin, doc_id) AS BIGINT) AS pos
      |FROM d ORDER BY pos""".stripMargin

  val x6fCorpusShuffle: Q = (spark, dir) =>
    corpusShuffle(Tables.documents(spark, dir), shards = 8)
      .select(col("shard"), col("pos"), col("doc_id")) // prune the payload
      .orderBy(col("shard"), col("pos"))
  val x6fSql: String =
    """WITH d AS (SELECT doc_id,
      |  md5('shuf:' || CAST(doc_id AS VARCHAR)) AS coin,
      |  CAST(CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT) AS shard
      | FROM documents)
      |SELECT shard,
      | CAST(row_number() OVER (PARTITION BY shard ORDER BY coin, doc_id) AS BIGINT) AS pos,
      | doc_id
      |FROM d ORDER BY shard, pos""".stripMargin

  /** X6h — LEAKAGE-SAFE train/validation split: the assignment unit is
    * the near-dup CLUSTER, not the document. A per-document hash split
    * puts one member of a near-duplicate pair in train and its twin in
    * val — the classic evaluation leak: the model is scored on data it
    * effectively trained on. Hashing the cluster REPRESENTATIVE instead
    * (min-id label from the x7 connected components; singletons are
    * their own group) moves whole components together, so no near-dup
    * relation ever crosses the boundary. The coin is the repo's portable
    * md5 convention (x6b/x6e): first 8 hex digits as uint32, mod 100 —
    * same assignment in any engine, any run, any partitioning.
    *
    * Scale: the cluster map is bounded by near-dup membership (≪ corpus)
    * and broadcasts; the corpus side is scan + hash-probe + projection —
    * no shuffle at any SF. The md5 coin is computed once per GROUP only
    * conceptually — per row it is a codegen'd scalar on the (tiny)
    * group id, far cheaper than moving data.
    */
  val splitValPct = 10

  /** The portable split coin on a GROUP id: first 8 md5 hex digits as a
    * uint32, mod 100 → 'val' below `valPct`, else 'train' (the x6b/x6e
    * md5 convention — identical verdict in any engine/partitioning).
    * Shared by the batch split (x6h) and the durable registry (T33) so
    * the two surfaces cannot drift.
    */
  def splitOf(grp: Column, valPct: Int = splitValPct): Column =
    when(pmod(
        conv(substring(md5(concat(lit("split:"), grp.cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long"),
        lit(100)) < valPct,
      lit("val")).otherwise(lit("train"))

  def leakageSplit(docs: DataFrame, clusters: DataFrame,
      valPct: Int = splitValPct): DataFrame =
    docs.join(broadcast(clusters), docs("doc_id") === clusters("node"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("cluster"), col("doc_id")).as("grp"))
      .select(col("doc_id"), col("lang"), col("grp"),
        splitOf(col("grp"), valPct).as("split"))

  val x6hLeakageSplit: Q = (spark, dir) =>
    leakageSplit(Tables.documents(spark, dir),
      Graph.stagedClusters(spark, dir)).orderBy(col("doc_id"))
  val x6hSql: String = Graph.ccCtes + s"""
      |SELECT doc_id, lang, coalesce(cluster, doc_id) AS grp,
      | CASE WHEN CAST(('0x' || substr(md5('split:' ||
      |    CAST(coalesce(cluster, doc_id) AS VARCHAR)), 1, 8)) AS BIGINT)
      |    % 100 < $splitValPct
      |  THEN 'val' ELSE 'train' END AS split
      |FROM documents LEFT JOIN cc ON doc_id = node
      |ORDER BY doc_id""".stripMargin

  /** X6i — CURATION-RUN DIFF with reason attribution: when a corpus
    * config changes (language set, length band), the operational question
    * is not "what is the new corpus" but "which documents moved, and
    * WHY" — at 100 TB a silent 12% corpus shrink between runs is a
    * pipeline incident, and answering it by re-reading documents is the
    * wrong plan. The diff evaluates BOTH runs' predicates on each row in
    * ONE scan (no join of two materialized corpora, no second pass):
    * per doc, membership in run A (the x6 config: en/de/es, 20–90
    * tokens, near-dup members dropped) and run B (the revised config:
    * es swapped for fr, band tightened below and loosened above,
    * 25–100), then status ∈ kept/removed/added with the flipped
    * predicate attributed in fixed order (lang before len; the shared
    * dedup rule can never differ). Docs in neither run are not the
    * diff's business and are excluded.
    *
    * Scale: one corpus scan + the broadcast dup-id probe both runs
    * share; the usual consumer aggregates to (status, reason) counts —
    * map-side combined, a handful of rows — but the per-doc form is the
    * operator (the counts are a trivial groupBy over it).
    */
  val x6iCurationDiff: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val dup = Text.stagedJaccardPairs(spark, dir)
      .select(col("db").as("dup_id")).distinct()
    val langA = col("lang").isin(curationLangsA: _*)
    val langB = col("lang").isin("en", "de", "fr")
    docs.join(broadcast(dup), docs("doc_id") === dup("dup_id"), "left")
      .withColumn("is_dup", col("dup_id").isNotNull)
      .withColumn("in_a",
        langA && col("n_tokens").between(curationBandA._1, curationBandA._2)
          && !col("is_dup"))
      .withColumn("in_b",
        langB && col("n_tokens").between(25, 100) && !col("is_dup"))
      .filter(col("in_a") || col("in_b"))
      .select(col("doc_id"),
        when(col("in_a") && col("in_b"), "kept")
          .when(col("in_a"), "removed").otherwise("added").as("status"),
        when(col("in_a") && col("in_b"), lit(null).cast("string"))
          .when(langA =!= langB, "lang").otherwise("len").as("reason"))
      .orderBy(col("doc_id"))
  }
  val x6iSql: String =
    Text.x2cCtePrefix() + ",\n" +
      """dups AS (
        | SELECT DISTINCT db AS dup_id
        | FROM shared JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
        | WHERE shared * 10 >= (ca.n + cb.n - shared) * 7),
        |d AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  EXISTS (SELECT 1 FROM dups WHERE dup_id = doc_id) AS is_dup
        | FROM documents),
        |f AS (SELECT doc_id,
        |  (lang IN (""".stripMargin + curationLangsASql + s""") AND n_tokens BETWEEN ${curationBandA._1} AND ${curationBandA._2}
        |    AND NOT is_dup) AS in_a,
        |  (lang IN ('en','de','fr') AND n_tokens BETWEEN 25 AND 100
        |    AND NOT is_dup) AS in_b,
        |  (lang IN (""".stripMargin + curationLangsASql + """)) <> (lang IN ('en','de','fr')) AS lang_flip
        | FROM d)
        |SELECT doc_id,
        | CASE WHEN in_a AND in_b THEN 'kept'
        |      WHEN in_a THEN 'removed' ELSE 'added' END AS status,
        | CASE WHEN in_a AND in_b THEN NULL
        |      WHEN lang_flip THEN 'lang' ELSE 'len' END AS reason
        |FROM f WHERE in_a OR in_b ORDER BY doc_id""".stripMargin

  /** X9 — the complete curation pipeline as ONE declarative plan, composed
    * from the catalog operators the way a user would actually run them:
    *
    *   1. quality gate (token floor),
    *   2. near-dup DEDUP APPLY — keep one representative per connected
    *      component of the verified pair graph (x7f semantics, broadcast
    *      cluster map),
    *   3. benchmark DECONTAMINATION — drop docs sharing any shingle with
    *      the benchmark split (x7e semantics, broadcast bench set),
    *   4. token-budget SHARD PACKING over the survivors (x6c's two-phase
    *      prefix sum).
    *
    * Every intermediate feeds from the session-staged tables (shingles,
    * cluster map), so the composite adds no producer re-runs — the whole
    * chain is gate-filter + two broadcast probes + the packing shuffle.
    * The oracle twin replays the identical chain in SQL (recursive-CTE
    * closure for clusters, single-window prefix sum for packing).
    */
  /** The pipeline's kept set (steps 1–3), shared by both composites so
    * the x9/x9b surfaces cannot drift from each other.
    */
  private def keptDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val gated = docs.filter(col("n_tokens") >= 5)
    val cc = Graph.stagedClusters(spark, dir)
    val deduped = gated
      .join(broadcast(cc), gated("doc_id") === cc("node"), "left")
      .filter(col("node").isNull || col("doc_id") === col("cluster"))
      .select(gated.columns.map(col): _*)
    val sh = Text.stagedShingles(spark, dir)
    val bench = sh.filter(col("doc_id") < 50).select(col("hs")).distinct()
    // no distinct() on the contaminated ids: an anti-join tests existence,
    // so deduplicating its right side is a wasted aggregate + Exchange
    val contaminated = sh.filter(col("doc_id") >= 50)
      .join(broadcast(bench), "hs").select(col("doc_id"))
    deduped.filter(col("doc_id") >= 50)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  val x9Pipeline: Q = (spark, dir) =>
    tokenPacking(keptDocs(spark, dir), budget = 2000L)
      .orderBy(col("lang"), col("shard"))

  /** X9d — x9's INCREMENTAL twin: the same gate → cluster-dedup →
    * decontaminate → pack terminal, fed per CRAWL INCREMENT from the
    * maintained stores instead of a kept-corpus rescan. Documents
    * arrive in three increments (pmod split); each increment pays only
    * increment-sized work — the token gate, and decontamination as a
    * BLOOM PRE-FILTER against the static benchmark sketch (the T15
    * artifact; a plan-literal probe, no join for the clean majority)
    * followed by an EXACT confirm of the few flagged docs against the
    * broadcast bench set (no false negatives, so bloom→confirm ≡ the
    * exact anti-join and the oracle stays exact). Cluster state is the
    * MAINTAINED x7j delta-CC map (the T17 inline twin) — and because a
    * later increment can merge clusters and dethrone an
    * already-arrived representative, representativeness is evaluated
    * at SERVE time against the current map, never frozen at arrival
    * (the T33 registry documents the frozen-coin alternative and why a
    * training-data kept set must NOT use it). The packed manifest is
    * therefore IDENTICAL to batch x9's — oracle x9Sql VERBATIM (the
    * q32b/x4t discipline) — while no step ever rescans the kept
    * corpus.
    *
    * Scale: per increment — one gate scan of the increment, one bloom
    * probe of its shingles, one broadcast confirm join; the cluster
    * fold is the x7j increment cost. The serve is one broadcast probe
    * of the bounded cluster map plus the packing shuffle.
    */
  private def stagedIncrKept(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"x9d_kept:$dir") {
      import graft.functions.BloomMembership
      val docs = Tables.documents(spark, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      val sh = Text.stagedShingles(spark, dir)
      // the static benchmark artifact: exact set (broadcast confirm
      // side) + its bloom sketch (the T15 pre-filter, sized from the
      // measured count — bloomDecontaminate's discipline)
      val bench = sh.filter(col("doc_id") < 50).select(col("hs"))
        .distinct().localCheckpoint()
      val nB = math.max(1L, bench.count())
      val sketch = bench
        .agg(BloomMembership.bloomAgg(col("hs"), nB,
          BloomMembership.bitsFor(nB, 1e-5)).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      val keptPreDedup = (0 until 3).map { i =>
        val inc = docs.filter(pmod(col("doc_id"), lit(3)) === i)
        val gated = inc.filter(col("n_tokens") >= 5 && col("doc_id") >= 50)
        val flagged = sh
          .filter(pmod(col("doc_id"), lit(3)) === i && col("doc_id") >= 50)
          .filter(BloomMembership.mightContain(sketch, col("hs")))
        // exact confirm bounded by the bloom hits — no distinct(): the
        // anti-join tests existence (the keptDocs discipline)
        val contaminated = flagged.join(broadcast(bench), "hs")
          .select(col("doc_id"))
        gated.join(contaminated, Seq("doc_id"), "left_anti")
          .localCheckpoint()
      }.reduce(_ unionByName _)
      val ccMap = Graph.stagedIncrClusterMap(spark, dir)
      keptPreDedup.join(broadcast(ccMap),
          keptPreDedup("doc_id") === ccMap("node"), "left")
        .filter(col("node").isNull || col("doc_id") === col("cluster"))
        .select(keptPreDedup.columns.map(col): _*)
    }

  val x9dIncrPipeline: Q = (spark, dir) =>
    tokenPacking(stagedIncrKept(spark, dir), budget = 2000L)
      .orderBy(col("lang"), col("shard"))

  /** CTE chain for the kept set — the oracle twin of [[keptDocs]],
    * shared by x9 and x9b via concatenation (same discipline as
    * `Text.x2cCtePrefix`).
    */
  private val x9Ctes: String = Graph.ccCtes + """,
      |bench AS (SELECT DISTINCT hs FROM sh WHERE doc_id < 50),
      |contam AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (hs) WHERE doc_id >= 50),
      |kept AS (
      | SELECT d.lang, d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
      | FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
      | WHERE len(string_split(d.text, ' ')) >= 5
      |  AND (cc.node IS NULL OR d.doc_id = cc.cluster)
      |  AND d.doc_id >= 50
      |  AND NOT EXISTS (SELECT 1 FROM contam WHERE contam.doc_id = d.doc_id))""".stripMargin

  val x9Sql: String = x9Ctes + """,
      |run AS (
      | SELECT lang, doc_id, n_tokens,
      |  sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      | FROM kept)
      |SELECT lang, CAST((cum_tokens - 1) // 2000 AS BIGINT) AS shard,
      | CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
      |FROM run GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** X9b — the pipeline's TERMINAL step: the curated kept set shuffled
    * into training order (x6f's seeded permutation) and summarized as a
    * shard manifest — docs, tokens, and the first document each shard
    * file would start with. Composition proof: gate → dedup →
    * decontaminate → shuffle, one declarative plan over the same staged
    * intermediates as x9.
    */
  val x9bShuffleManifest: Q = (spark, dir) => {
    val kept = keptDocs(spark, dir)
    // n_tokens rides through the shuffle as carried payload — joining
    // `kept` back onto the shuffle output would embed the whole pipeline
    // subtree twice in one plan (measured: three ~1.1 MiB task binaries
    // per run, the only "large task binary" WARNs in the bench tail)
    corpusShuffle(kept.select(col("doc_id"), col("n_tokens")), shards = 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"),
        expr("min_by(doc_id, pos)").as("first_doc"))
      .orderBy(col("shard"))
  }
  val x9bSql: String = x9Ctes + """,
      |sshuf AS (SELECT doc_id, n_tokens,
      |  CAST(CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT) AS shard,
      |  md5('shuf:' || CAST(doc_id AS VARCHAR)) AS coin
      | FROM kept)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      | CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
      | arg_min(doc_id, coin) AS first_doc
      |FROM sshuf GROUP BY 1 ORDER BY 1""".stripMargin

  /** X9c — the pipeline's TOKENIZER-TRUE terminal: pack the kept set
    * into shards by the trained BPE tokenizer's ACTUAL sequence lengths
    * (x4o's per-doc symbol counts) instead of the whitespace proxy x6c
    * and x9 use. The proxy systematically misprices documents whose
    * words fragment into many subwords, so proxy-budgeted shards
    * overflow the real token budget downstream; packing by tokenizer
    * counts is what a training pipeline actually ships. Same two-phase
    * prefix sum (no per-language sort task), encode is the x4o
    * shuffle-free pass over the kept set only.
    */
  val x9cBpePacking: Q = (spark, dir) => {
    val kept = keptDocs(spark, dir)
    // lang rides through the encode as carried payload — joining `kept`
    // back onto the encode output would embed the whole gate + dedup +
    // decontaminate subtree TWICE in one plan (the x9b lesson: measured
    // there as three ~1.1 MiB task binaries per run). The merges list is
    // unused when the staged dict map is supplied, so nothing is
    // collected for it.
    val enc = Text.bpeEncode(
      kept.select(col("doc_id"), col("lang"), col("text")),
      Seq.empty, Some(Text.stagedBpeDictMap(spark, dir)),
      carry = Seq("lang"))
    tokenPacking(
        enc.select(col("doc_id"), col("lang"), col("n_bpe_tokens")),
        budget = 1500L, nTokensCol = Some("n_bpe_tokens"))
      .orderBy(col("lang"), col("shard"))
  }
  val x9cSql: String = {
    val enc = Seq(
      """e0k AS (SELECT k.lang, k.doc_id, array_to_string(list_transform(
        |        regexp_extract_all(d.text, '[a-z0-9]+'),
        |        w2 -> regexp_replace(w2, '(.)', ' \1;', 'g')), '|') AS seq
        |       FROM documents d JOIN kept k ON d.doc_id = k.doc_id)""".stripMargin) ++
      (1 to Text.defaultBpeMerges).map { k =>
        s"""e${k}k AS (SELECT lang, doc_id, replace(seq, ' ' || "left" || '; ' || "right" || ';',
           |         ' ' || merged || ';') AS seq
           |       FROM e${k - 1}k, m$k)""".stripMargin
      } ++ Seq(
      s"""bt AS (SELECT lang, doc_id,
         |        CAST(len(string_split(seq, ' ')) - 1 AS BIGINT) AS n_bpe
         |       FROM e${Text.defaultBpeMerges}k)""".stripMargin,
      """cbt AS (SELECT lang, doc_id, n_bpe,
        |        sum(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM bt)""".stripMargin)
    x9Ctes + ",\n" + Text.bpeCteParts.mkString(",\n") + ",\n" +
      enc.mkString(",\n") + "\n" +
      """SELECT lang, CAST((cum - 1) // 1500 AS BIGINT) AS shard,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_bpe) AS BIGINT) AS shard_tokens
        |FROM cbt GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "x6_curation" -> x6Curation,
    "x6b_stratified_sample" -> x6bStratifiedSample,
    "x6c_token_packing" -> x6cTokenPacking,
    "x6e_weighted_sample" -> x6eWeightedSample,
    "x6f_corpus_shuffle" -> x6fCorpusShuffle,
    "x6g_curriculum" -> x6gCurriculum,
    "x6h_leakage_split" -> x6hLeakageSplit,
    "x6i_curation_diff" -> x6iCurationDiff,
    "x9_pipeline" -> x9Pipeline,
    "x9b_shuffle_manifest" -> x9bShuffleManifest,
    "x9c_bpe_packing" -> x9cBpePacking,
    "x9d_incr_pipeline" -> x9dIncrPipeline)

  val oracle: Map[String, String] = Map(
    "x6_curation" -> x6Sql,
    "x6b_stratified_sample" -> x6bSql,
    "x6c_token_packing" -> x6cSql,
    "x6e_weighted_sample" -> x6eSql,
    "x6f_corpus_shuffle" -> x6fSql,
    "x6g_curriculum" -> x6gSql,
    "x6h_leakage_split" -> x6hSql,
    "x6i_curation_diff" -> x6iSql,
    "x9_pipeline" -> x9Sql,
    "x9b_shuffle_manifest" -> x9bSql,
    "x9c_bpe_packing" -> x9cSql,
    // the q32b/x4t discipline: the incremental serve's oracle IS the
    // batch chain, verbatim — store-fed ≡ rescan, hash-exact
    "x9d_incr_pipeline" -> x9Sql)
}
