package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Staged, Tables}

/** Text-pipeline extensions (SURVEY.md §2.2 X1/X2/X4 + the north-star
  * training-data operators): exact dedup, MinHash+LSH, SimHash, n-gram
  * Jaccard near-dup, language-ID heuristic, quality scoring, token
  * counting, document fingerprinting.
  *
  * Portability discipline: every hash is `md5` (identical lowercase hex in
  * Spark and DuckDB — no engine-specific hash64), every score is either
  * integer-exact or a single mirrored IEEE expression, so the DuckDB oracle
  * matches values exactly.
  *
  * Scale design: everything is explode → hash → groupBy — embarrassingly
  * parallel over documents; candidate generation (LSH bands / rare-shingle
  * join) is the standard prune-then-verify shape so the quadratic step only
  * touches candidate pairs, never the full corpus cross product.
  */
object Text {
  type Q = (SparkSession, String) => DataFrame

  /** Default shingle width. A width parameter is the scale lever: the
    * fixture vocabulary is tiny (~30 words), so 3-grams are hot (document
    * frequency ≈ corpus size / 27k) and would blow up candidate joins
    * quadratically; 5-grams live in a 30⁵ space, keeping per-shingle
    * frequency — and thus the LSH / Jaccard candidate pair count —
    * near-linear in corpus size. Pick the smallest width whose shingle
    * space dwarfs the corpus vocabulary.
    */
  val defaultShingleWidth = 5

  /** Document-frequency cap for Jaccard candidate generation (see
    * [[jaccardPairs]]): shingles shared by more than this many documents
    * never generate candidate pairs, bounding the self-join at ≤ maxDf²
    * rows per shingle regardless of corpus skew.
    */
  val defaultMaxDf = 10

  /** Distinct `width`-token shingles per document (guarded for short docs),
    * each stored as its md5 digest: joins, distinct, and signature slices
    * all run over fixed 32-char keys instead of variable-width phrase
    * strings — less shuffle volume, and md5 is identical in DuckDB so the
    * oracle mirrors it exactly. Columns: (doc_id, hs).
    */
  def shingles(docs: DataFrame, width: Int = defaultShingleWidth): DataFrame = {
    // explode the start INDEX, then build + hash the phrase as ordinary
    // column expressions: a lambda body inside transform() is interpreted
    // per element, while element_at/concat_ws/md5 on the exploded row stay
    // inside whole-stage codegen (measured ~2× on the staging pass)
    val terms = (0 until width).map(o => element_at(col("t"), col("i") + o))
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"), explode(expr(
        s"CASE WHEN size(t) >= $width THEN sequence(1, size(t)-${width - 1}) ELSE array() END"))
        .as("i"))
      .select(col("doc_id"), md5(concat_ws(" ", terms: _*).cast("binary")).as("hs"))
      .distinct()
  }

  /** Staged shingle table (one producer pass, shared by x2/x2c/x6 — see
    * [[graft.Staged]]).
    */
  def stagedShingles(spark: SparkSession, dir: String,
      width: Int = defaultShingleWidth): DataFrame =
    Staged(spark, s"shingles:$width:$dir")(
      shingles(Tables.documents(spark, dir), width))

  private def shinglesCte(width: Int = defaultShingleWidth,
      withKw: String = "WITH"): String = {
    val phrase = (1 to width).map(o => s"t[i+${o - 1}]").mkString(" || ' ' || ")
    s"""$withKw tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest(
       |  CASE WHEN len(t) >= $width
       |   THEN list_transform(generate_series(1, len(t)-${width - 1}),
       |          i -> md5($phrase))
       |   ELSE [] END) AS hs
       | FROM tok)""".stripMargin
  }

  // ------------------------------------------------------------------- X1
  /** Exact dedup with a deterministic representative (min `orderCol` per
    * key group — never dropDuplicates, whose surviving row is
    * partition-order dependent). `orderCol` must be unique within a key
    * group (a row id), which also makes this equal to the row_number
    * formulation.
    *
    * Skew note: a row_number window partitioned by the dup key would put
    * EVERY copy of one duplicated document in a single task — and the hot
    * key is precisely what a dedup operator exists to handle. The min is
    * a map-side-combined groupBy; the semi join back hash-spreads the hot
    * key's copies across their original partitions.
    */
  def dedupExact(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val reps = df.groupBy(keys.map(col): _*).agg(min(col(orderCol)).as(orderCol))
    df.join(reps, keys :+ orderCol, "left_semi")
  }

  val x1DedupExact: Q = (spark, dir) =>
    dedupExact(Tables.documents(spark, dir), Seq("text"), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  val x1Sql: String =
    """SELECT doc_id, lang, n_chars FROM (
      | SELECT doc_id, lang, n_chars,
      |  row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      | FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- X1e fuzzy linkage
  /** The linkage dictionary: clean vocabulary + the synthetic dirty
    * feed, blocked by 3-char prefix — staged once per session, shared
    * by x1e (detect) and x1f (apply).
    */
  private def stagedFuzzyDictionary(spark: SparkSession,
      dir: String): DataFrame =
    Staged(spark, s"fuzzy_dict:$dir") {
      val base = Tables.part(spark, dir)
        .groupBy(lower(col("p_name")).as("name"))
        .agg(count(lit(1)).as("cnt"))
      val clean = base.withColumn("src", lit("clean"))
      val dirty = base.select(
        concat(substring(col("name"), 1, 3), expr("substring(name, 5)"))
          .as("name"),
        col("cnt")).withColumn("src", lit("dirty"))
      clean.unionByName(dirty)
        .withColumn("blk", substring(col("name"), 1, 3))
    }

  /** The staged verify middle: every blocked candidate pair with its
    * edit distance, computed ONCE per session (the X2 prune-verify
    * staging discipline) — x1e reads it ordered, x1f derives the
    * name-level CC edges from it. The distance is projected as a column
    * BEFORE the filter so each surviving pair pays ONE Wagner–Fischer
    * evaluation (Catalyst does not common-subexpression a filter-and-
    * project duplicate).
    */
  def stagedFuzzyPairs(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"fuzzy_pairs:$dir") {
      val all = stagedFuzzyDictionary(spark, dir)
      all.as("a").join(all.as("b"),
          col("a.blk") === col("b.blk") &&
            (col("a.name") < col("b.name") ||
              (col("a.name") === col("b.name") && col("a.src") < col("b.src"))))
        .withColumn("lev",
          levenshtein(col("a.name"), col("b.name")).cast("long"))
        .filter(col("lev") <= 2)
        .select(col("a.name").as("name_a"), col("a.src").as("src_a"),
          col("b.name").as("name_b"), col("b.src").as("src_b"), col("lev"),
          col("a.cnt").as("cnt_a"), col("b.cnt").as("cnt_b"))
    }

  /** X1e — FUZZY record linkage (entity resolution): match a dirty feed
    * against a clean vocabulary by edit distance — the data-cleaning
    * sibling of exact dedup (x1 catches byte-identical records; this
    * catches the typo'd near-identical ones that survive it). The dirty
    * feed is synthesized IN-QUERY (the x8 precedent: deterministic
    * perturbations so matches exist at every SF) by dropping each name's
    * 4th character — one edit, the classic fat-finger deletion.
    *
    * Shape: BLOCKING + bounded verify, the standard linkage scale
    * discipline — candidates only form inside a 3-char-prefix block (a
    * single-character edit past position 3 preserves the block key, the
    * documented recall contract of the blocking choice), and
    * `levenshtein` verifies ≤ 2 inside blocks only. Linkage runs at the
    * DICTIONARY level (distinct names + their record counts), never
    * record×record — the same vocabulary-memoization discipline as the
    * BPE encode: resolve the name table, map records back by hash join.
    *
    * Scale: the fixture's name domain is generator-bounded (64 names at
    * every SF), so the dictionary is metadata-domain-sized here; for a
    * HIGH-cardinality name domain (real TPC-H p_name is near-unique)
    * the per-block verify grows quadratically in block membership and
    * needs the x2d bucket-cap guard (`capBuckets`) or a longer blocking
    * key — the blocking contract, not this operator, is the scale
    * lever. Both engines implement the same Wagner–Fischer levenshtein,
    * so distances compare hash-exact.
    */
  val x1eFuzzyLinkage: Q = (spark, dir) =>
    stagedFuzzyPairs(spark, dir)
      .orderBy(col("name_a"), col("src_a"), col("name_b"), col("src_b"))
  val x1eSql: String =
    """WITH base AS (SELECT lower(p_name) AS name,
      |         CAST(count(*) AS BIGINT) AS cnt
      |        FROM part GROUP BY 1),
      |al AS (SELECT name, cnt, 'clean' AS src FROM base
      |       UNION ALL
      |       SELECT substr(name, 1, 3) || substr(name, 5), cnt, 'dirty' FROM base),
      |blk AS (SELECT name, cnt, src, substr(name, 1, 3) AS blk FROM al)
      |SELECT a.name AS name_a, a.src AS src_a, b.name AS name_b,
      | b.src AS src_b, CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
      | a.cnt AS cnt_a, b.cnt AS cnt_b
      |FROM blk a JOIN blk b ON a.blk = b.blk
      | AND (a.name < b.name OR (a.name = b.name AND a.src < b.src))
      |WHERE levenshtein(a.name, b.name) <= 2
      |ORDER BY name_a, src_a, name_b, src_b""".stripMargin

  /** X1f — linkage APPLY: the x1e match pairs resolved to CANONICAL
    * entities (connected components over the name graph — min-label CC
    * works unchanged on STRING keys, the lexicographic min name becomes
    * the canonical form), with every dictionary row folded in: matched
    * names collapse onto their canonical entity, unmatched names stand
    * alone, and record counts ride along — the master-data table an
    * entity-resolution pass actually ships. Completes the detect→apply
    * arc the other dedup families have (x1c/x1d, x2e/x7m). Both the
    * dictionary and the verify middle are the STAGED tables x1e reads —
    * the session pays the blocked levenshtein join once.
    */
  /** The name-level connected components staged per session (the x7
    * stagedClusters discipline — the iterative propagation is a
    * deterministic derived dictionary, paid once, not per consumer
    * execution: x1f was spending ~25 of its ~30 jobs re-running the
    * CC loop over the same staged pair table every execution). */
  private def stagedFuzzyCc(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"fuzzy_cc:$dir") {
      val pairs = stagedFuzzyPairs(spark, dir)
        .filter(col("name_a") =!= col("name_b"))
        .select(col("name_a").as("na"), col("name_b").as("nb"))
        .distinct()
      graft.operators.Graph.connectedComponents(pairs)
    }

  val x1fLinkageApply: Q = (spark, dir) => {
    val all = stagedFuzzyDictionary(spark, dir)
    val cc = stagedFuzzyCc(spark, dir)
    all.join(cc, all("name") === cc("node"), "left")
      .withColumn("canonical", coalesce(col("cluster"), col("name")))
      .groupBy(col("canonical"))
      .agg(countDistinct(col("name")).as("n_names"),
        sum(col("cnt")).as("n_records"))
      .orderBy(col("canonical"))
  }
  val x1fSql: String =
    """WITH RECURSIVE base AS (SELECT lower(p_name) AS name,
      |         CAST(count(*) AS BIGINT) AS cnt
      |        FROM part GROUP BY 1),
      |al AS (SELECT name, cnt, 'clean' AS src FROM base
      |       UNION ALL
      |       SELECT substr(name, 1, 3) || substr(name, 5), cnt, 'dirty' FROM base),
      |blk AS (SELECT name, cnt, src, substr(name, 1, 3) AS blk FROM al),
      |p AS (SELECT DISTINCT a.name AS na, b.name AS nb
      |      FROM blk a JOIN blk b ON a.blk = b.blk AND a.name < b.name
      |      WHERE levenshtein(a.name, b.name) <= 2),
      |edges AS (SELECT na AS u, nb AS v FROM p UNION SELECT nb, na FROM p),
      |walk AS (SELECT u AS node, u AS reach FROM edges
      |         UNION
      |         SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach),
      |cc AS (SELECT node, min(reach) AS cluster FROM walk GROUP BY 1)
      |SELECT coalesce(cluster, name) AS canonical,
      | CAST(count(DISTINCT name) AS BIGINT) AS n_names,
      | CAST(sum(cnt) AS BIGINT) AS n_records
      |FROM al LEFT JOIN cc ON al.name = cc.node
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- X1b line dedup
  /** Non-overlapping `width`-token segments per document — the "line" unit
    * for corpus-level repeated-line removal on a wire format with no
    * newlines (the fixture text is one space-joined token stream; on real
    * crawl text the split is `\n` and everything downstream is identical).
    * Columns: (doc_id, idx, seg) with idx the 0-based segment ordinal.
    */
  def segments(docs: DataFrame, width: Int = 10): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(expr(s"sequence(1, size(t), $width)")).as("i"))
      .select(col("doc_id"),
        ((col("i") - 1) / width).cast("long").as("idx"),
        array_join(slice(col("t"), col("i"), lit(width)), " ").as("seg"))

  /** Corpus-level repeated-segment removal (the RefinedWeb/CCNet "line
    * dedup" pass): segments whose content appears in more than `maxDocs`
    * distinct documents are boilerplate (headers, navbars, license blurbs)
    * and are struck from EVERY document; survivors are reassembled in
    * order. Emits per-document segment counts plus the md5 fingerprint of
    * the cleaned text (`null` when nothing survives — a fully-boilerplate
    * document).
    *
    * Scale: segmentation is explode-parallel; the document-frequency table
    * is a map-side-combined groupBy on fixed 32-char md5 keys; the join
    * back fans a hot segment out across its documents' partitions (output
    * rows = input occurrences); reassembly groups by doc_id — per-task rows
    * bounded by document length, and the dup key can't skew it because
    * doc_id is unique. Nothing ever concentrates the hot segment's copies
    * in one task.
    */
  def lineDedup(docs: DataFrame, width: Int = 10, maxDocs: Int = 2): DataFrame = {
    val seg = segments(docs, width).withColumn("h", md5(col("seg").cast("binary")))
    val dfreq = seg.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("seg_df"))
    // Pinned like x1c/x7h: Catalyst's post-explode estimate collapse
    // otherwise broadcasts the corpus-proportional raw segment stream
    // (observed at sf0.1); shuffle_hash on dfreq builds on the
    // one-bounded-row-per-key frequency table instead.
    val marked = seg.join(dfreq.hint("shuffle_hash"), "h")
      .withColumn("keep", col("seg_df") <= maxDocs)
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("idx"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"),
        when(col("n_kept") > 0, md5(col("clean_text").cast("binary")))
          .otherwise(lit(null)).as("clean_fp"))
  }

  val x1bLineDedup: Q = (spark, dir) =>
    lineDedup(Tables.documents(spark, dir)).orderBy(col("doc_id"))
  val x1bSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |st AS (SELECT doc_id, t, unnest(generate_series(1, len(t), 10)) AS i FROM tok),
      |seg AS (SELECT doc_id, CAST((i - 1) // 10 AS BIGINT) AS idx,
      |         array_to_string(t[i:i+9], ' ') AS seg FROM st),
      |dfreq AS (SELECT md5(seg) AS h, count(DISTINCT doc_id) AS seg_df
      |          FROM seg GROUP BY 1),
      |m AS (SELECT doc_id, idx, seg, seg_df
      |      FROM seg JOIN dfreq ON md5(seg) = h)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
      | CAST(count(*) FILTER (WHERE seg_df <= 2) AS BIGINT) AS n_kept,
      | CASE WHEN count(*) FILTER (WHERE seg_df <= 2) > 0
      |  THEN md5(string_agg(seg, ' ' ORDER BY idx) FILTER (WHERE seg_df <= 2))
      |  ELSE NULL END AS clean_fp
      |FROM m GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- X1c duplicate spans
  /** Exact duplicate-SPAN detection — the substring-granular third member
    * of the dedup family (x1 = whole document, x1b = fixed segment, x1c =
    * any run of tokens): every `n`-token gram whose exact content occurs
    * more than once ANYWHERE in the corpus (other documents or elsewhere
    * in the same one — both are verbatim repetition a model would
    * memorize) marks its token positions as duplicated, and maximal runs
    * of marked positions merge into spans (classic gaps-and-islands on
    * the position index). Emits (doc_id, span_start, span_end,
    * span_tokens); removal is a trivial anti-join of the token stream
    * against the span table, the same apply shape as x7f/x1b.
    *
    * This is the n-gram formulation of exact substring dedup (suffix-array
    * engines find the same spans with global structures; the gram
    * formulation gives the same ≥n-token guarantee from embarrassingly
    * parallel pieces, which is why corpus pipelines at crawl scale use
    * it). Scale: gram emission is explode-parallel per row; the
    * occurrence count is a map-side-combined groupBy on fixed 32-char md5
    * keys; the join back is a keyed shuffle (aggregate-before-join — the
    * count table, not the corpus, flows to the probe); coverage dedup
    * shards by (doc_id, position); the island window partitions by doc_id
    * so per-task state is bounded by document length. No step broadcasts
    * or concentrates the corpus.
    */
  def duplicateSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val grams = toks.filter(size(col("t")) >= n)
      .select(col("doc_id"), col("t"),
        explode(expr(s"sequence(0, size(t) - $n)")).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(array_join(slice(col("t"), col("pos") + 1, lit(n)), " ")
          .cast("binary")).as("h"))
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("h"))
    // Join discipline: the occurrence count is map-side combined (only
    // per-partition partials shuffle), and the join back is PINNED to a
    // shuffled hash join building on `dup` — one bounded row per key,
    // the aggregate-before-join shape AQE skew-splitting handles.
    // Without the pin, Catalyst's post-explode size estimate collapses
    // and it broadcasts the corpus-proportional gram stream itself
    // (observed at sf0.1: a 1M-row BroadcastExchange) — the inversion
    // that dies at scale. AQE may still flip the build side to a
    // broadcast of `dup` when its runtime stats are tiny — the correct
    // direction at any size.
    // Downstream, the dup-gram hits (a small fraction of the corpus)
    // cluster by doc_id once: the coverage dedup groups on
    // (doc_id, tpos) ⊇ doc_id, the island window and the span fold
    // partition by doc_id — all exchange-free after that one shuffle.
    val covered = grams.join(dup.hint("shuffle_hash"), "h")
      .select(col("doc_id"), col("pos"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("tpos"))
      .distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tpos"))
    covered.withColumn("grp", col("tpos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("tpos")).as("span_start"), max(col("tpos")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Span table staged once per (session, sfDir): x1c reads it ordered,
    * x1d's removal probes it — the producer-once/consumers-fan-out shape
    * the other staged intermediates (shingles, verified_counts) use.
    */
  def stagedSpans(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"dup_spans:5:$dir")(
      duplicateSpans(Tables.documents(spark, dir)))

  val x1cSpanDedup: Q = (spark, dir) =>
    stagedSpans(spark, dir).orderBy(col("doc_id"), col("span_start"))
  private val spansCte: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
      |       FROM tok WHERE len(t) >= 5),
      |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |        md5(array_to_string(t[i:i+4], ' ')) AS h FROM g0),
      |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
      |c0 AS (SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS tp
      |       FROM g JOIN dup USING (h)),
      |cov AS (SELECT DISTINCT doc_id, tp AS tpos FROM c0),
      |isl AS (SELECT doc_id, tpos,
      |         tpos - row_number() OVER (PARTITION BY doc_id ORDER BY tpos) AS grp
      |        FROM cov),
      |sp AS (SELECT doc_id, min(tpos) AS s, max(tpos) AS e
      |       FROM isl GROUP BY doc_id, grp)""".stripMargin

  val x1cSql: String = spansCte + """
      |SELECT doc_id, s AS span_start, e AS span_end,
      |       e - s + 1 AS span_tokens
      |FROM sp ORDER BY doc_id, span_start""".stripMargin

  // ------------------------------------------------ X1d span-dedup apply
  /** Removal twin of [[duplicateSpans]]: strike every covered token,
    * reassemble survivors in order, and emit the kept-token count, the
    * duplicated-token count, and the md5 fingerprint of the cleaned text
    * (null for a fully-duplicated document) — the same contract as x1b's
    * reassembly, so the whole substring-dedup pipeline is value-exact
    * cross-engine, not just the span table.
    *
    * Scale: the span table aggregates to one bounded array per document
    * (array length ≤ doc length / n), joins the token stream keyed by
    * doc_id, and the containment test is a per-row `exists` over that
    * bounded array — no range join, no broadcast of anything
    * corpus-proportional; reassembly groups by doc_id exactly like x1b.
    */
  def spanDedupApply(docs: DataFrame, spans: DataFrame): DataFrame = {
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sp"),
        sum(col("span_tokens")).as("n_dup"))
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val kept = toks.join(perDoc.select(col("doc_id"), col("sp")), Seq("doc_id"), "left")
      .filter(col("sp").isNull ||
        !expr("exists(sp, s -> pos >= s.span_start AND pos <= s.span_end)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").cast("binary")).as("clean_fp"))
    docs.select(col("doc_id"))
      .join(perDoc.select(col("doc_id"), col("n_dup")), Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        col("clean_fp"))
  }

  val x1dSpanApply: Q = (spark, dir) =>
    spanDedupApply(Tables.documents(spark, dir), stagedSpans(spark, dir))
      .orderBy(col("doc_id"))
  val x1dSql: String = spansCte + """,
      |spd AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_dup
      |        FROM sp GROUP BY 1),
      |e2 AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t FROM tok),
      |tk AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS tokn FROM e2),
      |kept AS (SELECT tk.doc_id, pos, tokn FROM tk WHERE NOT EXISTS (
      |  SELECT 1 FROM sp WHERE sp.doc_id = tk.doc_id AND tk.pos BETWEEN sp.s AND sp.e)),
      |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |       md5(string_agg(tokn, ' ' ORDER BY pos)) AS clean_fp
      |       FROM kept GROUP BY 1)
      |SELECT d.doc_id, coalesce(n_kept, 0) AS n_kept,
      |  coalesce(n_dup, 0) AS n_dup, clean_fp
      |FROM (SELECT doc_id FROM documents) d
      |LEFT JOIN spd USING (doc_id) LEFT JOIN ka USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------- X4j chunking
  /** Context-window chunking: overlapping `window`-token chunks every
    * `stride` tokens — the preprocessing step that turns documents into
    * training sequences (stride < window ⇒ overlap carries context across
    * chunk boundaries; the final chunks are naturally short). Emits the
    * chunk ordinal, its token count, and the chunk-content fingerprint
    * (rows stay narrow — downstream either rehydrates by (doc_id, offset)
    * or dedups chunks by fingerprint before tokenization).
    *
    * Scale: pure per-row expression work — explode of an index sequence,
    * array slice, hash; no shuffle at all until a downstream consumer
    * aggregates. Output rows ≈ n_tokens/stride per document.
    */
  def chunk(docs: DataFrame, window: Int = 16, stride: Int = 8): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(expr(s"sequence(1, size(t), $stride)")).as("i"))
      .select(col("doc_id"),
        ((col("i") - 1) / stride).cast("long").as("chunk_idx"),
        size(slice(col("t"), col("i"), lit(window))).cast("long").as("n_chunk_tokens"),
        md5(array_join(slice(col("t"), col("i"), lit(window)), " ").cast("binary"))
          .as("chunk_fp"))

  val x4jChunks: Q = (spark, dir) =>
    chunk(Tables.documents(spark, dir)).orderBy(col("doc_id"), col("chunk_idx"))
  val x4jSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |s AS (SELECT doc_id, t, unnest(generate_series(1, len(t), 8)) AS i FROM tok)
      |SELECT doc_id, CAST((i - 1) // 8 AS BIGINT) AS chunk_idx,
      | CAST(len(t[i:i+15]) AS BIGINT) AS n_chunk_tokens,
      | md5(array_to_string(t[i:i+15], ' ')) AS chunk_fp
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------------------------------- X2
  /** MinHash signatures banded 4×2; documents sharing any band bucket are
    * near-dup candidates. The 8 hash functions are the 8 disjoint 4-hex
    * slices of the shingle's one md5 digest (the classic split-one-wide-
    * hash-into-k trick) — zero additional hashing per shingle, and each
    * slice is still a uniform function of the shingle, so per-band
    * collision probability behaves like independent minhashes.
    */
  val numHashes = 8

  /** Hot-bucket cap for the LSH band join: a band bucket holding more than
    * `defaultMaxBucket` documents is degenerate (a boilerplate-heavy or
    * adversarial key) and would go quadratic in the self-join — ~n²/2 pairs
    * from one bucket. Capped buckets are dropped entirely; their members
    * still pair up via their other bands. Bounds candidate count at
    * ≤ bands · buckets · cap²/2 no matter how skewed the corpus is.
    */
  val defaultMaxBucket = 100

  private def minhashSigs(sh: DataFrame): DataFrame = {
    val aggs = (1 to numHashes).map(j =>
      min(substring(col("hs"), 4 * (j - 1) + 1, 4)).as(s"h$j"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }
  private val minhashSigsSql: String = {
    val mins = (1 to numHashes)
      .map(j => s"min(substr(hs, ${4 * (j - 1) + 1}, 4)) AS h$j").mkString(", ")
    s"sig AS (SELECT doc_id, $mins FROM sh GROUP BY 1)"
  }

  /** Drop rows of (band, key) buckets holding more than `maxBucket`
    * members. The bucket size is a map-side-combined groupBy whose tiny
    * result semi-joins back (AQE broadcasts it) — NOT a `count over
    * (partition by band, key)` window, which would funnel every member of
    * the degenerate bucket being capped into one task first (same skew
    * class as the x4d fingerprint count; on a boilerplate-heavy corpus the
    * hot bucket is exactly where the rows are).
    */
  private[graft] def capBuckets(bands: DataFrame, maxBucket: Int): DataFrame = {
    val small = bands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket)
      .select(col("band"), col("key"))
    bands.join(small, Seq("band", "key"), "left_semi")
  }

  /** Signature → capped (band, key) melt: one explode pass instead of a
    * 4-way union (a union of N selects re-reads the signature relation N
    * times); buckets larger than `maxBucket` dropped before any join.
    */
  def minhashBands(sh: DataFrame, maxBucket: Int = defaultMaxBucket): DataFrame = {
    val bandStructs = (1 to numHashes by 2).zipWithIndex.map { case (j, b) =>
      struct(lit(b).as("band"), concat(col(s"h$j"), col(s"h${j + 1}")).as("key"))
    }
    capBuckets(
      minhashSigs(sh)
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key")),
      maxBucket)
  }

  /** Bucket self-join: candidates only ever come from documents sharing a
    * band bucket, each bucket bounded by the [[minhashBands]] cap.
    */
  def bandPairs(bands: DataFrame): DataFrame = {
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH candidate pairs over a shingle table (see [[shingles]]). */
  def lshCandidates(sh: DataFrame, maxBucket: Int = defaultMaxBucket): DataFrame =
    bandPairs(minhashBands(sh, maxBucket))

  val x2MinhashLsh: Q = (spark, dir) => {
    // stage the (tiny) capped band table so the self-join's two branches
    // read it instead of re-running signature aggregation per branch
    val bands = Staged(spark, s"minhash_bands:$dir")(
      minhashBands(stagedShingles(spark, dir)))
    bandPairs(bands).orderBy(col("doc_a"), col("doc_b"))
  }

  val x2Sql: String = {
    val bandSelects = (1 to numHashes by 2).zipWithIndex.map { case (j, b) =>
      s"SELECT $b AS band, h$j || h${j + 1} AS key, doc_id FROM sig"
    }.mkString(" UNION ALL ")
    shinglesCte() + s""",
      |$minhashSigsSql,
      |bands AS ($bandSelects),
      |capped AS (SELECT band, key, doc_id FROM bands
      |  QUALIFY count(*) OVER (PARTITION BY band, key) <= $defaultMaxBucket)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM capped a JOIN capped b
      | ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ------------------------------------------------------------- X2 SimHash
  /** 16-bit SimHash over term-frequency-weighted token hashes: bit p is the
    * sign of Σ_tokens (md5 hex digit p ≥ 8 ? +1 : −1) — integer-exact in
    * both engines.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok").cast("binary")))
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val sums = (1 to 16).map(p =>
      sum(when(substring(col("h"), p, 1).isin(hi: _*), 1).otherwise(-1)).as(s"s$p"))
    val bits = (1 to 16).map(p => when(col(s"s$p") > 0, "1").otherwise("0"))
    toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), concat(bits: _*).as("simhash"))
  }

  def stagedSimhash(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"simhash:$dir")(simhash(Tables.documents(spark, dir)))

  val x2bSimhash: Q = (spark, dir) =>
    stagedSimhash(spark, dir).orderBy(col("doc_id"))

  /** Shared simhash CTE prefix (toks → sums) + the bit-string expression,
    * used verbatim by both x2b and x2d so the two oracle twins can never
    * drift apart.
    */
  private val simhashSumsCte: String = {
    val sums = (1 to 16).map(p =>
      s"sum(CASE WHEN substr(h, $p, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$p")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
       |sums AS (SELECT doc_id, $sums FROM toks GROUP BY 1)""".stripMargin
  }
  private val simhashBitsExpr: String =
    (1 to 16).map(p => s"CASE WHEN s$p > 0 THEN '1' ELSE '0' END").mkString(" || ")

  val x2bSql: String =
    s"""$simhashSumsCte
       |SELECT doc_id, $simhashBitsExpr AS simhash FROM sums ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- X2d SimHash near-dup
  /** SimHash near-dup pairing: band the 16-bit fingerprint into 4 bands of
    * 4 bits; by pigeonhole, any pair within Hamming distance 3 shares at
    * least one unchanged band, so the band-bucket join has EXACT recall for
    * the ≤3-bit contract — then the true Hamming distance verifies each
    * candidate. The standard simhash-at-scale shape (Manku et al., WWW'07:
    * split the fingerprint into k+1 blocks to catch all k-bit differences).
    *
    * Scale: the join only touches band buckets (same capped-bucket guard as
    * MinHash would apply for degenerate corpora); Hamming verification is a
    * codegen'd 16-term comparison chain, no UDF.
    */
  def simhashPairs(sig: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = defaultMaxBucket): DataFrame = {
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"), substring(col("simhash"), 4 * b + 1, 4).as("key")))
    val bands = capBuckets(
      sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key")),
      maxBucket)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val ham = (1 to 16).map(p =>
      when(substring(col("ha"), p, 1) =!= substring(col("hb"), p, 1), 1).otherwise(0))
      .reduceLeft((a: Column, b: Column) => a + b)
    cand
      .join(sig.select(col("doc_id"), col("simhash").as("ha")), col("da") === col("doc_id"))
      .drop("doc_id")
      .join(sig.select(col("doc_id"), col("simhash").as("hb")), col("db") === col("doc_id"))
      .select(col("da"), col("db"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  val x2dSimhashNearDup: Q = (spark, dir) =>
    simhashPairs(stagedSimhash(spark, dir)).orderBy(col("da"), col("db"))

  val x2dSql: String = {
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, substr(simhash, ${4 * b + 1}, 4) AS key FROM sig")
      .mkString(" UNION ALL ")
    val ham = (1 to 16)
      .map(p => s"CASE WHEN substr(sa.simhash, $p, 1) <> substr(sb.simhash, $p, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    simhashSumsCte + s""",
      |sig AS (SELECT doc_id, $simhashBitsExpr AS simhash FROM sums),
      |bands AS ($bandSelects),
      |capped AS (SELECT * FROM bands
      |  QUALIFY count(*) OVER (PARTITION BY band, key) <= $defaultMaxBucket),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM capped a JOIN capped b
      |          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |h AS (SELECT da, db, CAST($ham AS BIGINT) AS hamming
      |      FROM cand JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id)
      |SELECT da, db, hamming FROM h WHERE hamming <= 3 ORDER BY da, db""".stripMargin
  }

  // ----------------------------------------------------- X2 n-gram Jaccard
  /** Exact Jaccard near-dup with prune-then-verify: candidates come from a
    * join restricted to rare shingles (document frequency ≤ `maxDf` — the
    * scale lever: hot shingles never explode the join), then the true
    * Jaccard is computed over the full shingle sets of candidate pairs
    * only. Emits integer numerator/denominator (exact) with
    * J ≥ jNum/jDen (default 7/10).
    *
    * Soundness of the prune: a pair with J ≥ 0.7 shares ≥ 70% of its
    * shingles; unless EVERY shared shingle is hot (df > maxDf) the pair
    * survives. maxDf trades that recall edge against the hard bound it
    * buys: the candidate self-join emits ≤ maxDf²/2 pairs per shingle.
    */
  def jaccardPairs(sh: DataFrame, maxDf: Int = defaultMaxDf,
      jNum: Int = 7, jDen: Int = 10): DataFrame =
    jaccardOf(verifiedSharedCounts(sh, maxDf), jNum, jDen)

  /** Jaccard predicate over a verified-counts table — split out so the
    * staged counts ([[stagedVerifiedCounts]]) are filtered, not recomputed,
    * per consumer. */
  private[graft] def jaccardOf(vc: DataFrame,
      jNum: Int = 7, jDen: Int = 10): DataFrame =
    vc.filter(col("shared") * jDen >= (col("na") + col("nb") - col("shared")) * jNum)

  /** The prune-then-verify middle shared by the symmetric (Jaccard,
    * [[jaccardPairs]]) and asymmetric (containment,
    * [[containmentPairs]]) verifiers: candidate pairs via rare shingles
    * only, then exact shared-shingle counts with both set sizes.
    * Output: (da, db, shared, na, nb), da < db.
    */
  private def verifiedSharedCounts(sh: DataFrame, maxDf: Int): DataFrame = {
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // df via groupBy+join (partial-agg count is skew-safe; hot shingles are
    // dropped by the df filter BEFORE the self-join, so no reducer ever
    // sees a hot shingle's pair explosion). A capped-collect typed
    // Aggregator (one shuffle instead of count-join-selfjoin) measured
    // slower here — typed-aggregator encoding costs more than the extra
    // codegen'd shuffle at this row width.
    val df = sh.groupBy(col("hs")).agg(count(lit(1)).as("df"))
    val rare = sh.join(df.filter(col("df") <= maxDf), "hs")
    val cand = rare.as("a").join(rare.as("b"),
        col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    // verify joins: cand is tiny after the prune, so AQE turns both joins
    // into broadcast-hash probes over the staged shingle table — no
    // full-table shuffle in the verify stage
    val shared = cand
      .join(sh.as("x"), col("da") === col("x.doc_id"))
      .join(sh.as("y"), col("db") === col("y.doc_id") && col("x.hs") === col("y.hs"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("shared"))
    shared
      .join(cnt.as("ca"), col("da") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("db") === col("cb.doc_id"))
      .select(col("da"), col("db"), col("shared"),
        col("ca.n").as("na"), col("cb.n").as("nb"))
  }

  /** X2e — CONTAINMENT detection, the ASYMMETRIC near-dup case
    * symmetric Jaccard structurally misses: a document quoted or
    * embedded inside a much larger one shares nearly all of ITS OWN
    * shingles but few of the host's, so shared/union stays far below
    * any x2c threshold while shared/min(|A|,|B|) — the containment of
    * the smaller set — is ≈ 1. Training corpora are full of this shape
    * (aggregator pages embedding articles, quote-heavy forum posts),
    * and pair-dedup that only runs Jaccard keeps both copies. Same
    * rare-shingle prune-then-verify as x2c (one shared middle —
    * [[verifiedSharedCounts]] — so the two verifiers cannot drift),
    * different final predicate, plus the contained side named so the
    * apply step knows WHICH doc is the duplicate.
    */
  /** The two containment thresholds, named in ONE place so x2e, x7m/x7n
    * and the streaming T25 path cannot silently drift apart:
    *
    *   - [[ContainmentDetect]] = 4/5 — the REPORT threshold (x2e): loose
    *     enough to surface partial quoting worth reviewing.
    *   - [[ContainmentVerbatim]] = 19/20 — the DROP threshold (x7m stage
    *     1, x7n lineage, T25's incremental detector): fires only on true
    *     verbatim embeds. It must sit ABOVE the J ≥ 7/10 Jaccard band
    *     (which forces shared/min ≥ 14/17 ≈ 0.82 on every Jaccard pair) —
    *     at 4/5 stage 1 would swallow one side of every near-dup pair and
    *     the cluster stage would be vacuous.
    *
    * Both are (numerator, denominator) integer ratios — thresholds apply
    * as cross-multiplied integer arithmetic, never floats.
    */
  val ContainmentDetect: (Int, Int) = (4, 5)
  val ContainmentVerbatim: (Int, Int) = (19, 20)

  def containmentPairs(sh: DataFrame, maxDf: Int = defaultMaxDf,
      cNum: Int = ContainmentDetect._1,
      cDen: Int = ContainmentDetect._2): DataFrame =
    containmentOf(verifiedSharedCounts(sh, maxDf), cNum, cDen)

  /** Containment predicate over a verified-counts table (see
    * [[jaccardOf]]). The CONTAINED side is the smaller shingle set; on
    * equal sizes (an exact-duplicate pair, na == nb, shared == na) the
    * tie breaks toward dropping the LARGER doc_id (`db`, since da < db),
    * so the min-id document survives — the same representative
    * convention x7/x7f's min-label clustering uses.
    */
  private[graft] def containmentOf(vc: DataFrame,
      cNum: Int = ContainmentDetect._1,
      cDen: Int = ContainmentDetect._2): DataFrame =
    vc.filter(col("shared") * cDen >= least(col("na"), col("nb")) * cNum)
      .withColumn("contained",
        when(col("na") < col("nb"), col("da")).otherwise(col("db")))

  /** Staged verified shared-counts table — ONE prune-then-verify pass per
    * session feeds every pair consumer (x2c Jaccard, x2e containment, the
    * x6/x9 anti-joins, x7's cluster graph, x7m's two-stage apply): each
    * applies its own threshold predicate to the same (da, db, shared, na,
    * nb) middle instead of re-running the candidate join. The counts table
    * is a superset of any one verifier's pairs but still candidate-bounded
    * (rare-shingle prune), so staging it costs what staging the Jaccard
    * pairs alone used to.
    */
  def stagedVerifiedCounts(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"verified_counts:$dir")(
      verifiedSharedCounts(stagedShingles(spark, dir), defaultMaxDf))

  /** Staged verified near-dup pair table — shared by x2c and the x6
    * curation anti-join (which previously re-ran this whole pipeline).
    */
  def stagedJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    jaccardOf(stagedVerifiedCounts(spark, dir))

  val x2cNgramJaccard: Q = (spark, dir) =>
    stagedJaccardPairs(spark, dir).orderBy(col("da"), col("db"))

  /** The x2c CTE chain (shingles → cnt/rare/cand/shared), exposed as a
    * standalone prefix so the downstream oracles that extend it
    * (Graph.ccCtes → x7/x7f, Curation.x6Sql/x9Sql) CONCATENATE onto it
    * instead of regex-stripping [[x2cSql]] — an edit to the final SELECT
    * can no longer silently corrupt three other oracles. `withKw` lets a
    * consumer that appends recursive CTEs open with `WITH RECURSIVE`.
    */
  private[graft] def x2cCtePrefix(withKw: String = "WITH"): String =
    shinglesCte(withKw = withKw) + s""",
      |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      |rare AS (SELECT * FROM (SELECT doc_id, hs, count(*) OVER (PARTITION BY hs) AS df FROM sh) WHERE df <= $defaultMaxDf),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM rare a JOIN rare b ON a.hs = b.hs AND a.doc_id < b.doc_id),
      |shared AS (SELECT da, db, CAST(count(*) AS BIGINT) AS shared
      |           FROM cand JOIN sh x ON da = x.doc_id JOIN sh y ON db = y.doc_id AND x.hs = y.hs
      |           GROUP BY 1, 2)""".stripMargin

  val x2cSql: String = x2cCtePrefix() + """
      |SELECT da, db, shared, ca.n AS na, cb.n AS nb
      |FROM shared JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
      |WHERE shared * 10 >= (ca.n + cb.n - shared) * 7
      |ORDER BY da, db""".stripMargin

  val x2eContainment: Q = (spark, dir) =>
    containmentOf(stagedVerifiedCounts(spark, dir)).orderBy(col("da"), col("db"))
  val x2eSql: String = x2cCtePrefix() + """
      |SELECT da, db, shared, ca.n AS na, cb.n AS nb,
      | CASE WHEN ca.n < cb.n THEN da ELSE db END AS contained
      |FROM shared JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
      |WHERE shared * 5 >= least(ca.n, cb.n) * 4
      |ORDER BY da, db""".stripMargin

  /** X2f — the df-cap BLIND-SPOT bound for containment detection,
    * quantified (the x4m theorem-as-measurement pattern). Candidate
    * pairs come only from shingles with df ≤ maxDf, so a short document
    * made entirely of hot boilerplate shingles can be verbatim-embedded
    * and never generate a candidate. The guarantee that survives the
    * cap: for a contained pair at threshold ≥ cNum/cDen, the host
    * misses at most floor(n·(cDen−cNum)/cDen) of the contained doc's n
    * shingles — so if the contained doc carries MORE rare shingles than
    * that budget (r·cDen > n·(cDen−cNum)), at least one rare shingle is
    * shared and the pair is guaranteed detected. Docs violating that
    * inequality are the ONLY possible misses. This query measures the
    * split at the verbatim (19/20) threshold: one summary row —
    * docs-with-shingles, guaranteed-detectable count, at-risk count,
    * and the at-risk permille — so a corpus build can alarm when
    * boilerplate growth erodes the detection guarantee, the same way
    * x7l alarms on cluster skew. Cost: two map-side-combined groupBys
    * over the staged shingle table; nothing corpus-proportional beyond
    * the one pass every pair query already makes.
    */
  val x2fContainmentBlindspot: Q = (spark, dir) => {
    val (cNum, cDen) = ContainmentVerbatim
    val sh = stagedShingles(spark, dir)
    val dfT = sh.groupBy(col("hs")).agg(count(lit(1)).as("df"))
    val per = sh.join(dfT, "hs")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("df") <= lit(defaultMaxDf), 1L).otherwise(0L)).as("r"))
    per.agg(
        count(lit(1)).as("docs_with_shingles"),
        sum(when(col("r") * cDen > col("n") * (cDen - cNum), 1L)
          .otherwise(0L)).as("guaranteed_docs"),
        sum(when(col("r") * cDen <= col("n") * (cDen - cNum), 1L)
          .otherwise(0L)).as("at_risk_docs"))
      .withColumn("at_risk_permille",
        expr("at_risk_docs * 1000 div docs_with_shingles"))
  }
  val x2fSql: String = {
    val (cNum, cDen) = ContainmentVerbatim
    shinglesCte() + s""",
      |dft AS (SELECT hs, count(*) AS df FROM sh GROUP BY 1),
      |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(CASE WHEN df <= $defaultMaxDf THEN 1 ELSE 0 END) AS BIGINT) AS r
      |        FROM sh JOIN dft USING (hs) GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS docs_with_shingles,
      | CAST(sum(CASE WHEN r * $cDen > n * ${cDen - cNum} THEN 1 ELSE 0 END) AS BIGINT) AS guaranteed_docs,
      | CAST(sum(CASE WHEN r * $cDen <= n * ${cDen - cNum} THEN 1 ELSE 0 END) AS BIGINT) AS at_risk_docs,
      | CAST(sum(CASE WHEN r * $cDen <= n * ${cDen - cNum} THEN 1 ELSE 0 END) AS BIGINT) * 1000
      |   // CAST(count(*) AS BIGINT) AS at_risk_permille
      |FROM per""".stripMargin
  }

  // ------------------------------------------------------------------- X4
  /** Quality scoring: token counts, stopword ratio, average token length —
    * integer-exact components plus mirrored IEEE ratios.
    */
  val x4TextQuality: Q = (spark, dir) => {
    Tables.documents(spark, dir)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_stop", expr("size(filter(t, x -> x IN ('the','a','of','and')))").cast("long"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_stop"),
        round(col("n_stop") * lit(1.0) / col("n_tokens"), 4).as("stop_ratio"),
        round((col("n_chars") - (col("n_tokens") - 1)) * lit(1.0) / col("n_tokens"), 4).as("avg_tok_len"))
      .orderBy(col("doc_id"))
  }
  val x4Sql: String =
    """WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS t FROM documents),
      |m AS (SELECT doc_id, n_chars, CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(t, x -> x IN ('the','a','of','and'))) AS BIGINT) AS n_stop FROM d)
      |SELECT doc_id, n_tokens, n_stop,
      | round(n_stop * 1.0 / n_tokens, 4) AS stop_ratio,
      | round((n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 4) AS avg_tok_len
      |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- X4 language ID
  /** Character-n-gram language-ID heuristic (deterministic profile scores —
    * occurrence counts of marker n-grams via the length-difference trick,
    * integer-exact in both engines). The fixture text is synthetic, so this
    * scores the *operator*, not real language ID.
    */
  val x4bLangId: Q = (spark, dir) => {
    def occ(ngram: String): Column =
      ((length(col("text")) - length(expr(s"replace(text, '$ngram', '')"))) / ngram.length).cast("long")
    Tables.documents(spark, dir)
      .withColumn("th_n", occ("th"))
      .withColumn("er_n", occ("er"))
      .withColumn("ow_n", occ("ow"))
      .select(col("doc_id"), col("lang").as("actual_lang"), col("th_n"), col("er_n"), col("ow_n"),
        when(col("th_n") >= 6, "en")
          .when(col("er_n") >= 8, "de")
          .when(col("ow_n") >= 5, "fr")
          .otherwise("und").as("pred_lang"))
      .orderBy(col("doc_id"))
  }
  val x4bSql: String =
    """WITH m AS (SELECT doc_id, lang AS actual_lang,
      |  CAST((length(text) - length(replace(text, 'th', ''))) / 2 AS BIGINT) AS th_n,
      |  CAST((length(text) - length(replace(text, 'er', ''))) / 2 AS BIGINT) AS er_n,
      |  CAST((length(text) - length(replace(text, 'ow', ''))) / 2 AS BIGINT) AS ow_n
      | FROM documents)
      |SELECT doc_id, actual_lang, th_n, er_n, ow_n,
      | CASE WHEN th_n >= 6 THEN 'en' WHEN er_n >= 8 THEN 'de'
      |      WHEN ow_n >= 5 THEN 'fr' ELSE 'und' END AS pred_lang
      |FROM m ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- X4 token counting
  /** Whitespace vs BPE-ish regex tokenization counts. */
  val x4cTokenCount: Q = (spark, dir) => {
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("n_chars_m"))
      .orderBy(col("doc_id"))
  }
  val x4cSql: String =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      | CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
      | CAST(length(text) AS BIGINT) AS n_chars_m
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- X4 doc fingerprinting
  /** Content fingerprint (md5 of normalized text) + per-fingerprint group
    * size — the exact-dup detector at fingerprint granularity.
    *
    * Skew note: a `count over (partition by fp)` window would funnel EVERY
    * copy of one fingerprint into a single task — boilerplate-heavy corpora
    * (the exact thing this operator detects) make one fp hold millions of
    * rows at 100 TB. Instead the count is a map-side-combined groupBy whose
    * tiny result joins back (AQE broadcasts it); the hot fp's rows stay
    * spread across their original partitions.
    */
  def fingerprintCounts(docs: DataFrame): DataFrame = {
    val fps = docs.select(col("doc_id"), md5(lower(col("text")).cast("binary")).as("fp"))
    val counts = fps.groupBy(col("fp")).agg(count(lit(1)).as("n_same"))
    fps.join(counts, "fp").select(col("doc_id"), col("fp"), col("n_same"))
  }

  val x4dFingerprint: Q = (spark, dir) =>
    fingerprintCounts(Tables.documents(spark, dir)).orderBy(col("doc_id"))
  val x4dSql: String =
    """SELECT doc_id, md5(lower(text)) AS fp,
      | CAST(count(*) OVER (PARTITION BY md5(lower(text))) AS BIGINT) AS n_same
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- X4 URL/domain stats
  /** Web-curation domain statistics: extract every URL's host from the
    * text, count documents and occurrences per domain — the table a
    * crawl-curation pipeline gates on (domain allow/deny lists, per-domain
    * caps). The regex stays in the Java/RE2-common subset so the oracle
    * mirrors it verbatim.
    *
    * Scale: extraction is per-row expression work; the domain groupBy is
    * map-side combined and keyed by domain (bounded cardinality ≪ corpus);
    * a hot domain costs one reducer its partial counts, not its rows.
    */
  val urlHostRe = "https?://([a-z0-9.-]+)/"

  def domainStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all($textCol, '$urlHostRe', 1)")).as("domain"))
      .groupBy(col("domain"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_urls"))

  /** Registered query: the fixture text carries no URLs, so deterministic
    * ones are appended in-query (same derivation in the oracle CTE).
    */
  val x4gDomains: Q = (spark, dir) => {
    val aug = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit(" see https://site"), (col("doc_id") % 7).cast("string"),
            lit(".example.com/page"), col("doc_id").cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" and http://cdn.example.net/x"))
          .otherwise(lit(""))).as("text"))
    domainStats(aug).orderBy(col("domain"))
  }
  val x4gSql: String =
    s"""WITH aug AS (
       | SELECT doc_id, text ||
       |  CASE WHEN doc_id % 2 = 0
       |   THEN ' see https://site' || CAST(doc_id % 7 AS VARCHAR) ||
       |        '.example.com/page' || CAST(doc_id AS VARCHAR)
       |   ELSE '' END ||
       |  CASE WHEN doc_id % 5 = 0 THEN ' and http://cdn.example.net/x'
       |   ELSE '' END AS text
       | FROM documents),
       |d AS (SELECT doc_id, unnest(regexp_extract_all(text, '$urlHostRe', 1)) AS domain
       |      FROM aug)
       |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       | CAST(count(*) AS BIGINT) AS n_urls
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- X4 novelty growth
  /** Novelty growth curve (Heaps-law monitoring at 5-gram granularity):
    * per doc_id bucket, how many NEVER-BEFORE-SEEN shingles appear, plus
    * the cumulative distinct-shingle count — the curve a corpus pipeline
    * watches to detect creeping duplication (sub-linear growth) or
    * contamination/noise (super-linear growth). Shingles rather than
    * tokens: a token vocabulary saturates almost immediately, the 5-gram
    * space keeps discriminating. Feeds from the session-staged shingle
    * table.
    *
    * Scale: "first seen" is min(bucket) per shingle — one map-side-combined
    * groupBy keyed by the shingle hash; the cumulative window runs over
    * #buckets rows (already aggregated, tiny), never over shingles.
    */
  val x4hNoveltyGrowth: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = stagedShingles(spark, dir)
      .groupBy(col("hs")).agg(min((col("doc_id") / 100).cast("long")).as("bkt"))
    firstSeen.groupBy(col("bkt")).agg(count(lit(1)).as("new_shingles"))
      .withColumn("distinct_shingles", sum(col("new_shingles")).over(
        Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("bkt"))
  }
  val x4hSql: String = shinglesCte() + """,
      |fs AS (SELECT hs, min(doc_id // 100) AS bkt FROM sh GROUP BY 1),
      |pb AS (SELECT bkt, CAST(count(*) AS BIGINT) AS new_shingles FROM fs GROUP BY 1)
      |SELECT bkt, new_shingles,
      | CAST(sum(new_shingles) OVER (ORDER BY bkt ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_shingles
      |FROM pb ORDER BY bkt""".stripMargin

  // ------------------------------------------------- X4 vocabulary ids
  /** Vocabulary construction with dense ordinal token ids (frequency rank,
    * ties broken by token — a unique total order): the id-assignment step
    * of tokenizer/vocab building. The naive `row_number() OVER (ORDER BY
    * …)` is a single-task global sort at corpus scale; this uses
    * [[Partitioning.ordinalIds]] — range-partition, rank locally, then
    * prefix-sum the per-partition counts and add the offsets back — so the
    * only global step is a prefix sum over #partitions counters. Ordinals
    * depend only on the total order, so the output is deterministic and
    * identical to the window formulation (spec-asserted, plus the oracle
    * IS the window formulation).
    */
  val x4iVocabIds: Q = (spark, dir) => {
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    Partitioning.ordinalIds(vocab, Seq(col("n").desc, col("token").asc), "id",
        numParts = 8)
      .select(col("token"), col("n"), col("id"))
      .orderBy(col("id"))
  }
  val x4iSql: String =
    """WITH v AS (SELECT token, CAST(count(*) AS BIGINT) AS n
      | FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      | GROUP BY 1)
      |SELECT token, n,
      | CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS id
      |FROM v ORDER BY id""".stripMargin

  // ------------------------------------------------- X4k corpus encoding
  /** Encode every document as its token-id sequence using the x4i
    * vocabulary (frequency-rank ordinals) — the tokenizer-apply step that
    * turns a curated corpus into model input. Emits the id array in token
    * order plus the token count.
    *
    * Scale: the vocabulary is bounded (≪ corpus) and BROADCASTS; the
    * corpus side is posexplode → hash-probe → groupBy(doc_id) with
    * per-group rows bounded by document length. Order is restored by
    * sorting the (pos, id) structs inside the aggregation — collect_list
    * order is partition-dependent, the sort makes it deterministic.
    */
  val x4kEncodeIds: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val vocab = docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val ids = Partitioning.ordinalIds(vocab,
        Seq(col("n").desc, col("token").asc), "id", numParts = 8)
      .select(col("token"), col("id"))
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .join(broadcast(ids), "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        // canonical CSV rather than an array column: id sequences compare
        // as one opaque string in any engine's hash of the result
        expr("""array_join(transform(array_sort(collect_list(struct(pos, id))),
          | s -> CAST(s.id AS STRING)), ',')""".stripMargin).as("ids"))
      .orderBy(col("doc_id"))
  }
  val x4kSql: String =
    """WITH v AS (SELECT token, CAST(count(*) AS BIGINT) AS n
      | FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      | GROUP BY 1),
      |ids AS (SELECT token,
      |  CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS id FROM v),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |e AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks FROM t),
      |tok AS (SELECT doc_id, pos, toks[pos] AS token FROM e)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      | string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids
      |FROM tok JOIN ids USING (token)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ------------------------------------------- X4l sketch heavy hitters
  /** Heavy hitters via the mergeable Misra–Gries summary
    * ([[graft.functions.MisraGries]]): one pass, ≤ k-1 counters per
    * partition buffer — frequent tokens WITHOUT shuffling the
    * distinct-token table (at crawl scale the vocabulary itself is
    * billions of rows; x4e's exact counting shuffles it, the sketch ships
    * k counters per partition). The ≤ k-1-entry summary is collected to
    * the driver — bounded by construction, the same class as the IVF
    * sample-fit collect.
    *
    * Verified as a cross-engine contract (the q9c pattern): for every
    * token whose TRUE count exceeds N/k (exact integer cross-multiply),
    * the sketch must contain it (`captured`) with undercount at most N/k
    * (`err_bounded`) — the MG theorem, which holds for ANY partitioning,
    * so the booleans are deterministic even though the raw estimates are
    * not (they stay out of the compared output).
    *
    * PRODUCTION CONTRACT: only the sketch pass (the `head()` action on
    * the MG aggregation) runs in production — one corpus scan, k counters
    * out. The exact `counts`/`total` pass below exists SOLELY to let the
    * oracle check the MG theorem against ground truth; it is the
    * verification harness, not part of the operator, and at crawl scale
    * it would be exactly the vocabulary shuffle the sketch exists to
    * avoid.
    */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val sketch: Map[String, Long] =
      toks.as[String].select(graft.functions.MisraGries.mg(k).toColumn).head()
    val sk = sketch.toSeq.toDF("token", "est")
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n")) // true heavy hitters, integer-exact
      .join(broadcast(sk), Seq("token"), "left")
      .select(col("token"), col("cnt"),
        col("est").isNotNull.as("captured"),
        (col("est").isNotNull &&
          (col("cnt") - coalesce(col("est"), lit(0L))) * k <= col("n"))
          .as("err_bounded"))
  }

  /** k=30 against the fixtures' ~31-token near-uniform vocabulary: some
    * tokens clear the N/30 bar (non-vacuous output, 14-16 rows at every
    * SF) while 31 distinct > 29 counters forces the eviction path. */
  val x4lHeavyHitters: Q = (spark, dir) =>
    heavyHitters(Tables.documents(spark, dir), k = 30)
      .orderBy(col("cnt").desc, col("token"))
  val x4lSql: String =
    """WITH c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      | FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      | GROUP BY 1),
      |tot AS (SELECT sum(cnt) AS n FROM c)
      |SELECT token, cnt, TRUE AS captured, TRUE AS err_bounded
      |FROM c, tot WHERE cnt * 30 > n
      |ORDER BY cnt DESC, token""".stripMargin

  // ------------------------------------------- X4m count-min frequency oracle
  /** Point-frequency oracle via Spark's built-in mergeable Count–Min
    * sketch aggregate (`count_min_sketch`, codegen'd): a fixed
    * ~depth×width counter grid (~10 KB here) answers "how often does
    * token t occur" for ANY t without storing the vocabulary — the
    * overcount-bounded complement to x4l's undercount-bounded
    * Misra–Gries (CMS: est ≥ true, est ≤ true + ε·N w.h.p.; MG:
    * est ≤ true, true − est ≤ N/k). Mergeability is counter-grid
    * addition, so one pass + map-side partials; the collected sketch is
    * bounded by construction (the IVF sample-fit class).
    *
    * Verified as a cross-engine contract (the q9c/x4l pattern): for
    * every distinct token, `no_undercount` (CMS can only overcount —
    * any serialization/merge bug shows up here) and `overcount_bounded`
    * (est − true ≤ 2·ε·N). ε=0.1 makes the grid width (⌈e/ε⌉ = 28)
    * smaller than the 31-token vocabulary, so collisions actually
    * occur and the bound is exercised, not vacuous. The factor 2 is
    * deliberate slack: CMS guarantees est − true ≤ ε·N only with
    * probability 1−δ PER POINT QUERY (δ=0.01 here), while the DuckDB
    * oracle hardcodes TRUE — a regenerated fixture or a new scale
    * factor is a fresh data draw that could deterministically land in
    * the δ tail and fail the cross-engine diff forever. At 2·ε·N the
    * failure probability collapses to ~δ² per the Markov argument
    * (each grid row independently exceeds 2εN with probability < 1/2e²)
    * — effectively certain at any fixture scale, and still a real
    * two-sided sandwich on the estimate. Booleans stay deterministic
    * for a GIVEN fixture: the seed is fixed and CMS estimates are
    * partition-invariant (counter addition commutes).
    *
    * The per-token estimate probe runs over the POST-aggregation
    * distinct-token side (31 rows here, the vocabulary at crawl scale)
    * as a native codegen'd expression (`functions.CountMinProbe` — the
    * DotProduct pattern): the ~10 KB counter grid parsed out of the
    * aggregated sketch bytes is embedded as a codegen reference and the
    * hash-grid min inlines into whole-stage codegen, so even a
    * billion-row vocabulary probe keeps codegen and never converts
    * UTF8String→String per row (the udf it replaced did both).
    */
  def cmsFrequencyBound(docs: DataFrame, eps: Double, confidence: Double,
      seed: Int): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val bytes = toks
      .agg(count_min_sketch(col("token"), lit(eps), lit(confidence),
        lit(seed)).as("s"))
      .head().getAs[Array[Byte]](0)
    val grid = graft.functions.CountMinProbe.parse(bytes)
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    counts.crossJoin(broadcast(total))
      .withColumn("est", graft.functions.CountMinProbe.probe(grid, col("token")))
      .select(col("token"), col("cnt"),
        (col("est") >= col("cnt")).as("no_undercount"),
        ((col("est") - col("cnt")) <= lit(2.0) * lit(eps) * col("n"))
          .as("overcount_bounded"))
  }

  val x4mCmsBound: Q = (spark, dir) =>
    cmsFrequencyBound(Tables.documents(spark, dir),
      eps = 0.1, confidence = 0.99, seed = 42)
      .orderBy(col("cnt").desc, col("token"))
  val x4mSql: String =
    """WITH c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      | FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      | GROUP BY 1)
      |SELECT token, cnt, TRUE AS no_undercount, TRUE AS overcount_bounded
      |FROM c ORDER BY cnt DESC, token""".stripMargin

  // ------------------------------------------------------ X4 term frequency
  /** Corpus term frequency with language filter: tokenize → explode →
    * count, the canonical shuffle-with-partial-agg text op. Deterministic
    * top slice: all tokens with count ≥ 1000·SF would drift across SF, so
    * rank by (count desc, token) and keep the top 50.
    */
  val x4eTermFreq: Q = (spark, dir) => {
    Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "es"))
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(50)
  }
  val x4eSql: String =
    """SELECT token, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token
      |      FROM documents WHERE lang IN ('en', 'es'))
      |GROUP BY 1 ORDER BY n DESC, token LIMIT 50""".stripMargin

  // ------------------------------------------------------------- X4 TF-IDF
  /** TF-IDF per (document, term): term frequency × ln(N / document
    * frequency). Output is the full matrix for a doc slice with the score
    * rounded — deliberately NOT a top-k-by-score ranking, because ln() last
    * -ulp differences between engines could flip float-ranked positions;
    * values-with-round compare exactly, ranks on floats would not.
    */
  val x4fTfIdf: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    // one declarative plan: token stream shared by tf and df branches, and
    // N delivered in-plan via a broadcast 1-row aggregate — no eager
    // count() job at query-construction time
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = toks.filter(col("doc_id") < 50)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("token"))
  }
  val x4fSql: String =
    """WITH tf AS (
      | SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents WHERE doc_id < 50),
      |tfc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tf GROUP BY 1, 2),
      |dfc AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM (
      | SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) GROUP BY 1)
      |SELECT doc_id, tfc.token, tf, df,
      | round(tf * ln((SELECT count(*) FROM documents) * 1.0 / df), 6) AS tfidf
      |FROM tfc JOIN dfc ON tfc.token = dfc.token
      |ORDER BY doc_id, tfc.token""".stripMargin

  // ------------------------------------------------------- X4r BM25 retrieval
  /** BM25 ranked retrieval for a fixed query term set — the scoring half of
    * a search index, run directly over the corpus (a production deployment
    * materializes the postings once; the per-query plan below is exactly
    * what it would serve from that index).
    *
    * Candidate discipline — lead with the rarest postings list: the gate
    * term is COMPUTED as the minimum-df query term (from the postings' own
    * df table, ties broken on token asc), and only documents containing it
    * are scored (the classic term-at-a-time optimization: the candidate
    * set is bounded by the shortest postings list, so common terms like
    * stopwords never inflate the scored set). Because the gate is
    * data-derived — a 1-row broadcast argmin, never `terms.head` — the
    * caller's term ORDER can change neither the semantics nor the plan.
    * The candidate join is a plain equi-join Catalyst is free to broadcast
    * at small candidate counts or sort-merge at scale — candidates scale
    * with the rarest term's df, not the corpus.
    *
    * Determinism: every floating subexpression (idf, length norm) is one
    * mirrored IEEE formula over exact integer inputs (tf, df, dl, N, Σdl),
    * so the per-term contribution double is bit-identical in both engines;
    * it is then floored to integer micro-units (×1e6) BEFORE the per-doc
    * sum — the cross-term reduction is exact BIGINT addition, immune to
    * float summation order (the x3k quantization discipline). Output:
    * (doc_id, n_terms, score_u6), total order by doc_id.
    *
    * 100 TB shape: one corpus scan; the only shuffles carry postings for
    * the query terms (map-side combined tf partials) and the |terms|-row
    * df table rides a broadcast; N/Σdl is a 1-row broadcast aggregate.
    */
  def bm25Retrieve(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("token"))
    val tfs = toks.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl")) // dl constant per doc
    val stats = docs.select(size(split(col("text"), " ")).cast("long").as("dl0"))
      .agg(count(lit(1)).as("n"), sum(col("dl0")).as("sdl"))
    bm25FromPostings(tfs, stats, terms, k1, b)
  }

  /** The BM25 scoring tail shared by the batch path ([[bm25Retrieve]]) and
    * the maintained-index paths (`x4t` inline fold,
    * [[graft.streaming.Streams.servedBm25]]): `postings` carries one row
    * per (doc_id, token) with exact tf and dl (extra non-query tokens and
    * null-token META rows are dropped by the term filter), `stats` is the
    * 1-row (n, Σdl) corpus aggregate. df is recomputed from the postings'
    * own query-term rows, so every consumer scores against the SAME
    * formula over the same exact integers — served results cannot drift
    * from batch results by construction.
    */
  def bm25FromPostings(postings: DataFrame, stats: DataFrame,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tfs = postings.filter(col("token").isin(terms: _*))
    val dfreq = tfs.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // the rarest-term gate, computed not caller-ordered: argmin-df over
    // the |terms|-row df table (1 row, broadcast) — see the scaladoc above
    val gate = dfreq.orderBy(col("df").asc, col("token").asc).limit(1)
      .select(col("token").as("__gate_token"))
    val cand = tfs.join(broadcast(gate), col("token") === col("__gate_token"))
      .select(col("doc_id"))
    val idf = log(lit(1.0) +
      ((col("n") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) * (lit(1.0) - lit(b) +
      lit(b) * col("dl").cast("double") / (col("sdl").cast("double") / col("n")))
    tfs.join(cand, Seq("doc_id"))
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", idf).withColumn("denom", denom)
      .select(col("doc_id"),
        floor(col("idf") * (col("tf") * lit(k1 + 1.0)) / col("denom") *
          lit(1000000.0)).as("c6"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c6")).as("score_u6"))
      .orderBy(col("doc_id"))
  }

  /** Full inverted-index rows for a document batch — the unit the T30
    * postings store persists per epoch: one row per (doc_id, DISTINCT
    * token) with exact tf and the doc's length, PLUS one META row per doc
    * (token NULL, tf 0) carrying dl — the doc-exists marker that keeps
    * corpus statistics (N, Σdl) exact even for docs none of whose tokens
    * match a query, and the carrier a delete tombstone replaces. Columns:
    * (doc_id, token, tf, dl).
    */
  /** Winner-BATCH-per-doc fold — the ONE definition shared by the x4t
    * inline twin, [[graft.streaming.Streams.readPostingsAsOf]], and
    * [[graft.streaming.Streams.compactPostings]], so the documented
    * "served ≡ batch ≡ compacted" invariant cannot desynchronize: keep
    * every posting row of each doc's HIGHEST batch id, then keep only
    * live rows (fold-then-filter makes a delete irreversible by older
    * epochs). Retains the `b`/`live` columns; callers drop what their
    * layout no longer needs.
    */
  def foldWinnerBatch(postings: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
    postings.withColumn("__mb", max(col("b")).over(w))
      .filter(col("b") === col("__mb") && col("live")).drop("__mb")
  }

  /** [[foldWinnerBatch]] restricted to the rows a TERM-bounded consumer
    * can ever use — `token IS NULL OR token IN terms` — with the filter
    * applied BELOW the fold, so it reaches the store's parquet scan as a
    * pushed predicate and the winner window shuffles a few rows per doc
    * instead of the doc's whole vocabulary (guide §2.3/§6: the serve
    * cost becomes proportional to the query's postings, not the corpus).
    *
    * Equivalent to filtering AFTER the full fold because every epoch
    * that touches a doc writes exactly one token-NULL row — the
    * [[docPostings]]/[[docPositions]] META marker for upserts, the
    * tombstone row for deletes (both store appliers enforce the shape) —
    * so the per-doc max(b) over the filtered subset equals the max(b)
    * over the full store, and each surviving row's (b == max, live)
    * predicate is row-local. Consumers that need corpus statistics read
    * them from the surviving META rows exactly as before.
    */
  def foldWinnerBatchForTerms(postings: DataFrame,
      terms: Seq[String]): DataFrame =
    foldWinnerBatch(postings.filter(
      col("token").isNull || col("token").isin(terms.distinct: _*)))

  def docPostings(docs: DataFrame): DataFrame = {
    val tokRows = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .select(col("doc_id"), col("token"), col("tf"), col("dl"))
    val meta = docs.select(col("doc_id"),
      lit(null).cast("string").as("token"), lit(0L).as("tf"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    meta.unionByName(tokRows)
  }

  /** Fixture query: 'dup' is the one rare token in the synthetic vocabulary
    * (df ≈ 5% of docs vs ~78% for every other term) — so the computed
    * argmin-df gate selects it regardless of the order here; the two
    * common terms contribute scores only for gated candidates. */
  val bm25Terms: Seq[String] = Seq("dup", "spark", "vector")
  val x4rBm25: Q = (spark, dir) =>
    bm25Retrieve(Tables.documents(spark, dir), bm25Terms)

  /** The x4r oracle's CTE body ("toks" … "sc"), shared verbatim with the
    * x4u hybrid oracle so the two SQL twins cannot drift.
    */
  private val bm25SqlCtes: String = {
    val inList = bm25Terms.map(t => s"'$t'").mkString(", ")
    val k1 = 1.2; val b = 0.75
    s"""toks AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |        unnest(string_split(text, ' ')) AS token FROM documents),
       |qt AS (SELECT * FROM toks WHERE token IN ($inList)),
       |tfs AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf,
       |        CAST(max(dl) AS BIGINT) AS dl FROM qt GROUP BY 1, 2),
       |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
       |        FROM (SELECT DISTINCT doc_id, token FROM qt) GROUP BY 1),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sdl
       |       FROM documents),
       |cand AS (SELECT doc_id FROM tfs WHERE token =
       |         (SELECT token FROM dfq ORDER BY df, token LIMIT 1)),
       |sc AS (SELECT t.doc_id, t.tf,
       |        ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) AS idf,
       |        t.tf + $k1 * (1.0 - $b + $b * CAST(t.dl AS DOUBLE)
       |          / (CAST(sdl AS DOUBLE) / n)) AS denom
       |       FROM tfs t JOIN cand USING (doc_id) JOIN dfq USING (token)
       |       CROSS JOIN st),
       |bm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       | CAST(sum(CAST(floor(idf * (tf * CAST(${k1 + 1.0} AS DOUBLE))
       |   / denom * 1000000.0) AS BIGINT)) AS BIGINT) AS score_u6
       | FROM sc GROUP BY 1)""".stripMargin
  }

  val x4rSql: String =
    s"WITH $bm25SqlCtes\n" +
      "SELECT doc_id, n_terms, score_u6 FROM bm ORDER BY doc_id"

  // ------------------------------------------- X4t maintained BM25 index
  /** X4t — BM25 served from a MAINTAINED postings index: the corpus
    * arrives as seven epochs of an incremental index build — three
    * insert waves, a corrupting rewrite of the %10 docs, their restore,
    * tombstone deletes of the %7 docs, and their re-insert — and the
    * query is answered from the winner-batch-per-doc fold of the epoch
    * union, through the SAME [[bm25FromPostings]] tail as `x4r`. The
    * oracle is `x4rSql` VERBATIM: because the epochs converge to the
    * original corpus, the folded index must reproduce the batch answer
    * hash-exactly — shadowing, restore, delete, and resurrect all have
    * to compose correctly for a single row to match. This is the
    * in-plan twin of the durable T30 store
    * ([[graft.streaming.Streams.postingsApplyBatch]]), whose fold and
    * serve are spec-checked against the same batch path.
    *
    * Scale: per-epoch postings are increment-sized expression work; the
    * fold is one window keyed by doc_id (high-cardinality, never a
    * single-partition window); everything downstream is the audited
    * x4r plan.
    */
  /** The seven-epoch maintenance schedule shared by x4t and x4x: three
    * insert waves covering the corpus, a corrupting rewrite of the %10
    * docs, their restore, tombstone deletes of the %7 docs, and their
    * re-insert — converging to the plain corpus, so the folded index
    * must reproduce the batch answer hash-exactly. `rows` produces one
    * epoch's index rows for a doc slice; `tomb` its tombstone rows.
    */
  private def sevenEpochSchedule(docs: DataFrame,
      rows: DataFrame => DataFrame,
      tomb: DataFrame => DataFrame): DataFrame = {
    def ep(d: DataFrame, i: Int): DataFrame =
      rows(d).withColumn("live", lit(true)).withColumn("b", lit(i.toLong))
    val mod = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("text", concat(col("text"), lit(" corrupted")))
    Seq(
      ep(docs.filter(col("doc_id") % 3 === 0), 0),
      ep(docs.filter(col("doc_id") % 3 === 1), 1),
      ep(docs.filter(col("doc_id") % 3 === 2), 2),
      ep(mod, 3),
      ep(docs.filter(col("doc_id") % 10 === 0), 4),
      tomb(docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
        .withColumn("live", lit(false)).withColumn("b", lit(5L)),
      ep(docs.filter(col("doc_id") % 7 === 0), 6)).reduce(_ unionByName _)
  }

  /** Staged x4t postings index: the 7-epoch maintenance fold runs ONCE
    * per (session, sfDir) as a staged PRODUCER — its wall time lands in
    * the bench `staging` attribution — so the registered query times
    * the SERVE (BM25 over the folded index), matching the production
    * refresh path where index maintenance is the ingest pipeline's
    * continuous cost, not the query's.
    */
  def stagedBm25Index(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"x4t_postings:$dir") {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val all = sevenEpochSchedule(docs, docPostings,
        d => d.select(col("doc_id"), lit(null).cast("string").as("token"),
          lit(0L).as("tf"), lit(0L).as("dl")))
      foldWinnerBatch(all).drop("b", "live")
    }

  val x4tBm25Index: Q = (spark, dir) => {
    val folded = stagedBm25Index(spark, dir)
    val stats = folded.filter(col("token").isNull)
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    bm25FromPostings(folded, stats, bm25Terms)
  }

  /** The maintained index must reproduce the batch answer exactly. */
  val x4tSql: String = x4rSql

  // ------------------------------------------- X4u hybrid retrieval (RRF)
  /** X4u — hybrid retrieval: the x4r BM25 list and a dense cosine top-k
    * list fused by Reciprocal Rank Fusion (Cormack et al., SIGIR'09) —
    * the standard modern search stack (lexical + vector, rank-fused)
    * composed from this repo's two audited retrieval primitives over the
    * 1:1 doc_id ↔ vec_id fixture correspondence (the x5 join contract).
    *
    * Determinism: RRF is rank-based, and both input ranks order on
    * integer score (BM25 micro-units) or the x3-proven mirrored float
    * dot with an id tie-break; the fusion term 1e9 div (60 + rank) is
    * PURE INTEGER ARITHMETIC — no floats anywhere in the fusion, so the
    * fused ordering is exact in both engines. Docs absent from one list
    * contribute 0 from that side (the standard convention).
    *
    * Scale: each side's top-k is TakeOrderedAndProject (per-partition
    * heaps); the only windows run over ≤k and ≤2k rows (the documented
    * benign tiny-window class); the fusion join touches 2k rows total.
    */
  val rrfK = 60
  val hybridTopK = 10

  /** The lexical head of the hybrid stack: BM25 top-k as a 1-based rank
    * list (doc_id, brank). The window runs over ≤ k rows post-limit (the
    * documented benign tiny-window class). */
  def bm25TopRanks(docs: DataFrame, terms: Seq[String] = bm25Terms,
      k: Int = hybridTopK): DataFrame =
    rankBm25(bm25Retrieve(docs, terms), k)

  /** Rank an already-scored BM25 list (doc_id, …, score_u6) — the entry
    * the serving stack uses over [[graft.streaming.Streams.servedBm25]]'s
    * maintained-index output. */
  def rankBm25(scored: DataFrame, k: Int = hybridTopK): DataFrame = {
    val bw = Window.orderBy(col("score_u6").desc, col("doc_id"))
    scored.orderBy(col("score_u6").desc, col("doc_id")).limit(k)
      .withColumn("brank", row_number().over(bw).cast("long"))
      .select(col("doc_id"), col("brank"))
  }

  /** The corpus BM25 rank head for the fixed hybrid query terms, staged
    * per (session, sfDir): in production these ranks come off the
    * MAINTAINED T30 postings index (x4t proves maintained ≡ batch
    * hash-exact) — recomputing the corpus tokenize → score → rank chain
    * inside every hybrid consumer re-scans the world per query. x4u
    * keeps the inline computation (it IS the batch hybrid operator and
    * times that chain); the SERVING-stack queries (x4v, x4y) consume
    * this staged head, so their timed cost is the serve, with the head
    * build attributed to `staging` like every store fold.
    */
  def stagedBm25Ranks(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"bm25_ranks:$dir")(
      bm25TopRanks(Tables.documents(spark, dir)))

  /** The brute exact-cosine reference head shared by the x4v recall
    * bound and x4y's reference half — AUDIT input, not serve output
    * (the production stack never runs it); staged so the full-corpus
    * scan funds the bound once per session instead of once per
    * consumer query.
    */
  def stagedExactCosineHead(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"exact_cosine_head:$dir") {
      val e = Tables.embeddings(spark, dir)
      Vectors.cosineTopK(e.filter(col("vec_id") < 10), e, hybridTopK)
        .select(col("q_id"), col("vec_id").as("doc_id"),
          col("rank").cast("long").as("vrank"))
    }

  val x4uHybridRrf: Q = (spark, dir) => {
    val bmr = bm25TopRanks(Tables.documents(spark, dir))
    val emb = Tables.embeddings(spark, dir)
    val vr = Vectors.cosineTopK(emb.filter(col("vec_id") === 0), emb, hybridTopK)
      .select(col("vec_id").as("doc_id"), col("rank").cast("long").as("vrank"))
    rrfFuse(bmr, vr)
  }

  /** Fuse two rank lists — (doc_id, brank) and (doc_id, vrank), ranks
    * 1-based — by integer-exact RRF; see [[x4uHybridRrf]]. */
  def rrfFuse(bmr: DataFrame, vr: DataFrame): DataFrame = {
    val fused = bmr.join(vr, Seq("doc_id"), "full")
      .select(col("doc_id"),
        coalesce(col("brank"), lit(0L)).as("bm25_rank"),
        coalesce(col("vrank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_u",
        when(col("bm25_rank") > 0,
          expr(s"1000000000 div ($rrfK + bm25_rank)")).otherwise(lit(0L)) +
        when(col("vec_rank") > 0,
          expr(s"1000000000 div ($rrfK + vec_rank)")).otherwise(lit(0L)))
    val fw = Window.orderBy(col("rrf_u").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(fw).cast("long"))
      .select(col("fused_rank"), col("doc_id"), col("bm25_rank"),
        col("vec_rank"), col("rrf_u"))
      .orderBy(col("fused_rank"))
  }

  val x4uSql: String =
    s"""WITH $bm25SqlCtes,
       |bmt AS (SELECT doc_id, score_u6 FROM bm
       |        ORDER BY score_u6 DESC, doc_id LIMIT $hybridTopK),
       |bmr AS (SELECT doc_id, CAST(row_number() OVER (
       |          ORDER BY score_u6 DESC, doc_id) AS BIGINT) AS brank FROM bmt),
       |sims AS (SELECT c.vec_id AS doc_id,
       |  ${graft.Portable.dotSql("q.embedding", "c.embedding", Vectors.dim)} AS sim
       | FROM embeddings q CROSS JOIN embeddings c
       | WHERE q.vec_id = 0 AND c.vec_id <> 0),
       |vr AS (SELECT doc_id, CAST(row_number() OVER (
       |         ORDER BY sim DESC, doc_id) AS BIGINT) AS vrank FROM sims
       |       QUALIFY vrank <= $hybridTopK),
       |f AS (SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
       |       coalesce(b.brank, 0) AS bm25_rank,
       |       coalesce(v.vrank, 0) AS vec_rank,
       |       (CASE WHEN b.brank IS NULL THEN 0
       |             ELSE 1000000000 // ($rrfK + b.brank) END
       |        + CASE WHEN v.vrank IS NULL THEN 0
       |              ELSE 1000000000 // ($rrfK + v.vrank) END) AS rrf_u
       |      FROM bmr b FULL JOIN vr v ON b.doc_id = v.doc_id)
       |SELECT CAST(row_number() OVER (ORDER BY rrf_u DESC, doc_id) AS BIGINT)
       |   AS fused_rank,
       | doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
       | CAST(vec_rank AS BIGINT) AS vec_rank, CAST(rrf_u AS BIGINT) AS rrf_u
       |FROM f ORDER BY fused_rank""".stripMargin

  // ----------------------------------- X4v ANN-backed hybrid retrieval
  /** Per-QUERY RRF fusion — [[rrfFuse]] generalized to many query
    * vectors sharing one lexical list: `vr` carries (q_id, doc_id,
    * vrank) for every query, `bmr` the single (doc_id, brank) lexical
    * list, replicated per q_id via a broadcast (≤ k rows × |queries| —
    * driver-bounded, never corpus-sized). Same integer-exact fusion
    * term; the rank window partitions by q_id (high-cardinality at real
    * query volume, never single-partition).
    */
  def rrfFuseBy(bmr: DataFrame, vr: DataFrame): DataFrame = {
    val qids = vr.select(col("q_id")).distinct()
    val fused = qids.crossJoin(broadcast(bmr))
      .join(vr, Seq("q_id", "doc_id"), "full")
      .select(col("q_id"), col("doc_id"),
        coalesce(col("brank"), lit(0L)).as("bm25_rank"),
        coalesce(col("vrank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_u",
        when(col("bm25_rank") > 0,
          expr(s"1000000000 div ($rrfK + bm25_rank)")).otherwise(lit(0L)) +
        when(col("vec_rank") > 0,
          expr(s"1000000000 div ($rrfK + vec_rank)")).otherwise(lit(0L)))
    val fw = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_u").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(fw).cast("long"))
  }

  /** X4v — the 100 TB SERVING form of x4u: hybrid retrieval whose dense
    * head is the IVF-PQ INDEX PROBE (coarse route → ADC over stored
    * codes → exact re-rank, [[graft.operators.Vectors.pqSearchIndex]])
    * instead of x4u's brute full-corpus cosine scan, fused with the
    * BM25 list by the same integer-exact RRF. The dense head reads the
    * COMMITTED T18 GENERATION STORE — `_LATEST` pointer → frozen
    * models → winner-fold of the generation's index batches
    * ([[servedAnnRanks]]) — rather than refitting models inline, so
    * this query IS the end-to-end serving stack — store → probe →
    * fusion — with every component independently audited (`x3l` proves
    * stream-built ≡ batch-encoded; the T30 x4t oracle proves maintained
    * BM25 ≡ batch BM25) and the store read itself oracle-visible.
    *
    * Correctness is an oracle-checked recall BOUND against the exact
    * fusion (the x3f/x3q pattern): per query vector, ≥6 of the exact
    * fused top-10 must survive in the ANN fused top-10. The two fusions
    * share the lexical ranks, so a recall miss localizes to the dense
    * probe. nprobe=8 of 16 cells: fused recall compounds routing error
    * on TOP of ADC error (the x3n lesson, one level up), and 4/16
    * probes measurably under-recalls at sf0.01.
    *
    * Scale: probe cost is nprobe/nlist of the corpus per query (ADC
    * over codes, 8 bytes/vector here vs 256 for full vectors) + an
    * O(shortlist) exact re-rank — the brute head this retires scanned
    * the full corpus per query. The exact-fusion reference half exists
    * only to FEED THE BOUND at fixture scale; production serves the ANN
    * half alone.
    */
  /** Staged T18 GENERATION for the serving stack: one retrain per
    * (session, sfDir) fits the quantizer models, persists them frozen,
    * seeds the generation's index with the corpus encoded against
    * exactly those models, and commits the `_LATEST` pointer
    * ([[graft.streaming.Streams.retrainGeneration]]). The registered
    * x4v/x4y queries then SERVE from the committed generation — frozen
    * models + folded index read back from the store, never refit inline
    * — so the store read is oracle-visible, not spec-only. The staged
    * 1-row frame carries the generation root so the build cost lands in
    * the bench `staging` attribution.
    */
  def stagedGenerationRoot(spark: SparkSession, dir: String): String =
    Staged(spark, s"x4v_generation:$dir") {
      val rootPath = java.nio.file.Files.createTempDirectory("x4v_gen")
      // the generation store (models + encoded corpus) is session
      // scratch — reclaim it at JVM exit so repeated bench/test runs
      // don't accumulate full stores under java.io.tmpdir
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        if (Files.exists(rootPath))
          Files.walk(rootPath).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { Files.deleteIfExists(p); () })
      }))
      val root = rootPath.toString
      graft.streaming.Streams.retrainGeneration(
        Tables.embeddings(spark, dir), root, 1L)
      spark.range(1).select(lit(root).as("root"))
    }.head().getString(0)

  /** Session cache of a committed generation's frozen models, keyed by
    * (session, root, generation) — k×dim / m×ksub×dsub float tables, a
    * few KB. Entries of stopped sessions are evicted opportunistically
    * (the [[graft.Staged]] discipline). */
  private val genModelCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Long),
      (Array[Array[Float]], Array[Array[Array[Float]]])]

  /** The committed T18 generation's SERVING ASSETS, staged once per
    * (session, sfDir, generation): resolve `_LATEST` once, read the
    * frozen models once, fold the generation's index epochs once and
    * checkpoint the folded rows. Every consumer — the x4v dense head
    * and x4y's two probe pipelines — then probes the same materialized
    * index, exactly as a serving node keeps the folded index RESIDENT
    * between queries instead of re-resolving pointer + models +
    * winner-fold per request (a new generation gets a new key: the
    * T18 cutover invalidates by construction, never by TTL).
    */
  private def stagedGenAssets(spark: SparkSession, dir: String)
      : (DataFrame, Array[Array[Float]], Array[Array[Array[Float]]]) = {
    import graft.streaming.Streams
    val root = stagedGenerationRoot(spark, dir)
    val gen = Streams.currentGeneration(spark, root).getOrElse(
      sys.error(s"no committed generation under $root"))
    val index = Staged(spark, s"x4v_gen_index:$dir:g=$gen") {
      Streams.readVectorIndex(spark,
        s"${Streams.generationDir(root, gen)}/index")
    }
    genModelCache.filterInPlace { case ((s, _, _), _) =>
      !s.sparkContext.isStopped }
    val (coarse, books) = genModelCache.getOrElseUpdate((spark, root, gen),
      Streams.readGenerationModels(spark, root, gen))
    (index, coarse, books)
  }

  /** The ANN rank list served from the committed generation's staged
    * assets ([[stagedGenAssets]]). Shared by x4v (recall bound) and x4y
    * (diversified serve).
    */
  private def servedAnnRanks(spark: SparkSession, dir: String,
      queries: DataFrame, nprobe: Int = 8): DataFrame = {
    val (index, coarse, books) = stagedGenAssets(spark, dir)
    Vectors.pqSearchIndex(queries, index, coarse, books,
        k = hybridTopK, nprobe = nprobe)
      .select(col("q_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vrank"))
  }

  val x4vHybridAnn: Q = (spark, dir) => {
    val q = (e: DataFrame) => e.filter(col("vec_id") < 10)
    val e = Tables.embeddings(spark, dir)
    // lexical head off the staged rank table (production: the T30
    // index); exact head staged too — both feed the BOUND, the timed
    // path is the serve
    val bmr = stagedBm25Ranks(spark, dir)
    val exactVr = stagedExactCosineHead(spark, dir)
    // dense head SERVED from the T18 generation store (frozen models +
    // folded index), not refit inline — the production read path
    val annVr = servedAnnRanks(spark, dir, q(e))
    val exactF = rrfFuseBy(bmr, exactVr)
      .filter(col("fused_rank") <= hybridTopK)
      .select(col("q_id"), col("doc_id"))
    val annF = rrfFuseBy(bmr, annVr)
      .filter(col("fused_rank") <= hybridTopK)
      .select(col("q_id"), col("doc_id"))
    val hits = exactF.join(annF, Seq("q_id", "doc_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    q(e).select(col("vec_id").as("q_id"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        (coalesce(col("n_hit"), lit(0L)) >= 6).as("recall_ok"))
      .orderBy(col("q_id"))
  }
  val x4vSql: String =
    """SELECT vec_id AS q_id, true AS recall_ok
      |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin

  // --------------------------------- X4y diversified ANN serving (MMR)
  /** The fused-list → MMR tail shared by x4y's ANN and exact halves:
    * shortlist = the fused top-`n` per query, relevance = EXACT cosine
    * to the query re-scored on the shortlist only (the standard
    * ANN-candidates / exact-re-rank split — |Q|·n rows of exact work,
    * never corpus-sized), pairwise shortlist sims through the same
    * native dot expression, then the x3r greedy selection. `qe` is the
    * QUERY embedding table (q_id, qe) — |Q| rows, materialized by the
    * caller and shared with [[mmrUtility]]; it rides a broadcast, which
    * is only sound because it is query-sized, never corpus-sized.
    */
  private def mmrOverFused(fused: DataFrame, e: DataFrame, qe: DataFrame,
      n: Int, k: Int): DataFrame = {
    val shortlist = fused.filter(col("fused_rank") <= n)
      .select(col("q_id"), col("doc_id").as("vec_id"))
    val cand = shortlist
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qe), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.VectorFunctions.dotF32(col("qe"), col("embedding"))
          .as("rel"),
        col("embedding"))
      .localCheckpoint() // feeds the pair join and the cogroup input
    val pairs = cand
      .select(col("q_id"), col("vec_id").as("a"), col("embedding").as("ea"))
      .join(cand.select(col("q_id"), col("vec_id").as("b"),
        col("embedding").as("eb")), Seq("q_id"))
      .filter(col("a") =!= col("b"))
      .select(col("q_id"), col("a"), col("b"),
        graft.functions.VectorFunctions.dotF32(col("ea"), col("eb"))
          .as("sim"))
    Vectors.mmrSelect(
      cand.select(col("q_id"), col("vec_id"), col("rel")), pairs, k)
  }

  /** X4y — DIVERSIFIED ANN SERVING: the full production retrieval
    * composition — T18 generation store → IVF-PQ probe → integer RRF
    * fusion with the BM25 list → exact re-rank on the fused shortlist →
    * x3r greedy MMR diversification — audited END-TO-END under one
    * bound, closing the gap where x4v (fusion) and x3r (MMR) were each
    * audited alone but their composition never was. The reference half
    * runs the IDENTICAL fusion + MMR tail off the brute exact cosine
    * head, so a bound miss localizes to the dense probe (the x4v
    * pattern, one stage deeper).
    *
    * The bound is TWO-PART because greedy MMR is chaotic in pick
    * IDENTITY — one swapped shortlist member can reroute every later
    * pick (measured: identity overlap dips to 4/8 at sf0.001/sf0.1
    * while pick QUALITY stays within 0.093) — so identity alone would
    * be either vacuous or fixture-tuned. Per query: (1) a floor
    * overlap ≥ `x4yOverlapMin` of the `mmrK` picks, and (2) the ANN
    * picks' exact-scored MMR objective ([[mmrUtility]]) within
    * `x4yUtilMargin` of the exact head's — the greedy-quality-transfer
    * bound that actually certifies the serve.
    *
    * Scale: probe cost is the x4v serve; everything after runs on
    * |Q|·shortlist rows (the MMR loop is O(k) wall-clock with all
    * queries advancing in parallel — the x3r audit). The exact half
    * exists only to feed the bound at fixture scale; production serves
    * the ANN half alone.
    */
  val x4yOverlapMin = 3
  val x4yUtilMargin = 0.15
  val x4yDiverseAnn: Q = (spark, dir) => {
    val q = (e: DataFrame) => e.filter(col("vec_id") < 10)
    val e = Tables.embeddings(spark, dir)
    // lexical + exact-reference heads off the staged tables (the x4v
    // sharing: production serves lexical from T30; the exact head only
    // feeds the bound)
    val bmr = stagedBm25Ranks(spark, dir)
    // the query embeddings are |Q| rows — materialized ONCE and reused
    // by every exact-rescore consumer (shortlist rel, pair sims,
    // utility); broadcasting the raw embeddings table here would haul
    // the whole corpus through the driver
    val qe = q(e).select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .localCheckpoint()
    val n = Vectors.mmrShortlist
    val annF = rrfFuseBy(bmr, servedAnnRanks(spark, dir, q(e), nprobe = 12))
    val exactF = rrfFuseBy(bmr, stagedExactCosineHead(spark, dir))
    // ONE pipeline for both halves: the head is PACKED INTO THE QUERY
    // KEY (q_id·2 = ANN, q_id·2+1 = exact reference), so the shared
    // shortlist → exact re-score → pair-sims → greedy-cogroup chain and
    // the utility re-score each run ONCE over the tagged union instead
    // of once per head — the per-query greedy is group-local, so packed
    // groups select identical picks, and the serve sheds half its job
    // barriers (41 → ~24 jobs measured at sf0.1; the query was
    // barrier-bound: 1.2 s of summed task time under a 2.1–4.3 s wall)
    // PACKING CONTRACT: q_id ≥ 0 (here vec_id < 10 by construction). A
    // negative id would break the parity split (% 2 yields −1, silently
    // dropping exact-half rows) and the div-2 unpacking — mmrOverFused
    // itself accepts any integral ids, so the assumption lives HERE,
    // where the ids are packed (r17 ADVICE).
    val tagged = annF
      .select((col("q_id") * 2).as("q_id"), col("doc_id"), col("fused_rank"))
      .unionByName(exactF.select((col("q_id") * 2 + 1).as("q_id"),
        col("doc_id"), col("fused_rank")))
    val qeTag = qe.select((col("q_id") * 2).as("q_id"), col("qe"))
      .unionByName(qe.select((col("q_id") * 2 + 1).as("q_id"), col("qe")))
    // the picks set feeds THREE plan branches (overlap join twice, the
    // utility score); subtree reuse is not CSE'd, so without a
    // checkpoint the whole probe + fusion + greedy chain re-executes
    // per branch
    val picks =
      mmrOverFused(tagged, e, qeTag, n, Vectors.mmrK).localCheckpoint()
    // Overlap: a vec_id picked by BOTH halves of one base query, counted
    // in one aggregation chain over the packed ids instead of the former
    // half(0)⋈half(1) self-join — per-query picks are distinct vec_ids,
    // so countDistinct(parity) == 2 is exactly membership in both
    // halves. (q_ids are non-negative by the packing contract below, so
    // div/% halving is exact.)
    val hits = picks
      .select(expr("q_id div 2").as("qb"), (col("q_id") % 2).as("par"),
        col("vec_id"))
      .groupBy(col("qb"), col("vec_id"))
      .agg(countDistinct(col("par")).as("np"))
      .filter(col("np") === 2)
      .groupBy(col("qb")).agg(count(lit(1)).as("n_hit"))
    // Both halves' utilities in ONE pass: the util subtree is not CSE'd,
    // so the former parity filters re-executed the whole pair join +
    // both aggregations once per branch; a parity pivot reads it once.
    // Every tagged q_id has exactly one util row (k picks each), so the
    // max(when(...)) picks that single value per half.
    val util2 = mmrUtility(picks, e, qeTag)
      .select(expr("q_id div 2").as("qb"), (col("q_id") % 2).as("par"),
        col("util"))
      .groupBy(col("qb"))
      .agg(max(when(col("par") === 0, col("util"))).as("ua"),
        max(when(col("par") === 1, col("util"))).as("ue"))
    q(e).select(col("vec_id").as("q_id"))
      .join(hits.withColumnRenamed("qb", "q_id"), Seq("q_id"), "left")
      .join(util2.withColumnRenamed("qb", "q_id"), Seq("q_id"), "left")
      .select(col("q_id"),
        (coalesce(col("n_hit"), lit(0L)) >= x4yOverlapMin &&
          col("ua") >= col("ue") - lit(x4yUtilMargin)).as("mmr_ok"))
      .orderBy(col("q_id"))
  }

  /** The exact MMR objective a pick SEQUENCE actually achieved,
    * re-evaluated with exact cosines: Σ over picks of
    * ½·rel(q,d) − ½·max sim(d, earlier picks) — the greedy marginal
    * gains summed. Both x4y halves are scored by this same function,
    * so the bound compares QUALITY where pick identity is chaotic.
    */
  private def mmrUtility(picks: DataFrame, e: DataFrame,
      qe: DataFrame): DataFrame = {
    val p = picks
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qe), Seq("q_id"))
      .select(col("q_id"), col("vec_id"), col("pick"),
        graft.functions.VectorFunctions.dotF32(col("qe"), col("embedding")).as("rel"),
        col("embedding"))
      .localCheckpoint()
    val ms = p.select(col("q_id"), col("vec_id"), col("pick"), col("embedding").as("ea"))
      .join(p.select(col("q_id"), col("vec_id").as("b"), col("pick").as("pb"),
        col("embedding").as("eb")), Seq("q_id"))
      .filter(col("pb") < col("pick"))
      .select(col("q_id"), col("vec_id"), col("pick"),
        graft.functions.VectorFunctions.dotF32(col("ea"), col("eb")).as("sim"))
      .groupBy(col("q_id"), col("vec_id"), col("pick"))
      .agg(max(col("sim")).as("maxsim"))
    p.select(col("q_id"), col("vec_id"), col("rel"))
      .join(ms.select(col("q_id"), col("vec_id"), col("maxsim")),
        Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(lit(0.5) * col("rel")
        - lit(0.5) * coalesce(col("maxsim"), lit(0.0))).as("util"))
  }
  val x4ySql: String =
    """SELECT vec_id AS q_id, true AS mmr_ok
      |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin

  // ----------------------------------------------- X4w phrase retrieval
  /** X4w — exact PHRASE matching over positional postings: the retrieval
    * feature BM25's bag-of-words scoring cannot express ("data change
    * capture" as a phrase, not three independent terms). The classic
    * index answer is positional postings — (doc, token, position) — and
    * the match is pure relational algebra, no string rescans: a token
    * matching phrase slot i ANCHORS a candidate occurrence at
    * position − i, so an anchor with ALL m slots present is exactly a
    * phrase occurrence. One groupBy over the slot-tagged anchor union
    * replaces the m−1 self-joins of the textbook formulation, and
    * repeated phrase terms (the case that breaks naive adjacency joins —
    * one posting row can satisfy several slots) fall out correctly
    * because each slot contributes its own anchor row (spec).
    *
    * Candidate discipline = x4r's: the rarest phrase term gates the
    * DOC set (computed argmin-df, 1-row broadcast — a doc without the
    * rarest term cannot contain the phrase), so the groupBy carries the
    * gated postings of the phrase's terms only, never the corpus. At
    * 100 TB the positional lists come straight off a maintained
    * (doc, token, pos) index — the T30 postings store carries tf today;
    * positions are the same fold with pos kept — and the anchor groupBy
    * shuffles O(Σ gated postings), the smallest any exact phrase match
    * can touch.
    */
  def phraseMatch(docs: DataFrame, phrase: Seq[String]): DataFrame =
    phraseFromPositions(
      docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token"))),
      phrase)

  /** The phrase-matching tail shared by the batch path ([[phraseMatch]])
    * and the maintained positional-index paths (`x4x` inline fold,
    * [[graft.streaming.Streams.servedPhrase]]): `positions` carries one
    * row per (doc_id, pos, token) — extra non-phrase tokens and
    * null-token META rows are dropped by the term filter — so every
    * consumer matches through the SAME anchor fold over the same exact
    * integers, and served results cannot drift from batch results by
    * construction (the [[bm25FromPostings]] contract).
    */
  def phraseFromPositions(positions: DataFrame,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val pos = positions.filter(col("token").isin(phrase.distinct: _*))
    val dfreq = pos.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val gate = dfreq.orderBy(col("df").asc, col("token").asc).limit(1)
      .select(col("token").as("__gate_token"))
    val cand = pos.join(broadcast(gate), col("token") === col("__gate_token"))
      .select(col("doc_id")).distinct()
    val slots = phrase.zipWithIndex.map { case (w, i) =>
      pos.filter(col("token") === w)
        .select(col("doc_id"), (col("pos") - i).as("anchor"),
          lit(i).as("slot"))
    }.reduce(_ unionByName _)
    slots.join(cand, Seq("doc_id"))
      .filter(col("anchor") >= 0)
      .groupBy(col("doc_id"), col("anchor"))
      .agg(countDistinct(col("slot")).as("m"))
      .filter(col("m") === phrase.size)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("doc_id"))
  }

  val phraseTerms = Seq("part", "filter", "scan")
  val x4wPhrase: Q = (spark, dir) =>
    phraseMatch(Tables.documents(spark, dir), phraseTerms)

  /** Positional postings of a corpus slice: one row per (doc, token,
    * pos) plus one META row per doc (null token, pos −1) — the
    * doc-exists marker a delete tombstone replaces. [[docPostings]]'s
    * convention with positions instead of (tf, dl); the T35 store folds
    * these winner-batch-per-doc exactly like T30 folds the BM25 rows.
    */
  def docPositions(docs: DataFrame): DataFrame = {
    val rows = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .select(col("doc_id"), col("token"), col("pos").cast("long").as("pos"))
    val meta = docs.select(col("doc_id"),
      lit(null).cast("string").as("token"), lit(-1L).as("pos"))
    meta.unionByName(rows)
  }

  val x4wSql: String = {
    val conds = phraseTerms.zipWithIndex
      .map { case (w, i) => s"t[i+$i] = '$w'" }.mkString(" AND ")
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |p AS (SELECT doc_id, t,
       |  unnest(generate_series(1, len(t) - ${phraseTerms.size - 1})) AS i
       | FROM tok),
       |a AS (SELECT doc_id FROM p WHERE $conds)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
       |FROM a GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** X4x — phrase retrieval from the MAINTAINED positional index: the
    * same seven-epoch insert/corrupt/restore/delete/re-insert schedule
    * as x4t, folded winner-batch-per-doc and matched through the shared
    * [[phraseFromPositions]] tail. The fixture's final state equals the
    * plain corpus (the corrupting epochs are superseded), so the oracle
    * is x4wSql VERBATIM — maintained ≡ batch, hash-exact. The corrupt
    * epoch APPENDS a token (shifting nothing) and the delete/re-insert
    * cycle exercises the tombstone: a phrase hit in a deleted doc must
    * vanish and return.
    */
  /** Staged x4x positional index: the 7-epoch fold as a staged producer
    * (bench `staging` attribution); the registered query is the SERVE —
    * phrase matching over the maintained positions — the production
    * refresh shape, exactly like [[stagedBm25Index]].
    */
  def stagedPhrasePositions(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"x4x_positions:$dir") {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val all = sevenEpochSchedule(docs, docPositions,
        d => d.select(col("doc_id"), lit(null).cast("string").as("token"),
          lit(-1L).as("pos")))
      foldWinnerBatch(all).drop("b", "live")
    }

  val x4xPhraseIndex: Q = (spark, dir) =>
    phraseFromPositions(stagedPhrasePositions(spark, dir), phraseTerms)

  /** The maintained positional index must reproduce the batch answer. */
  val x4xSql: String = x4wSql

  // --------------------------------------------------- X4s quality probe
  /** Closed-form linear quality probe: fit least-squares weights for
    * `P(lang = en)` on two surface features (token count, char count) and
    * score a doc slice — the fasttext-classifier-shaped quality-filter
    * stage of a training-data pipeline, reduced to its distributable core.
    *
    * Training is ONE corpus pass producing nine exact-integer sufficient
    * statistics (n, Σx, Σx², Σxy — map-side-combined BIGINT sums, a 1-row
    * result); the 3×3 normal equations are solved on the DRIVER by
    * Cramer's rule over those exact integers (the x3k discipline: the
    * driver touches O(d²) numbers, never rows). Because every input is an
    * exact integer and the solve is a fixed-order scalar formula, the
    * weights — and therefore every prediction — are bit-identical doubles
    * in both engines; the oracle replays the identical Cramer expansion in
    * SQL. No gradient loop: for a linear probe the normal equations ARE
    * the optimum, so there is nothing to iterate (and nothing to drift).
    *
    * 100 TB shape: the stats aggregation is the only corpus-proportional
    * work (9 longs per partition after partial agg); the scored slice is a
    * pushed-down `doc_id < sliceMax` scan with the weights as plan
    * literals. BIGINT headroom: Σx² at 5·10⁸ docs × (10³ tokens)² ≈ 5e14,
    * three orders below overflow.
    */
  def qualityProbe(docs: DataFrame, sliceMax: Long = 100L): DataFrame = {
    val feats = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("x1"),
      col("n_chars").as("x2"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val r = feats.agg(
      count(lit(1)).as("n"), sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"), sum(col("y")).as("sy"),
      sum(col("x1") * col("y")).as("s1y"), sum(col("x2") * col("y")).as("s2y"))
      .collect()(0)
    require(!r.isNullAt(1), "qualityProbe needs a non-empty corpus")
    val v = (0 until 9).map(i => r.getLong(i).toDouble)
    val (n, s1, s2, s11, s12, s22, sy, s1y, s2y) =
      (v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7), v(8))
    // Cramer's rule, first-row cofactor expansion — the SQL oracle carries
    // this exact expression text; association order must not change.
    val det = n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)
    require(det != 0.0, "qualityProbe: singular normal matrix " +
      "(collinear features — e.g. every doc identical); refusing NaN weights")
    val w0 = (sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)) / det
    val w1 = (n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)) / det
    val w2 = (n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)) / det
    val score = lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2")
    feats.filter(col("doc_id") < sliceMax)
      .select(col("doc_id"), col("y").as("label"),
        round(score, 6).as("score"), (score >= lit(0.5)).as("keep"))
      .orderBy(col("doc_id"))
  }

  val x4sQualityProbe: Q = (spark, dir) =>
    qualityProbe(Tables.documents(spark, dir))

  val x4sSql: String =
    """WITH f AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
      |    n_chars AS x2,
      |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM documents),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
      |    CAST(sum(x1*x1) AS BIGINT) AS s11, CAST(sum(x1*x2) AS BIGINT) AS s12,
      |    CAST(sum(x2*x2) AS BIGINT) AS s22, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x1*y) AS BIGINT) AS s1y, CAST(sum(x2*y) AS BIGINT) AS s2y
      |  FROM f),
      |d AS (SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
      |    CAST(s2 AS DOUBLE) AS s2, CAST(s11 AS DOUBLE) AS s11,
      |    CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
      |    CAST(sy AS DOUBLE) AS sy, CAST(s1y AS DOUBLE) AS s1y,
      |    CAST(s2y AS DOUBLE) AS s2y FROM s),
      |w AS (SELECT
      |    (sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))
      |      / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)) AS w0,
      |    (n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))
      |      / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)) AS w1,
      |    (n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))
      |      / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)) AS w2
      |  FROM d)
      |SELECT doc_id, y AS label,
      |  round(w0 + w1*x1 + w2*x2, 6) AS score,
      |  (w0 + w1*x1 + w2*x2 >= 0.5) AS keep
      |FROM f CROSS JOIN w WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- X7d bigram familiarity
  /** Language-model-ish familiarity score without a model: each document is
    * scored by the mean corpus frequency of its bigram occurrences — high
    * means boilerplate/templated text, low means rare/novel text. The
    * integer numerator/denominator are exact; the one ratio is a mirrored
    * IEEE division.
    *
    * Scale: the bigram stream is explode-parallel over fixed-width md5
    * keys; the join discipline lives in [[bigramFamiliarity]] (both sides
    * pre-aggregated — see its scaladoc).
    */
  def bigrams(docs: DataFrame): DataFrame = {
    // same exploded-index shape as [[shingles]] width=2, but KEEPING
    // duplicate occurrences (frequency weighting needs multiplicity)
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"), explode(expr(
        "CASE WHEN size(t) >= 2 THEN sequence(1, size(t)-1) ELSE array() END"))
        .as("i"))
      .select(col("doc_id"),
        md5(concat_ws(" ", element_at(col("t"), col("i")),
          element_at(col("t"), col("i") + 1)).cast("binary")).as("bg"))
  }

  /** Scale shape (the r4-verdict fix): BOTH join inputs are pre-aggregated.
    * `perDoc` collapses the occurrence stream to one row per (doc_id,
    * bigram) with its multiplicity, so a hot bigram ("of the"-class
    * boilerplate) carries ONE row per containing document into the
    * frequency join — never one per occurrence — and the join output is
    * bounded by the distinct (doc, bigram) pair count regardless of flood
    * factor. The frequency table is derived from `perDoc` by a second
    * map-side-combined sum, so no shape depends on it broadcasting: when
    * the distinct-bigram count outgrows the broadcast threshold at corpus
    * scale, the join degrades to a shuffle keyed by `bg` whose build side
    * is one row per key — exactly the shape AQE skew-splitting handles.
    */
  def bigramFamiliarity(docs: DataFrame): DataFrame = {
    // ONE shuffle of the occurrence stream, by doc_id: hash(doc_id)
    // satisfies the clustering requirement of BOTH downstream per-doc
    // aggregations (doc_id ⊆ (doc_id, bg)), so the pre-agg and the final
    // fold run exchange-free on this partitioning — only the bounded
    // frequency table shuffles again (by bg, after its own map-side sum)
    val perDoc = bigrams(docs)
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
    val freq = perDoc.groupBy(col("bg")).agg(sum(col("cnt")).as("bgf"))
    perDoc.join(freq, "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("bgf")).as("fam_num"))
      .select(col("doc_id"), col("n_bigrams"), col("fam_num"),
        round(col("fam_num") / col("n_bigrams"), 4).as("familiarity"))
  }

  val x7dBigramFamiliarity: Q = (spark, dir) =>
    bigramFamiliarity(Tables.documents(spark, dir)).orderBy(col("doc_id"))
  val x7dSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(
      |  CASE WHEN len(t) >= 2
      |   THEN list_transform(generate_series(1, len(t)-1),
      |          i -> md5(t[i] || ' ' || t[i+1]))
      |   ELSE [] END) AS bg
      | FROM tok),
      |freq AS (SELECT bg, CAST(count(*) AS BIGINT) AS bgf FROM bg GROUP BY 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      | CAST(sum(bgf) AS BIGINT) AS fam_num,
      | round(sum(bgf) / count(*), 4) AS familiarity
      |FROM bg JOIN freq USING (bg)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- X7e decontamination
  /** Benchmark decontamination: flag training documents sharing any
    * `width`-token shingle with the benchmark split (the GPT-3 appendix-C
    * n-gram-overlap rule). Here the benchmark set is the doc_id < `benchMax`
    * slice of the same corpus; in production it is the eval suites.
    *
    * Scale (the whole point of this shape): the benchmark shingle set is
    * small and bounded (eval suites, not the corpus), so it BROADCASTS; the
    * 100 TB training side is only scanned, hash-probed, and map-side
    * partial-agged — the join adds no shuffle of the big side.
    */
  def decontaminate(docs: DataFrame, sh: DataFrame, benchMax: Long): DataFrame = {
    val benchShingles = sh.filter(col("doc_id") < benchMax)
      .select(col("hs")).distinct()
    val hits = sh.filter(col("doc_id") >= benchMax)
      .join(broadcast(benchShingles), "hs")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    docs.filter(col("doc_id") >= benchMax).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  val x7eDecontamination: Q = (spark, dir) =>
    decontaminate(Tables.documents(spark, dir),
      stagedShingles(spark, dir), benchMax = 50L)
      .orderBy(col("doc_id"))
  val x7eSql: String = shinglesCte() + """,
      |bench AS (SELECT DISTINCT hs FROM sh WHERE doc_id < 50),
      |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
      |         FROM sh JOIN bench USING (hs) WHERE doc_id >= 50 GROUP BY 1)
      |SELECT d.doc_id, coalesce(n_hits, 0) AS n_hits,
      | coalesce(n_hits, 0) > 0 AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
      | LEFT JOIN hits ON d.doc_id = hits.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------- X7k contamination severity (fraction)
  /** X7k — contamination SEVERITY: the fraction of a document's distinct
    * shingles present in the benchmark set, with the removal decision at
    * a threshold (the PaLM/Llama-style "fraction of n-grams seen" rule)
    * rather than x7e's any-hit flag. The distinction matters for data
    * economics: an incidental single-phrase collision (a common idiom, a
    * quoted headline) is not contamination, and the any-hit rule
    * over-removes exactly the long documents most valuable for training;
    * the fractional rule keeps them while still removing true copies and
    * near-copies of eval items.
    *
    * One fused probe pass (the x7i discipline): the broadcast bench set
    * rides a LEFT join so a single map-side-combined aggregation yields
    * both the total shingle count and the hit count — the corpus is
    * scanned once, never shuffled for the join. The `dirty` gate uses
    * integer arithmetic (`2·hits ≥ total`), not a float compare, so the
    * committed decision cannot drift across engines.
    */
  def contaminationFraction(docs: DataFrame, sh: DataFrame,
      benchMax: Long): DataFrame = {
    val bench = sh.filter(col("doc_id") < benchMax)
      .select(col("hs")).distinct().withColumn("__b", lit(1))
    val stats = sh.filter(col("doc_id") >= benchMax)
      .join(broadcast(bench), Seq("hs"), "left")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_shingles"),
        count(col("__b")).as("n_hits"))
    docs.filter(col("doc_id") >= benchMax).select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_hits") / col("n_shingles"), 4))
          .as("frac"),
        (coalesce(col("n_hits"), lit(0L)) * 2 >=
          coalesce(col("n_shingles"), lit(0L))
          && coalesce(col("n_hits"), lit(0L)) > 0).as("dirty"))
  }

  val x7kContamFraction: Q = (spark, dir) =>
    contaminationFraction(Tables.documents(spark, dir),
      stagedShingles(spark, dir), benchMax = 50L)
      .orderBy(col("doc_id"))
  val x7kSql: String = shinglesCte() + """,
      |bench AS (SELECT DISTINCT hs FROM sh WHERE doc_id < 50),
      |st AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |        CAST(count(b.hs) AS BIGINT) AS n_hits
      |       FROM sh s LEFT JOIN bench b USING (hs)
      |       WHERE s.doc_id >= 50 GROUP BY 1)
      |SELECT d.doc_id,
      | coalesce(n_shingles, 0) AS n_shingles,
      | coalesce(n_hits, 0) AS n_hits,
      | CASE WHEN coalesce(n_shingles, 0) = 0 THEN 0.0
      |  ELSE round(n_hits / n_shingles, 4) END AS frac,
      | coalesce(n_hits, 0) * 2 >= coalesce(n_shingles, 0)
      |  AND coalesce(n_hits, 0) > 0 AS dirty
      |FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
      | LEFT JOIN st ON d.doc_id = st.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------- X7i Bloom decontamination bound
  /** The BROADCAST-FREE scale path of [[decontaminate]]: when the
    * benchmark shingle set outgrows what an exact broadcast set can
    * carry (a full eval-suite union at production scale), a Bloom
    * filter stands in — numBits/8 bytes regardless of item count, built
    * by one distributed OR-merge aggregation
    * ([[graft.functions.BloomMembership]]) and shipped to every probe
    * task as a plan literal. The guarantee DIRECTION is what makes this
    * safe: Bloom has NO false negatives, so a truly contaminated
    * document is ALWAYS flagged (a missed contamination poisons an
    * eval; an over-removed clean document only costs data), and the
    * false-positive rate — a per-document ANY over ~hundreds of shingle
    * probes, so size the sketch for a per-PROBE fpp far below
    * 1/shingles-per-doc — bounds the over-removal.
    *
    * Registered query contract (the x4m pattern — sketch behavior is
    * engine-specific, so the ORACLE checks the THEOREMS, not the bits):
    * per language, exact counts (n_docs, n_contaminated — cross-engine
    * via the same exact join as x7e) plus two booleans the oracle
    * asserts as literal `true`: `no_miss_ok` (every exactly-contaminated
    * doc is bloom-flagged — the no-false-negative theorem) and
    * `overflag_ok` (bloom-flagged clean docs ≤ `overflagSlack` of clean
    * docs — the sized-fpp bound).
    */
  def bloomDecontaminate(docs: DataFrame, sh: DataFrame, benchMax: Long,
      targetFpp: Double = 1e-5, overflagSlack: Double = 0.05): DataFrame = {
    import graft.functions.BloomMembership
    val bench = sh.filter(col("doc_id") < benchMax).select(col("hs")).distinct()
    // SIZE FROM MEASUREMENT, not fixed constants: a fixed sketch holds
    // its fpp only while the bench set stays under its design count —
    // grown past it, the per-doc ANY over hundreds of probes flags
    // nearly every clean doc and the overflag bound goes red. The
    // measured distinct-shingle count (one map-side-combined agg over
    // the SMALL bench side — the same bounded class as the sketch build
    // it feeds) keeps the per-probe fpp at `targetFpp` at any eval-suite
    // scale. Default 1e-5: a doc probing ~500 distinct shingles then
    // over-flags with prob ≈ 1−(1−1e-5)^500 ≈ 0.5%, an order under the
    // 5% overflagSlack bound the oracle asserts.
    val n = math.max(1L, bench.count())
    // one bounded driver artifact: bitsFor(n, p)/8 bytes ≈ 3 bytes/item
    val sketch = bench
      .agg(BloomMembership.bloomAgg(col("hs"), n,
        BloomMembership.bitsFor(n, targetFpp)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    // ONE pass over the probe shingle stream computes both halves of the
    // bound: the bloom probe (per-row expression against the plan
    // literal) and the exact truth (left join against the broadcast
    // bench set — the x7e oracle side), folded by a single
    // map-side-combined doc_id aggregation instead of two parallel
    // aggregations joined back per doc
    val probe = sh.filter(col("doc_id") >= benchMax)
    val flags = probe
      .join(broadcast(bench.withColumn("__b", lit(1))), Seq("hs"), "left")
      .groupBy(col("doc_id"))
      .agg(
        max(BloomMembership.mightContain(sketch, col("hs")).cast("int"))
          .as("bloom_hit"),
        sum(col("__b").isNotNull.cast("long")).as("n_hits"))
    docs.filter(col("doc_id") >= benchMax).select(col("doc_id"), col("lang"))
      .join(flags, Seq("doc_id"), "left")
      .select(col("lang"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contam"),
        (coalesce(col("bloom_hit"), lit(0)) > 0).as("flagged"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("contam").cast("long")).as("n_contaminated"),
        min(!col("contam") || col("flagged")).as("no_miss_ok"),
        (sum((col("flagged") && !col("contam")).cast("long")) <=
          ceil(lit(overflagSlack) *
            sum((!col("contam")).cast("long")))).as("overflag_ok"))
  }

  val x7iBloomDecontaminate: Q = (spark, dir) =>
    bloomDecontaminate(Tables.documents(spark, dir),
      stagedShingles(spark, dir), benchMax = 50L)
      .orderBy(col("lang"))
  val x7iSql: String = shinglesCte() + """,
      |bench AS (SELECT DISTINCT hs FROM sh WHERE doc_id < 50),
      |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
      |         FROM sh JOIN bench USING (hs) WHERE doc_id >= 50 GROUP BY 1)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      | CAST(count(CASE WHEN n_hits > 0 THEN 1 END) AS BIGINT) AS n_contaminated,
      | true AS no_miss_ok, true AS overflag_ok
      |FROM (SELECT d.doc_id, d.lang, coalesce(h.n_hits, 0) AS n_hits
      |      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |      WHERE d.doc_id >= 50)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------- X7h DSIR importance selection
  /** Importance-resampling data selection (the DSIR shape: fit target and
    * pool bag-of-bigram multinomials with add-1 smoothing, score each pool
    * document by its importance log-weight Σ_f c_f·(ln p_f − ln q_f), keep
    * documents that look more target-like than pool-like). The target
    * exemplar split is the doc_id < `targetMax` slice (same convention as
    * x7e's benchmark split); in production it is the curated domain sample
    * the corpus should be steered toward.
    *
    * Exactness discipline: the per-feature delta is quantized to
    * micro-nat BIGINTs at the feature row (one deterministic expression
    * over exact integer counts — the x7b fixed-point pattern), so the
    * per-document fold is an exact integer sum with no cross-engine or
    * partition-order float drift; `selected` is an exact integer sign
    * test.
    *
    * Scale (x7d's discipline): ONE repartition of the occurrence stream by
    * doc_id collapses it to per-(doc, bigram) multiplicities; both
    * per-split frequency tables derive from it by map-side-combined sums,
    * so the probe side never re-shuffles; the delta table is one bounded
    * row per distinct bigram (joined by key — degrades gracefully from
    * broadcast to keyed shuffle as vocabulary grows); the three corpus
    * scalars (feature masses + vocabulary size) are a 1-row broadcast.
    */
  def dsirSelect(docs: DataFrame, targetMax: Long = 50L): DataFrame = {
    val perDoc = bigrams(docs)
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
    val ct = perDoc.filter(col("doc_id") < targetMax)
      .groupBy(col("bg")).agg(sum(col("c")).as("ct"))
    val cs = perDoc.filter(col("doc_id") >= targetMax)
      .groupBy(col("bg")).agg(sum(col("c")).as("cs"))
    val f = ct.join(cs, Seq("bg"), "full")
      .select(col("bg"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cs"), lit(0L)).as("cs"))
    val scalars = f.agg(sum(col("ct")).as("nt"), sum(col("cs")).as("ns"),
      count(lit(1)).as("v"))
    val dq = f.crossJoin(broadcast(scalars))
      .select(col("bg"), round(lit(1e6) *
          (log(col("ct") + 1) - log(col("nt") + col("v"))
            - log(col("cs") + 1) + log(col("ns") + col("v"))))
        .cast("long").as("dqf"))
    // Pinned like x1c's join-back: without the hint, Catalyst's collapsed
    // post-explode estimate broadcasts the corpus-proportional
    // per-(doc,bigram) POOL side (observed at sf0.1); shuffle_hash on dq
    // builds on the one-bounded-row-per-key delta table instead, and AQE
    // may still flip to broadcasting dq while it is genuinely small.
    perDoc.filter(col("doc_id") >= targetMax).join(dq.hint("shuffle_hash"), "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("dqf")).as("logw_micro"))
      .select(col("doc_id"), col("n_feats"), col("logw_micro"),
        (col("logw_micro") > 0).as("selected"))
  }

  val x7hDsirSelect: Q = (spark, dir) =>
    dsirSelect(Tables.documents(spark, dir)).orderBy(col("doc_id"))
  val x7hSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(
      |  CASE WHEN len(t) >= 2
      |   THEN list_transform(generate_series(1, len(t)-1),
      |          i -> md5(t[i] || ' ' || t[i+1]))
      |   ELSE [] END) AS bg
      | FROM tok),
      |pd AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
      |ct AS (SELECT bg, sum(c) AS ct FROM pd WHERE doc_id < 50 GROUP BY 1),
      |cs AS (SELECT bg, sum(c) AS cs FROM pd WHERE doc_id >= 50 GROUP BY 1),
      |f AS (SELECT coalesce(ct.bg, cs.bg) AS bg, coalesce(ct, 0) AS ct,
      |        coalesce(cs, 0) AS cs
      |      FROM ct FULL JOIN cs ON ct.bg = cs.bg),
      |sc AS (SELECT sum(ct) AS nt, sum(cs) AS ns, count(*) AS v FROM f),
      |dq AS (SELECT bg, CAST(round(1e6 * (ln(ct + 1) - ln(nt + v)
      |         - ln(cs + 1) + ln(ns + v))) AS BIGINT) AS dqf
      |       FROM f, sc)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
      | CAST(sum(c * dqf) AS BIGINT) AS logw_micro,
      | sum(c * dqf) > 0 AS selected
      |FROM pd JOIN dq USING (bg) WHERE doc_id >= 50
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ X4n BPE merge training
  /** Byte-pair-encoding merge training (the subword-tokenizer learning
    * step, Sennrich et al. 2016, arXiv:1508.07909) — learn the first
    * `nMerges` merge rules from the corpus. Trains on the WORD-COUNT
    * DICTIONARY, not the token stream: ONE corpus pass aggregates
    * (word, count) — map-side combined, output bounded by vocabulary
    * size, not corpus size — and is locally checkpointed; every
    * iteration after that runs over the dictionary only (millions of
    * rows at 100 TB, not the 100 TB). Per iteration: adjacent-symbol
    * pair counts weighted by word count (one vocabulary-sized map-side
    * combined aggregation), the argmax pair round-trips the driver as
    * ONE row (the x3k centroid-loop discipline — the loop is driver
    * control flow, rows never are), and the merge applies as a literal
    * string replace over the delimited symbol sequence: every symbol
    * is space-PREFIXED and semicolon-SUFFIXED (`[a, bb]` ⇒ `" a; bb;"`)
    * and the merge rewrites `' l; r;' → ' lr;'`. Both delimiters are in
    * the pattern, so a match anchors on whole symbols — `' a; b;'`
    * cannot fire on `[a, bb]`, whose text is `" a; bb;"` (a bare
    * space-prefix scheme DOES false-match there, eating the first `b`
    * of `bb`) — and the consumed trailing `;` belongs to the matched
    * symbol, so back-to-back occurrences still merge left-to-right
    * non-overlapping, exactly BPE's application rule. DuckDB's
    * `replace` scans identically, which is what makes the unrolled-CTE
    * oracle hash-exact; symbols are [a-z0-9]+ (never a delimiter) and
    * ASCII, so lexicographic tie-breaks are collation-safe.
    */
  def bpeMerges(spark: SparkSession, docs: DataFrame,
      nMerges: Int): DataFrame = {
    import spark.implicits._
    val dict0 = docs
      .select(explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), regexp_replace(col("word"), "(.)", " $1;").as("seq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var cur = dict0
    var exhausted = false
    for (k <- 1 to nMerges if !exhausted) {
      val top = cur
        .withColumn("t", expr(
          "transform(slice(split(seq, ' '), 2, size(split(seq, ' ')) - 1), " +
            "s -> replace(s, ';', ''))"))
        .select(col("cnt"), explode(expr(
          "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), " +
            "i -> struct(t[i-1] AS l, t[i] AS r)) " +
            "ELSE CAST(array() AS ARRAY<STRUCT<l: STRING, r: STRING>>) END"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k, l, r, l + r, pc))
        // symbols are [a-z0-9]+ — safe to inline in the SQL literal
        cur = cur.withColumn("seq", expr(s"replace(seq, ' $l; $r;', ' $l$r;')"))
      }
    }
    merges.toSeq.toDF("iteration", "left", "right", "merged", "pair_count")
  }

  val defaultBpeMerges = 12

  /** Staged merge table (one training run per session, shared by x4n and
    * the x4o encoder — the tokenizer-model analogue of the staged shingle
    * table).
    */
  def stagedBpeMerges(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"bpe_merges:$defaultBpeMerges:$dir")(
      bpeMerges(spark, Tables.documents(spark, dir), defaultBpeMerges))

  val x4nBpeMerges: Q = (spark, dir) => stagedBpeMerges(spark, dir)

  /** X4o — tokenizer APPLY: encode every document with the merges x4n
    * learned. The merge table rides the driver (nMerges rows — the
    * models-are-small discipline). Emitted per document: the post-merge
    * symbol count (the sequence-length statistic a token-budget planner
    * needs) and the md5 fingerprint of the full encoded sequence, which
    * pins every symbol boundary cross-engine.
    */
  /** The delimited symbol sequence after all merges — shared by the
    * x4o statistics and the x4q id encoder. Returns exactly
    * `(doc_id, seq)`.
    *
    * DICTIONARY-MEMOIZED encode (the standard tokenizer trick — HF fast
    * tokenizers memoize word→ids exactly this way): merges never cross
    * a word boundary (each per-word sequence is framed `' a; b;'` and
    * words join with `'|'`, which no merge pattern `' l; r;'` can span
    * — the boundary text is `';|'`, never `'; '`), so the nMerges
    * `replace` chain folds over the DISTINCT-WORD dictionary only
    * (|vocab| rows), and the corpus pass is pure per-row expression
    * work: the encoded dictionary aggregates to a single map row,
    * broadcasts (a 1-row BNLJ, the x4m sketch-literal shape), and each
    * document encodes by per-word map lookup — zero corpus shuffle,
    * zero driver collect. At a real 50k vocabulary the merge-chain
    * expression depth rides the dictionary-sized branch, not a
    * corpus-sized projection. If a corpus's word-form dictionary ever
    * outgrew the broadcast budget, the same `encDict` feeds a hash
    * join + per-doc ordered reassembly instead — the shape is a
    * one-line swap; the broadcast map is the right default because
    * tokenizer dictionaries are vocabulary-bounded, not
    * corpus-proportional. Empty documents encode to `seq = ''`.
    */
  /** The 1-row encoded-dictionary map for `docs` — split out so a
    * session can stage it once ([[stagedBpeDictMap]]): the distinct-word
    * aggregation is the only corpus-shuffle in the whole encode path,
    * and x4o/x4q/x9c would otherwise each re-run it.
    */
  private[operators] def bpeDictMap(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val dict = docs
      .select(explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
        .as("word"))
      .distinct()
      .withColumn("wseq", expr("regexp_replace(word, '(.)', ' $1;')"))
    val encDict = merges.foldLeft(dict) {
      case (df, (l, r)) =>
        df.withColumn("wseq", expr(s"replace(wseq, ' $l; $r;', ' $l$r;')"))
    }
    encDict.agg(map_from_entries(
      collect_list(struct(col("word"), col("wseq")))).as("__bpe_dict"))
  }

  /** Staged dictionary map over the FULL documents table: any subset
    * corpus (x9c's kept docs) encodes through the same map — lookups of
    * a subset's words are identical, and the superset dictionary is the
    * production shape anyway (the tokenizer's word cache is trained
    * once, not per-slice).
    */
  def stagedBpeDictMap(spark: SparkSession, dir: String): DataFrame = {
    val merges = stagedBpeMerges(spark, dir)
      .orderBy("iteration").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    Staged(spark, s"bpe_dict:$defaultBpeMerges:$dir")(
      bpeDictMap(Tables.documents(spark, dir), merges))
  }

  private[operators] def bpeSeq(docs: DataFrame,
      merges: Seq[(String, String)],
      dictMap: Option[DataFrame] = None,
      carry: Seq[String] = Seq.empty): DataFrame =
    docs.join(broadcast(dictMap.getOrElse(bpeDictMap(docs, merges))))
      .select(Seq(col("doc_id")) ++ carry.map(col) :+ expr(
        "array_join(transform(regexp_extract_all(text, '[a-z0-9]+', 0), " +
          "w -> element_at(__bpe_dict, w)), '|')").as("seq"): _*)

  /** `carry` names ride-along payload columns preserved through the
    * encode — a caller that needs them alongside the counts would
    * otherwise have to JOIN its input subtree back onto the output,
    * embedding the whole upstream pipeline twice in one plan (the x9b
    * task-binary lesson).
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      dictMap: Option[DataFrame] = None,
      carry: Seq[String] = Seq.empty): DataFrame =
    bpeSeq(docs, merges, dictMap, carry).select(
      Seq(col("doc_id")) ++ carry.map(col) ++ Seq(
        (size(split(col("seq"), " ")) - 1).cast("long").as("n_bpe_tokens"),
        md5(col("seq").cast("binary")).as("fp")): _*)

  /** X4p — the trained tokenizer's VOCABULARY as data: base symbols
    * (the corpus's distinct characters, id'd in sorted order) followed
    * by merged symbols in training order — the standard BPE id layout,
    * where a tokenizer file is exactly this table. Driver-side by
    * construction: the alphabet is ≤ 36 symbols and merges are the
    * bounded merge budget; nothing corpus-sized moves.
    */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base: Seq[String] = Tables.documents(spark, dir)
      .select(explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("word"))
      .select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .as("sym"))
      .distinct().as[String].collect().sorted.toSeq
    val merges = stagedBpeMerges(spark, dir)
      .orderBy("iteration").select("iteration", "merged").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    val b = base.size
    (base.zipWithIndex.map { case (s, i) => (i.toLong, s, "base") } ++
      merges.map { case (k, m) => ((b + k - 1).toLong, m, "merged") })
      .toDF("id", "sym", "kind")
  }

  /** Staged vocabulary (one alphabet scan + merge read per session,
    * shared by x4p and the x4q encoder).
    */
  def stagedBpeVocab(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"bpe_vocab:$defaultBpeMerges:$dir")(bpeVocab(spark, dir))

  val x4pBpeVocab: Q = (spark, dir) =>
    stagedBpeVocab(spark, dir).orderBy("id")

  /** X4q — encode the corpus to TOKEN IDS: the final artifact a
    * training pipeline feeds the data loader. The x4o symbol sequence
    * maps through the vocabulary as a plan-literal map (≤ alphabet +
    * merges entries — no join, no broadcast table, pure per-row
    * expression work). Word separators drop out; empty documents
    * encode to the empty array, not a missing row.
    *
    * `bpeIdsArray` is the true `array<bigint>` artifact (spec-covered);
    * the REGISTERED x4q emits the space-joined scalar form because the
    * driver's result hasher cannot sort top-level array columns
    * (SURVEY §5.2 registration rule: atomic output columns only).
    */
  def bpeIdsArray(spark: SparkSession, dir: String): DataFrame = {
    val vocabMap: Map[String, Long] = stagedBpeVocab(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val merges = stagedBpeMerges(spark, dir)
      .orderBy("iteration").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    bpeSeq(Tables.documents(spark, dir), merges,
        Some(stagedBpeDictMap(spark, dir)))
      .withColumn("__syms", expr(
        "transform(slice(split(replace(seq, '|', ''), ' '), 2, " +
          "size(split(replace(seq, '|', ''), ' ')) - 1), " +
          "s -> replace(s, ';', ''))"))
      .select(col("doc_id"),
        transform(col("__syms"),
          s => element_at(typedlit(vocabMap), s)).as("ids"))
  }

  val x4qBpeIds: Q = (spark, dir) =>
    bpeIdsArray(spark, dir)
      .select(col("doc_id"),
        array_join(transform(col("ids"), i => i.cast("string")), " ")
          .as("ids"))
      .orderBy(col("doc_id"))

  val x4oBpeEncode: Q = (spark, dir) => {
    val merges = stagedBpeMerges(spark, dir)
      .orderBy("iteration").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    bpeEncode(Tables.documents(spark, dir), merges,
      Some(stagedBpeDictMap(spark, dir))).orderBy(col("doc_id"))
  }

  /** Oracle twin: the full training loop unrolled as a CTE chain (the
    * x3k pattern). Each iteration's dictionary is referenced twice
    * (pair counting AND the next rewrite), so the carrier CTEs are
    * `MATERIALIZED` — without it DuckDB inlines the chain and
    * re-evaluates d0 2^N times.
    */
  private[operators] def bpeCteParts: Seq[String] = {
    val parts = Seq(
      """w AS (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word
        |      FROM documents)""".stripMargin,
      """d0 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS cnt,
        |        regexp_replace(word, '(.)', ' \1;', 'g') AS seq
        |       FROM w GROUP BY word)""".stripMargin) ++
      (1 to defaultBpeMerges).flatMap { k => Seq(
        s"""t$k AS MATERIALIZED (SELECT cnt, seq,
           |        list_transform(string_split(seq, ' ')[2:],
           |                       s -> replace(s, ';', '')) AS t
           |       FROM d${k - 1})""".stripMargin,
        s"""p$k AS (SELECT t[i] AS l, t[i+1] AS r, sum(cnt) AS pc
           |       FROM (SELECT cnt, t, unnest(generate_series(1, len(t)-1)) AS i
           |             FROM t$k)
           |       GROUP BY 1, 2)""".stripMargin,
        s"""m$k AS MATERIALIZED (SELECT $k AS iteration, l AS "left",
           |        r AS "right", l || r AS merged,
           |        CAST(pc AS BIGINT) AS pair_count
           |       FROM p$k ORDER BY pc DESC, l, r LIMIT 1)""".stripMargin,
        s"""d$k AS (SELECT cnt, replace(seq, ' ' || "left" || '; ' || "right" || ';',
           |         ' ' || merged || ';') AS seq
           |       FROM t$k, m$k)""".stripMargin)
      }
    parts
  }

  val x4nSql: String =
    "WITH " + bpeCteParts.mkString(",\n") + "\n" +
      (1 to defaultBpeMerges).map(k => s"SELECT * FROM m$k")
        .mkString(" UNION ALL ") +
      " ORDER BY iteration"

  /** x4o oracle: the training chain (shared CTEs) plus the encode chain
    * — documents re-sequenced, then each learned merge applied in
    * training order; symbol count and full-sequence md5 must match
    * byte-for-byte.
    */
  val x4oSql: String = {
    val enc = Seq(
      """e0 AS (SELECT doc_id, array_to_string(list_transform(
        |        regexp_extract_all(text, '[a-z0-9]+'),
        |        w -> regexp_replace(w, '(.)', ' \1;', 'g')), '|') AS seq
        |       FROM documents)""".stripMargin) ++
      (1 to defaultBpeMerges).map { k =>
        s"""e$k AS (SELECT doc_id, replace(seq, ' ' || "left" || '; ' || "right" || ';',
           |         ' ' || merged || ';') AS seq
           |       FROM e${k - 1}, m$k)""".stripMargin
      }
    "WITH " + (bpeCteParts ++ enc).mkString(",\n") + "\n" +
      s"""SELECT doc_id,
         | CAST(len(string_split(seq, ' ')) - 1 AS BIGINT) AS n_bpe_tokens,
         | md5(seq) AS fp
         |FROM e$defaultBpeMerges ORDER BY doc_id""".stripMargin
  }

  /** Shared vocabulary CTEs: base chars id'd in sorted order, merged
    * symbols at base-count + iteration − 1.
    */
  private def bpeVocabCtes: Seq[String] = Seq(
    """base AS (SELECT DISTINCT unnest(list_transform(
      |        generate_series(1, length(word)), i -> word[i])) AS sym
      |       FROM w)""".stripMargin,
    """baseid AS (SELECT sym,
      |        CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS id
      |       FROM base)""".stripMargin,
    "nb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM baseid)",
    s"""mergedid AS (SELECT merged AS sym, b + iteration - 1 AS id
       |       FROM (${(1 to defaultBpeMerges)
                .map(k => s"SELECT merged, iteration FROM m$k")
                .mkString(" UNION ALL ")}), nb)""".stripMargin,
    """vocab AS (SELECT sym, id, 'base' AS kind FROM baseid
      |       UNION ALL SELECT sym, id, 'merged' AS kind FROM mergedid)""".stripMargin)

  val x4pSql: String =
    "WITH " + (bpeCteParts ++ bpeVocabCtes).mkString(",\n") + "\n" +
      "SELECT id, sym, kind FROM vocab ORDER BY id"

  val x4qSql: String = {
    val enc = Seq(
      """e0 AS (SELECT doc_id, array_to_string(list_transform(
        |        regexp_extract_all(text, '[a-z0-9]+'),
        |        w -> regexp_replace(w, '(.)', ' \1;', 'g')), '|') AS seq
        |       FROM documents)""".stripMargin) ++
      (1 to defaultBpeMerges).map { k =>
        s"""e$k AS (SELECT doc_id, replace(seq, ' ' || "left" || '; ' || "right" || ';',
           |         ' ' || merged || ';') AS seq
           |       FROM e${k - 1}, m$k)""".stripMargin
      } ++ Seq(
      s"""toks AS (SELECT doc_id, list_transform(
         |        string_split(replace(seq, '|', ''), ' ')[2:],
         |        s -> replace(s, ';', '')) AS t
         |       FROM e$defaultBpeMerges)""".stripMargin,
      """pos AS (SELECT doc_id, t[i] AS sym, i
        |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        |             FROM toks))""".stripMargin,
      """encd AS (SELECT doc_id, list(id ORDER BY i) AS ids
        |       FROM pos JOIN vocab USING (sym) GROUP BY doc_id)""".stripMargin)
    "WITH " + (bpeCteParts ++ bpeVocabCtes ++ enc).mkString(",\n") + "\n" +
      """SELECT d.doc_id,
        | array_to_string(coalesce(ids, CAST([] AS BIGINT[])), ' ') AS ids
        |FROM documents d LEFT JOIN encd ON d.doc_id = encd.doc_id
        |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "x4n_bpe_merges" -> x4nBpeMerges,
    "x4o_bpe_encode" -> x4oBpeEncode,
    "x4p_bpe_vocab" -> x4pBpeVocab,
    "x4q_bpe_ids" -> x4qBpeIds,
    "x7d_bigram_familiarity" -> x7dBigramFamiliarity,
    "x7e_decontamination" -> x7eDecontamination,
    "x7k_contam_fraction" -> x7kContamFraction,
    "x7i_bloom_decontaminate" -> x7iBloomDecontaminate,
    "x7h_dsir_select" -> x7hDsirSelect,
    "x4e_term_freq" -> x4eTermFreq,
    "x4f_tfidf" -> x4fTfIdf,
    "x4r_bm25" -> x4rBm25,
    "x4s_quality_probe" -> x4sQualityProbe,
    "x4t_bm25_index" -> x4tBm25Index,
    "x4u_hybrid_rrf" -> x4uHybridRrf,
    "x4v_hybrid_ann" -> x4vHybridAnn,
    "x4y_diverse_ann" -> x4yDiverseAnn,
    "x4w_phrase" -> x4wPhrase,
    "x4x_phrase_index" -> x4xPhraseIndex,
    "x1_dedup_exact" -> x1DedupExact,
    "x1e_fuzzy_linkage" -> x1eFuzzyLinkage,
    "x1f_linkage_apply" -> x1fLinkageApply,
    "x1b_line_dedup" -> x1bLineDedup,
    "x1c_span_dedup" -> x1cSpanDedup,
    "x1d_span_apply" -> x1dSpanApply,
    "x4j_chunks" -> x4jChunks,
    "x2_minhash_lsh" -> x2MinhashLsh,
    "x2b_simhash" -> x2bSimhash,
    "x2c_ngram_jaccard" -> x2cNgramJaccard,
    "x2e_containment" -> x2eContainment,
    "x2f_containment_blindspot" -> x2fContainmentBlindspot,
    "x2d_simhash_neardup" -> x2dSimhashNearDup,
    "x4_text_quality" -> x4TextQuality,
    "x4b_langid" -> x4bLangId,
    "x4c_token_count" -> x4cTokenCount,
    "x4d_fingerprint" -> x4dFingerprint,
    "x4g_domains" -> x4gDomains,
    "x4h_novelty_growth" -> x4hNoveltyGrowth,
    "x4i_vocab_ids" -> x4iVocabIds,
    "x4k_encode_ids" -> x4kEncodeIds,
    "x4l_heavy_hitters" -> x4lHeavyHitters,
    "x4m_cms_bound" -> x4mCmsBound)

  val oracle: Map[String, String] = Map(
    "x4n_bpe_merges" -> x4nSql,
    "x4o_bpe_encode" -> x4oSql,
    "x4p_bpe_vocab" -> x4pSql,
    "x4q_bpe_ids" -> x4qSql,
    "x4g_domains" -> x4gSql,
    "x4h_novelty_growth" -> x4hSql,
    "x7d_bigram_familiarity" -> x7dSql,
    "x7e_decontamination" -> x7eSql,
    "x7k_contam_fraction" -> x7kSql,
    "x7i_bloom_decontaminate" -> x7iSql,
    "x7h_dsir_select" -> x7hSql,
    "x4e_term_freq" -> x4eSql,
    "x4f_tfidf" -> x4fSql,
    "x4r_bm25" -> x4rSql,
    "x4s_quality_probe" -> x4sSql,
    "x4t_bm25_index" -> x4tSql,
    "x4u_hybrid_rrf" -> x4uSql,
    "x4v_hybrid_ann" -> x4vSql,
    "x4y_diverse_ann" -> x4ySql,
    "x4w_phrase" -> x4wSql,
    "x4x_phrase_index" -> x4xSql,
    "x1_dedup_exact" -> x1Sql,
    "x1e_fuzzy_linkage" -> x1eSql,
    "x1f_linkage_apply" -> x1fSql,
    "x1b_line_dedup" -> x1bSql,
    "x1c_span_dedup" -> x1cSql,
    "x1d_span_apply" -> x1dSql,
    "x4j_chunks" -> x4jSql,
    "x2_minhash_lsh" -> x2Sql,
    "x2b_simhash" -> x2bSql,
    "x2c_ngram_jaccard" -> x2cSql,
    "x2e_containment" -> x2eSql,
    "x2f_containment_blindspot" -> x2fSql,
    "x2d_simhash_neardup" -> x2dSql,
    "x4_text_quality" -> x4Sql,
    "x4b_langid" -> x4bSql,
    "x4c_token_count" -> x4cSql,
    "x4d_fingerprint" -> x4dSql,
    "x4i_vocab_ids" -> x4iSql,
    "x4k_encode_ids" -> x4kSql,
    "x4l_heavy_hitters" -> x4lSql,
    "x4m_cms_bound" -> x4mSql)
}
