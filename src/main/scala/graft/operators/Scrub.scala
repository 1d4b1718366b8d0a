package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** X8 — content scrubbing + repetition metrics, the two standard
  * training-data curation passes not covered by X1–X7: PII redaction
  * (mask emails/phones before a corpus ships) and Gopher-style repetition
  * filters (Rae et al. 2021 §A1.1: documents dominated by one repeated
  * n-gram or by duplicated tokens are boilerplate; gate on the fractions).
  *
  * Scale: both are pure per-document map work (regex / per-doc groupBy) —
  * embarrassingly parallel, no cross-document shuffle except the bounded
  * per-(doc, gram) partial aggregation, which map-side combines. Regexes
  * stay in the engine-portable common subset (character classes +
  * quantifiers — identical semantics in Java regex and RE2/DuckDB), so the
  * oracle mirrors them verbatim.
  */
object Scrub {
  type Q = (SparkSession, String) => DataFrame

  val emailRe = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
  val phoneRe = "555-[0-9]{4}"

  /** Redact emails/phones; emits match counts and the scrubbed text. */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(emailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(phoneRe)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col(textCol), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))

  /** Registered query: the fixture text carries no PII, so deterministic
    * contact strings are appended in-query for a known subset of docs
    * (identical derivation in the oracle CTE — same bytes both engines);
    * output carries md5(scrubbed) rather than the full text.
    */
  val x8PiiScrub: Q = (spark, dir) => {
    val aug = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), (col("doc_id") % 50).cast("string"),
            lit("@example.org now"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" call 555-01"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0")))
          .otherwise(lit(""))).as("text"))
    piiScrub(aug)
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("scrubbed").cast("binary")).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }
  val x8Sql: String =
    s"""WITH aug AS (
       | SELECT doc_id, text ||
       |  CASE WHEN doc_id % 3 = 0
       |   THEN ' contact user' || CAST(doc_id % 50 AS VARCHAR) || '@example.org now'
       |   ELSE '' END ||
       |  CASE WHEN doc_id % 4 = 0
       |   THEN ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
       |   ELSE '' END AS text
       | FROM documents)
       |SELECT doc_id,
       | CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
       | CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones,
       | md5(regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
       |     '$phoneRe', '<PHONE>', 'g')) AS scrub_md5
       |FROM aug ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition metrics per document: the share of bigram
    * occurrences taken by the single most frequent bigram (`top2_frac`)
    * and the share of tokens that are repeats of an earlier token
    * (`tok_dup_frac`). Integer-exact numerators/denominators plus one
    * mirrored rounded ratio each; a curation gate then filters on them
    * (e.g. Gopher drops top-2-gram fraction > 0.20).
    */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val bg = Text.bigrams(docs)
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top2_n"))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        (sum(col("c")) - count(lit(1))).as("dup_tokens"))
    tok.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        round(col("dup_tokens") * lit(1.0) / col("n_tokens"), 4).as("tok_dup_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top2_n"), lit(0L)).as("top2_n"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(round(col("top2_n") * lit(1.0) / col("n_bigrams"), 4))
          .as("top2_frac"))
  }

  /** Staged per-doc metrics (one row per document — tiny): x8b and the
    * x8c gate both consume the single producer pass (see [[graft.Staged]]).
    */
  def stagedRepetition(spark: SparkSession, dir: String): DataFrame =
    graft.Staged(spark, s"repetition:$dir")(
      repetitionMetrics(Tables.documents(spark, dir)))

  val x8bRepetition: Q = (spark, dir) =>
    stagedRepetition(spark, dir).orderBy(col("doc_id"))
  val x8bSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(
      |  CASE WHEN len(t) >= 2
      |   THEN list_transform(generate_series(1, len(t)-1),
      |          i -> md5(t[i] || ' ' || t[i+1]))
      |   ELSE [] END) AS bg
      | FROM tok),
      |bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
      |bga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |        CAST(max(c) AS BIGINT) AS top2_n FROM bgc GROUP BY 1),
      |tkc AS (SELECT doc_id, unnest(t) AS tk FROM tok),
      |tkg AS (SELECT doc_id, tk, count(*) AS c FROM tkc GROUP BY 1, 2),
      |tka AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |        CAST(sum(c) - count(*) AS BIGINT) AS dup_tokens FROM tkg GROUP BY 1)
      |SELECT tka.doc_id, n_tokens, dup_tokens,
      | round(dup_tokens * 1.0 / n_tokens, 4) AS tok_dup_frac,
      | coalesce(n_bigrams, 0) AS n_bigrams, coalesce(top2_n, 0) AS top2_n,
      | CASE WHEN n_bigrams IS NULL THEN 0.0
      |      ELSE round(top2_n * 1.0 / n_bigrams, 4) END AS top2_frac
      |FROM tka LEFT JOIN bga ON tka.doc_id = bga.doc_id
      |ORDER BY tka.doc_id""".stripMargin

  /** Curation gate over the repetition metrics — the operator a pipeline
    * actually runs (Gopher's repetition thresholds as a filter).
    */
  val x8cRepetitionGate: Q = (spark, dir) =>
    stagedRepetition(spark, dir)
      .filter(col("top2_frac") <= 0.2 && col("tok_dup_frac") <= 0.6)
      .select(col("doc_id"), col("top2_frac"), col("tok_dup_frac"))
      .orderBy(col("doc_id"))
  val x8cSql: String = {
    val inner = x8bSql.replace("ORDER BY tka.doc_id", "")
    s"""SELECT doc_id, top2_frac, tok_dup_frac FROM ($inner)
       |WHERE top2_frac <= 0.2 AND tok_dup_frac <= 0.6
       |ORDER BY doc_id""".stripMargin
  }

  /** X8d — k-ANONYMITY audit over the corpus's publishable metadata: a
    * released training set carries per-document metadata (language,
    * source, size), and a quasi-identifier combination isolating fewer
    * than k documents is a re-identification risk the release process
    * must suppress or generalize (Sweeney's k-anonymity — the standard
    * privacy gate alongside x8's PII scrub, because scrubbing TEXT does
    * not help when the METADATA fingerprint is unique). One row per
    * quasi-identifier group (lang, source, 50-char length bucket) with
    * its population and the at-risk verdict at k=5.
    *
    * Scale: one map-side-combined groupBy; output is bounded by the
    * metadata domain, not the corpus.
    */
  val anonK = 5
  val x8dKAnonymity: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        expr("n_chars DIV 50").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < anonK)
      .orderBy(col("lang"), col("source"), col("len_bucket"))
  val x8dSql: String =
    s"""SELECT lang, source, n_chars // 50 AS len_bucket,
       | CAST(count(*) AS BIGINT) AS n, count(*) < $anonK AS at_risk
       |FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** X8e — l-DIVERSITY audit, k-anonymity's companion gate
    * (Machanavajjhala et al., ICDE'06): a quasi-identifier class can
    * satisfy k-anonymity (population ≥ k) yet still leak — if every row
    * in the class shares ONE sensitive value, membership alone reveals
    * it. Here the event log's publishable shape is the QI (event_type,
    * event day) and the sensitive attribute is the user behind the
    * event: a class whose events all come from fewer than l distinct
    * users lets an observer who can place a user in that (type, day)
    * cell attribute the activity to them. One row per QI class with
    * population, distinct-sensitive count, and the verdict at l=3.
    *
    * Scale: one groupBy with an exact count_distinct — Spark plans it
    * as the two-phase partial-distinct aggregate (map-side combined);
    * output is bounded by the QI domain (types × days), never the event
    * volume. At 100 TB the same audit swaps count_distinct for the HLL
    * tier (q9c/T29) when ±2% on n_users is acceptable.
    */
  val diversityL = 3
  val x8eLDiversity: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("at_risk", col("n_users") < diversityL)
      .orderBy(col("event_type"), col("day"))
  val x8eSql: String =
    s"""SELECT event_type, epoch_ms(ts) // 86400000 AS day,
       | CAST(count(*) AS BIGINT) AS n,
       | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       | count(DISTINCT user_id) < $diversityL AS at_risk
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** X8f — t-CLOSENESS audit, the third rung of the release-privacy
    * ladder (Li, Li & Venkatasubramanian, ICDE'07): a class can be
    * k-anonymous (x8d) and l-diverse (x8e) yet still leak when its
    * sensitive-value DISTRIBUTION diverges from the global one — an
    * observer who places a document in the class updates their belief
    * about the sensitive attribute by exactly that divergence. QI here
    * is (lang, 50-char length bucket) — coarser than x8d's, because the
    * SENSITIVE attribute is the third x8d column, `source` (which
    * publisher a document came from). Distance is total variation,
    * computed in EXACT INTEGER arithmetic with denominators cleared:
    * with dist_num = Σ_s |n_cs·N_g − n_gs·N_c| (= 2·N_c·N_g·TV),
    * `TV > t` at t = ¼ becomes `4·dist_num > 2·N_c·N_g`, i.e.
    * `2·dist_num > N_c·N_g` — no float ever computed, so the verdict is
    * partition-invariant and engine-portable.
    *
    * The absent-source tail needs no class×source cross join:
    * Σ_{s∉class} n_gs·N_c = (N_g − Σ_{s∈class} n_gs)·N_c, so the whole
    * audit is one (class, source) groupBy, one #sources-row broadcast
    * join, one class groupBy — output bounded by the QI domain.
    * Headroom: p = Σ_s|n_cs·N_g − n_gs·N_c| ≤ 2·N_c·N_g and the at_risk
    * LHS 2·dist_num ≤ 4·N_c·N_g, so the guard bounds the PRODUCT —
    * 4·N_c·N_g ≤ Long.MaxValue per class (checked division-side so the
    * guard itself cannot wrap; the q36 discipline — THROWS, never
    * wraps). A lone N_g bound is NOT enough: one dominant class with
    * N_c ≈ N_g ≈ 3·10⁹ wraps at ~3.6·10¹⁹. Past the guard, quantize the
    * global frequencies to micro-units before the cross-multiplication.
    */
  def tClosenessAudit(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("lang"), expr("n_chars DIV 50").as("len_bucket"),
        col("source"))
    val g = d.groupBy(col("source")).agg(count(lit(1)).as("n_gs"))
    val tot = g.agg(sum(col("n_gs")).as("n_g"))
    val cs = d.groupBy(col("lang"), col("len_bucket"), col("source"))
      .agg(count(lit(1)).as("n_cs"))
    val cls = cs.groupBy(col("lang"), col("len_bucket"))
      .agg(sum(col("n_cs")).as("n_c"))
    cs.join(broadcast(g), Seq("source"))
      .join(broadcast(cls), Seq("lang", "len_bucket"))
      .crossJoin(broadcast(tot))
      .groupBy(col("lang"), col("len_bucket"), col("n_c"), col("n_g"))
      .agg(sum(abs(col("n_cs") * col("n_g") - col("n_gs") * col("n_c")))
          .as("p"),
        sum(col("n_gs")).as("covered"))
      // 4·n_c·n_g ≤ Long.MaxValue, checked as n_c ≤ (MaxValue/4) div n_g
      // so the guard never computes the product it is bounding. If n_g
      // were 0/NULL the division yields NULL — assertFilter's null-arm
      // makes that THROW instead of silently passing.
      .filter(graft.functions.Guards.assertFilter(
        col("n_c") <= expr(s"${Long.MaxValue / 4L} div n_g"),
        "x8f overflow guard: class×corpus product exceeds the " +
          "exact-BIGINT headroom (4*n_c*n_g > Long.MaxValue) — quantize " +
          "global frequencies to micro-units"))
      .select(col("lang"), col("len_bucket"), col("n_c").as("n"),
        (col("p") + (col("n_g") - col("covered")) * col("n_c"))
          .as("dist_num"),
        (lit(2L) * (col("p") + (col("n_g") - col("covered")) * col("n_c"))
          > col("n_c") * col("n_g")).as("at_risk"))
      .orderBy(col("lang"), col("len_bucket"))
  }
  val x8fTCloseness: Q = (spark, dir) =>
    tClosenessAudit(Tables.documents(spark, dir))
  val x8fSql: String =
    """WITH d AS (SELECT lang, n_chars // 50 AS len_bucket, source
      |           FROM documents),
      |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_gs FROM d GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_gs) AS BIGINT) AS n_g FROM g),
      |cs AS (SELECT lang, len_bucket, source,
      |        CAST(count(*) AS BIGINT) AS n_cs FROM d GROUP BY 1, 2, 3),
      |cls AS (SELECT lang, len_bucket, CAST(sum(n_cs) AS BIGINT) AS n_c
      |        FROM cs GROUP BY 1, 2),
      |parts AS (SELECT cs.lang, cs.len_bucket, cls.n_c, tot.n_g,
      |   CAST(sum(abs(cs.n_cs * tot.n_g - g.n_gs * cls.n_c)) AS BIGINT) AS p,
      |   CAST(sum(g.n_gs) AS BIGINT) AS covered
      |  FROM cs JOIN g USING (source)
      |  JOIN cls USING (lang, len_bucket) CROSS JOIN tot
      |  GROUP BY 1, 2, 3, 4)
      |SELECT lang, len_bucket, n_c AS n,
      | p + (n_g - covered) * n_c AS dist_num,
      | 2 * (p + (n_g - covered) * n_c) > n_c * n_g AS at_risk
      |FROM parts ORDER BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "x8_pii_scrub" -> x8PiiScrub,
    "x8b_repetition" -> x8bRepetition,
    "x8c_repetition_gate" -> x8cRepetitionGate,
    "x8d_k_anonymity" -> x8dKAnonymity,
    "x8e_l_diversity" -> x8eLDiversity,
    "x8f_t_closeness" -> x8fTCloseness)

  val oracle: Map[String, String] = Map(
    "x8_pii_scrub" -> x8Sql,
    "x8b_repetition" -> x8bSql,
    "x8c_repetition_gate" -> x8cSql,
    "x8d_k_anonymity" -> x8dSql,
    "x8e_l_diversity" -> x8eSql,
    "x8f_t_closeness" -> x8fSql)
}
