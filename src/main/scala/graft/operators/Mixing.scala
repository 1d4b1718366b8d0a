package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-mixing operators for training-corpus assembly: per-label embedding
  * centroids (domain prototypes for clustering-based mixture design) and
  * temperature-scaled language sampling weights (the multilingual mixing
  * rule p_i^α / Σ p_j^α).
  *
  * Determinism discipline: a distributed mean of floats is order-dependent
  * (FP addition is not associative), so a straight avg() would differ
  * between runs, partitionings, and engines. Both operators therefore
  * quantize to fixed-point BIGINTs first — floor(x·10⁶) is a deterministic
  * function of the (exact) double input — and sum integers, which is exact
  * and order-independent; the single final division back to double is one
  * mirrored IEEE op. This is also the reproducible-pipeline shape at 100 TB:
  * integer partial aggregates are associative/commutative, so map-side
  * combine and AQE re-planning cannot change the answer.
  */
object Mixing {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed-point scale: 6 decimal digits — floats have ~7 significant
    * digits, so quantization error is at the input's own noise floor while
    * sums up to ~10¹² rows stay far inside BIGINT range.
    */
  val fpScale = 1000000L

  /** X7b — per-label centroid of the embedding corpus, one row per
    * (label, dimension): posexplode → quantize → integer sum. One shuffle,
    * map-side combined, ~nlabels·dim result rows.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).cast("long").as("pos"), // 1-based, as the oracle's
        floor(col("v").cast("double") * fpScale).cast("long").as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))
      // no round(): both divisions have exact-integer inputs, so each is a
      // single correctly-rounded IEEE op — bit-identical across engines,
      // whereas round() at a decimal tie (qsum/n hitting x.5 at the 7th
      // digit) is implementation-defined and measurably disagrees
      .select(col("label"), col("pos"), col("n"), col("qsum"),
        (col("qsum") / col("n") / fpScale).as("centroid"))
  }

  val x7bLabelCentroids: Q = (spark, dir) =>
    labelCentroids(Tables.embeddings(spark, dir))
      .orderBy(col("label"), col("pos"))

  val x7bSql: String =
    s"""WITH pos AS (SELECT unnest(generate_series(1, ${Vectors.dim})) AS pos),
       |e AS (SELECT label, pos,
       |  CAST(floor(CAST(embedding[pos] AS DOUBLE) * $fpScale) AS BIGINT) AS q
       | FROM embeddings CROSS JOIN pos),
       |g AS (SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(q) AS BIGINT) AS qsum FROM e GROUP BY 1, 2)
       |SELECT label, pos, n, qsum, qsum / n / $fpScale AS centroid
       |FROM g ORDER BY label, pos""".stripMargin

  /** X7c — temperature-scaled sampling weights per language: weight_i =
    * n_i^α / Σ_j n_j^α, the standard multilingual up-sampling rule (α < 1
    * flattens the distribution toward rare languages). The oracle-checked
    * instance fixes α = 1/2 because sqrt is the one power IEEE 754 requires
    * correctly rounded — bit-identical in every engine; other α values run
    * through the same plan with pow() and an epsilon contract instead.
    *
    * Scale: groupBy(lang) is a map-side-combined shuffle down to ~#languages
    * rows; the normalizing total is a broadcast 1-row aggregate over those,
    * so nothing ever concentrates on one task.
    */
  def temperatureWeights(docs: DataFrame, budget: Long): DataFrame = {
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_q", floor(sqrt(col("n_docs")) * fpScale).cast("long"))
    val total = counts.agg(sum(col("w_q")).as("w_total"))
    counts.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"),
        (col("w_q") / col("w_total")).as("weight"), // exact-integer IEEE div — no round

        floor(col("w_q") * budget / col("w_total")).cast("long").as("n_sample"))
  }

  val x7cTemperatureMix: Q = (spark, dir) =>
    temperatureWeights(Tables.documents(spark, dir), budget = 10000L)
      .orderBy(col("lang"))

  val x7cSql: String =
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(floor(sqrt(count(*)) * $fpScale) AS BIGINT) AS w_q
       | FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(w_q) AS BIGINT) AS w_total FROM c)
       |SELECT lang, n_docs, w_q / w_total AS weight,
       | CAST(floor(w_q * 10000 / w_total) AS BIGINT) AS n_sample
       |FROM c CROSS JOIN t ORDER BY lang""".stripMargin

  /** X7g — MATERIALIZE the temperature mixture: take exactly `n_sample`
    * documents per language (the [[temperatureWeights]] allocation),
    * selected by md5 order — the step that turns mixing weights into an
    * actual training corpus, deterministic across engines and runs.
    *
    * Scale: the weight table is ~#languages rows (broadcast); ranking uses
    * the same two-phase top-k as Curation.stratifiedSample — phase 1 ranks
    * within (lang, hash-bucket) so no task ever sorts a whole language,
    * phase 2 ranks the ≤ subBuckets·n_sample survivors. n_sample is
    * constant within a language, so per-lang top-n = top-n of the union of
    * per-bucket top-ns and the output is IDENTICAL to the single-window
    * formulation (which is the oracle).
    */
  def mixApply(docs: DataFrame, budget: Long, subBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = temperatureWeights(docs, budget)
      .select(col("lang"), col("n_sample"))
    val keyed = docs.select(col("lang"), col("doc_id"))
      .withColumn("skey", md5(concat(lit("mix:"), col("doc_id").cast("string"))))
      .withColumn("bkt", pmod(xxhash64(col("doc_id")), lit(subBuckets)))
      .join(broadcast(alloc), "lang")
    val w1 = Window.partitionBy(col("lang"), col("bkt"))
      .orderBy(col("skey"), col("doc_id"))
    val w2 = Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))
    keyed
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= col("n_sample"))
      .withColumn("rn", row_number().over(w2).cast("long"))
      .filter(col("rn") <= col("n_sample"))
      .select(col("lang"), col("rn"), col("doc_id"), col("n_sample"))
  }

  val x7gMixApply: Q = (spark, dir) =>
    mixApply(Tables.documents(spark, dir), budget = 200L)
      .orderBy(col("lang"), col("rn"))

  val x7gSql: String =
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(floor(sqrt(count(*)) * $fpScale) AS BIGINT) AS w_q
       | FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(w_q) AS BIGINT) AS w_total FROM c),
       |w AS (SELECT lang, CAST(floor(w_q * 200 / w_total) AS BIGINT) AS n_sample
       |      FROM c CROSS JOIN t),
       |r AS (SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
       |        ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
       |      FROM documents)
       |SELECT r.lang, rn, doc_id, n_sample
       |FROM r JOIN w ON r.lang = w.lang
       |WHERE rn <= n_sample ORDER BY r.lang, rn""".stripMargin

  val queries: Map[String, Q] = Map(
    "x7b_label_centroids" -> x7bLabelCentroids,
    "x7c_temperature_mix" -> x7cTemperatureMix,
    "x7g_mix_apply" -> x7gMixApply)

  val oracle: Map[String, String] = Map(
    "x7b_label_centroids" -> x7bSql,
    "x7c_temperature_mix" -> x7cSql,
    "x7g_mix_apply" -> x7gSql)
}
