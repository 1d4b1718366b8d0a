package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Staged, Tables}

/** Graph operators for the dedup pipeline: near-dup PAIRS (x2/x2c) only say
  * "these two documents overlap"; an actual dedup pass needs CLUSTERS — one
  * representative kept per connected component of the overlap graph, every
  * other member dropped. (Pair-wise anti-join, as in x6, over-drops: in a
  * chain a–b–c it removes both b and c even though c may not resemble a.)
  *
  * Algorithm: min-label propagation. Every node starts labeled with its own
  * id; each round it takes the min of its label and its neighbors' labels;
  * at fixpoint label(v) = min id of v's component. Deterministic regardless
  * of execution order (min is commutative/associative), so the result is
  * oracle-exact against DuckDB's recursive-CTE transitive closure.
  *
  * Scale (100 TB): each round is one shuffle join keyed by node id plus a
  * map-side-combined min-aggregation — no driver-side graph state, only a
  * per-round converged? count. Rounds = graph diameter; near-dup components
  * are clique-ish (every member shares most shingles), so diameter is 1–3
  * in practice. For adversarial long-chain graphs the alternating
  * large-star/small-star variant (Kiveris et al., "Connected Components in
  * MapReduce", SoCC'14) bounds rounds at O(log² n) with the same per-round
  * plan shape; propagation is preferred here for its strictly smaller
  * constant factor on short-diameter graphs. Lineage is cut per round with
  * localCheckpoint so the plan does not grow with the iteration count.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Connected components of an undirected edge list.
    *
    * Each round does (a) neighbor-min propagation and (b) a pointer-jump
    * (label compression: every node's label is replaced by its label's
    * label) — the jump halves the distance a min label still has to travel,
    * so rounds are O(log diameter), not O(diameter): a path of 10⁶ nodes
    * converges in ~20 rounds instead of 10⁶. If the round budget is still
    * exhausted without a fixpoint the function THROWS rather than return
    * partially-propagated (wrong) labels that downstream dedup would
    * silently trust.
    *
    * @param edges two-column DataFrame (src, dst), any orientation; self
    *              loops and duplicates are fine (symmetrized + deduped).
    * @return (node, cluster) — cluster = min node id in the component; only
    *         nodes appearing in `edges` are emitted.
    * @throws IllegalStateException if not converged within `maxRounds`.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val src = edges.columns(0)
    val dst = edges.columns(1)
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("cluster", col("node"))
      .localCheckpoint()
    var round = 0
    var converged = sym.isEmpty
    while (!converged && round < maxRounds) {
      val nbrMin = sym.join(labels, sym("v") === labels("node"))
        .groupBy(col("u")).agg(min(col("cluster")).as("nbr"))
      val prop = labels.join(nbrMin, labels("node") === nbrMin("u"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("cluster"),
          (col("nbr") < col("cluster")).as("chg"))
        .localCheckpoint()
      // pointer-jump: label ids are node ids, so self-join the label table
      // to fetch each node's label's label and take the min
      val ptr = prop.select(col("node").as("pn"), col("cluster").as("pc"))
      val next = prop.join(ptr, prop("cluster") === ptr("pn"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("pc"), col("cluster"))).as("cluster"),
          (col("chg") || col("pc") < col("cluster")).as("chg"))
        .localCheckpoint()
      converged = next.filter(col("chg")).isEmpty
      labels = next.drop("chg")
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxRounds rounds; " +
        "labels would be partially propagated (wrong). Raise maxRounds — " +
        "rounds needed ≈ log2(component diameter) with pointer-jumping.")
    labels
  }

  /** X7 — near-dup cluster formation over the verified Jaccard pair graph
    * (same staged pair table as x2c/x6): each document in any near-dup pair
    * gets its component's min doc_id as cluster id, plus the component
    * size. Downstream dedup keeps `doc_id == cluster` rows.
    */
  /** Staged (node, cluster) table over the verified pair graph — the
    * iterative propagation runs once per session; x7 and x7f consume the
    * checkpointed result.
    */
  def stagedClusters(spark: SparkSession, dir: String): DataFrame =
    Staged(spark, s"neardup_cc:$dir")(
      connectedComponents(
        Text.stagedJaccardPairs(spark, dir).select(col("da"), col("db"))))

  val x7NeardupClusters: Q = (spark, dir) => {
    // component size via groupBy + broadcast join back, not a per-cluster
    // count window: a giant boilerplate component would land every member
    // in one window task, and the cluster-size table is bounded by near-dup
    // membership (≪ corpus), so it broadcasts
    val cc = stagedClusters(spark, dir)
    val sizes = cc.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    cc.join(broadcast(sizes), "cluster")
      .select(col("node").as("doc_id"), col("cluster"), col("n_members"))
      .orderBy(col("doc_id"))
  }

  /** Oracle scaffolding: DuckDB recursive CTE computing the transitive
    * closure of the same pair graph (x2c's CTE chain builds the pairs),
    * then min(reach) per node = the component's min id. Closure is
    * quadratic per component — fine for an oracle at fixture scale, never
    * the engine plan.
    */
  private[graft] val ccCtes: String = {
    val pairCtes = Text.x2cCtePrefix("WITH RECURSIVE")
    pairCtes + s""",
      |pairs AS (
      | SELECT da, db
      | FROM shared JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
      | WHERE shared * 10 >= (ca.n + cb.n - shared) * 7),
      |edges AS (SELECT da AS u, db AS v FROM pairs
      |          UNION SELECT db AS u, da AS v FROM pairs),
      |walk AS (SELECT u AS node, u AS reach FROM edges
      |         UNION
      |         SELECT w.node, e.v AS reach FROM walk w JOIN edges e ON e.u = w.reach),
      |cc AS (SELECT node, min(reach) AS cluster FROM walk GROUP BY 1)""".stripMargin
  }

  val x7Sql: String = ccCtes + """
      |SELECT node AS doc_id, cluster,
      | CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members
      |FROM cc ORDER BY doc_id""".stripMargin

  /** X7f — cluster-representative dedup of the corpus: keep every document
    * that is either in no near-dup cluster or is its cluster's min-id
    * representative. This is the semantically-correct dedup apply — the
    * pair-wise anti-join (x6) also drops the chain-end c of a–b–c even
    * when c never resembled a; keeping one representative per COMPONENT
    * drops exactly (members − 1) per cluster.
    *
    * Scale: the cluster map is bounded by near-dup membership (≪ corpus),
    * so it broadcasts; the corpus side is scanned + hash-probed only.
    */
  val x7fDedupApply: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val cc = stagedClusters(spark, dir)
    docs.join(broadcast(cc), docs("doc_id") === cc("node"), "left")
      .filter(col("node").isNull || col("doc_id") === col("cluster"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .orderBy(col("doc_id"))
  }

  val x7fSql: String = ccCtes + """
      |SELECT doc_id, lang, n_chars, coalesce(cluster, doc_id) AS cluster
      |FROM documents LEFT JOIN cc ON doc_id = node
      |WHERE node IS NULL OR doc_id = cluster
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "x7_neardup_clusters" -> x7NeardupClusters,
    "x7f_dedup_apply" -> x7fDedupApply)

  val oracle: Map[String, String] = Map(
    "x7_neardup_clusters" -> x7Sql,
    "x7f_dedup_apply" -> x7fSql)
}
