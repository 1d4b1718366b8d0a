package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Graph, Mixing, Text}

/** Connected components vs a brute-force union-find reference, plus
  * determinism checks for the fixed-point mixing aggregates. */
class GraphMixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: path-compressed union-find over the same edges. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root's label is not necessarily the min id mid-stream; normalize by
    // grouping members per root and taking the min
    val members = parent.keys.toSeq.groupBy(find)
    members.flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }.toMap
  }

  test("downstream oracles share x2c's CTE chain by concatenation, not surgery") {
    // x7/x7f/x9/x6 extend the exact pair-generation CTEs that x2c itself is
    // checked against; if any of these prefixes drifts, an edit to the x2c
    // pipeline would no longer propagate to the dependent oracles.
    assert(Text.x2cSql.startsWith(Text.x2cCtePrefix()))
    assert(Graph.ccCtes.startsWith(Text.x2cCtePrefix("WITH RECURSIVE")))
    assert(Curation.x6Sql.startsWith(Text.x2cCtePrefix()))
    assert(Graph.x7Sql.startsWith(Graph.ccCtes))
    assert(Graph.x7fSql.startsWith(Graph.ccCtes))
    assert(Graph.x7mSql.startsWith(Text.x2cCtePrefix("WITH RECURSIVE")))
    assert(Graph.x7mSql.startsWith(Graph.x7mCtes))
    assert(Graph.x7nSql.startsWith(Graph.x7mCtes))
    assert(Curation.x9Sql.startsWith(Graph.ccCtes))
  }

  test("x7m containment-aware apply: verbatim embeds dropped, restricted " +
      "jaccard graph still elects surviving representatives") {
    val article = (1 to 10).map(i => s"w$i").mkString(" ")
    val host = ((1 to 10).map(i => s"w$i") ++ (11 to 60).map(i => s"z$i"))
      .mkString(" ")
    val unrelated = (100 to 130).map(i => s"q$i").mkString(" ")
    // 4 ⊂ 5 verbatim AND Jaccard-similar: 16 shared of 16/20 shingles —
    // J = 16/20 = 0.8 fires, containment(4 in 5) = 1 fires. x7f alone
    // would keep 4 (the min-id "representative") and drop 5: exactly
    // backwards, 5 is the host with MORE content.
    val sub = (1 to 20).map(i => s"a$i").mkString(" ")
    val sup = ((1 to 20).map(i => s"a$i") ++ (1 to 4).map(i => s"b$i"))
      .mkString(" ")
    // 6/7: fuzzy near-dups, NOT an embed — 17 shared of 20/20 shingles,
    // J = 17/23 ≈ 0.74 fires, containment = 17/20 = 0.85 < 19/20 silent.
    val near1 = (1 to 24).map(i => s"c$i").mkString(" ")
    val near2 = ((1 to 21).map(i => s"c$i") ++ (1 to 3).map(i => s"d$i"))
      .mkString(" ")
    val docs = Seq((1L, article), (2L, host), (3L, unrelated), (4L, sub),
      (5L, sup), (6L, near1), (7L, near2)).toDF("doc_id", "text")
    val sh = Text.shingles(docs)
    val cont = Text.containmentPairs(sh, cNum = 19, cDen = 20)
    assert(cont.select("contained").as[Long].collect().toSet === Set(1L, 4L))
    val jac = Text.jaccardPairs(sh)
    assert(jac.select(col("da"), col("db")).as[(Long, Long)].collect().toSet
      === Set((4L, 5L), (6L, 7L)))
    val kept = Graph.containmentDedup(docs, cont, jac)
      .select("doc_id").as[Long].collect().toSet
    // host 2 survives its embed; 5 survives BECAUSE the (4,5) edge is
    // restricted away after 4 drops — unrestricted, cluster {4,5} would
    // name dropped 4 as representative and 5 would vanish too; {6,7}
    // clusters normally and keeps min-id 6
    assert(kept === Set(2L, 3L, 5L, 6L))
    // x7n lineage: every dropped doc names its reason and survivor, and
    // kept ∪ dropped partitions the corpus
    val lineage = Graph.dedupLineage(cont, jac)
      .select(col("doc_id"), col("kept_id"), col("reason"))
      .as[(Long, Long, String)].collect().toSet
    assert(lineage === Set(
      (1L, 2L, "contained"),     // the article lost to its host page
      (4L, 5L, "contained"),     // the subset doc lost to its superset
      (7L, 6L, "cluster_dup"))) // the fuzzy near-dup lost to its rep
    assert(kept ++ lineage.map(_._1) === (1L to 7L).toSet)
    assert(lineage.forall { case (_, keptId, _) => kept(keptId) })
  }

  test("x7m containment-aware apply matches a sequential reference on " +
      "random embed-heavy corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'h').map(_.toString)
    def rndText(n: Int): String =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")

    // pure-Scala reference of the full two-stage semantics, including the
    // rare-shingle candidate prune (width 5, maxDf 10 — the engine
    // defaults), containment at 19/20, Jaccard at 7/10
    def ref(texts: List[String]): Set[Long] = {
      val (width, maxDf) = (Text.defaultShingleWidth, Text.defaultMaxDf)
      val shSets: Map[Long, Set[String]] = texts.zipWithIndex.map {
        case (t, i) =>
          val tok = t.split(" ")
          i.toLong -> (if (tok.length >= width)
            tok.sliding(width).map(_.mkString(" ")).toSet
          else Set.empty[String])
      }.toMap
      val df = shSets.values.toList.flatMap(_.toList)
        .groupBy(identity).map { case (s, xs) => s -> xs.size }
      val ids = shSets.keys.toList.sorted
      val pairs = for {
        a <- ids; b <- ids if a < b
        inter = shSets(a) intersect shSets(b)
        if inter.exists(s => df(s) <= maxDf)
      } yield (a, b, inter.size.toLong, shSets(a).size.toLong,
        shSets(b).size.toLong)
      val contained = pairs
        .filter { case (_, _, sh, na, nb) => sh * 20 >= math.min(na, nb) * 19 }
        .map { case (da, db, _, na, nb) => if (na <= nb) da else db }.toSet
      val edges = pairs
        .filter { case (_, _, sh, na, nb) => sh * 10 >= (na + nb - sh) * 7 }
        .collect { case (da, db, _, _, _) if !contained(da) && !contained(db) =>
          (da, db) }
      val cc = ufComponents(edges)
      ids.filter(i => !contained(i) && cc.get(i).forall(_ == i)).toSet
    }

    for (trial <- 1 to 5) {
      val base = List.fill(4 + rnd.nextInt(4))(rndText(5 + rnd.nextInt(16)))
      // hosts EMBED a random earlier doc verbatim and append their own tail
      val hosts = List.fill(1 + rnd.nextInt(3))(
        base(rnd.nextInt(base.size)) + " " + rndText(8 + rnd.nextInt(20)))
      val texts = base ++ hosts
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sh = Text.shingles(docs)
      val kept = Graph.containmentDedup(docs,
          Text.containmentPairs(sh, cNum = 19, cDen = 20),
          Text.jaccardPairs(sh))
        .select("doc_id").as[Long].collect().toSet
      assert(kept === ref(texts), s"trial $trial corpus: $texts")
    }
  }

  private def ccMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("connected components: chain, clique, singleton-pair, separate islands") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),          // chain → all label 1
      (10L, 11L), (11L, 12L), (10L, 12L),    // triangle → label 10
      (20L, 21L),                            // pair
      (30L, 30L))                            // self loop only
    assert(ccMap(edges) === ufComponents(edges))
  }

  test("connected components match union-find on pseudo-random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(ccMap(edges) === ufComponents(edges), s"trial $trial")
    }
  }

  test("connected components: long chain needs multiple propagation rounds") {
    // a 17-node path has diameter 16 > 1 round; min-label still converges
    val edges = (1L until 17L).map(i => (i + 1, i))
    val cc = ccMap(edges)
    assert(cc.values.toSet === Set(1L))
    assert(cc.size === 17)
  }

  test("connected components: 200-node path converges in O(log d) rounds via pointer-jumping") {
    // plain propagation needs 199 rounds; with per-round label compression
    // the reach doubles each round (2^r - 1 ≥ 199 → r = 8), so 10 suffices
    val edges = (1L until 200L).map(i => (i + 1, i))
    val cc = Graph.connectedComponents(edges.toDF("src", "dst"), maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet === Set(1L))
    assert(cc.size === 200)
  }

  test("connected components throw on round exhaustion instead of returning wrong labels") {
    val edges = (1L until 40L).map(i => (i + 1, i))
    val ex = intercept[IllegalStateException] {
      Graph.connectedComponents(edges.toDF("src", "dst"), maxRounds = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  private def incrFold(increments: Seq[Seq[(Long, Long)]])
      : org.apache.spark.sql.DataFrame =
    increments.foldLeft(Graph.emptyLabels(Seq.empty[(Long, Long)].toDF("src", "dst"))) {
      (prior, inc) =>
        Graph.applyDelta(prior,
          Graph.incrementDelta(prior, inc.toDF("src", "dst"))).localCheckpoint()
    }

  test("incremental CC fold equals batch CC on random graphs under random increment splits") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 15
      val edges = Seq.fill(n)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val k = 2 + rnd.nextInt(3)
      val incs = edges.groupBy(_ => rnd.nextInt(k)).values.toSeq
      val folded = incrFold(incs).as[(Long, Long)].collect().toMap
      assert(folded === ufComponents(edges), s"trial $trial")
    }
  }

  test("incremental CC: cross-increment merges relabel absorbed members; untouched clusters emit no delta") {
    // batch 0: three islands; batch 1 merges two of them via a NEW smaller id
    val inc0 = Seq((5L, 6L), (6L, 7L), (10L, 11L), (20L, 21L))
    val prior = incrFold(Seq(inc0))
    assert(prior.as[(Long, Long)].collect().toMap ===
      Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L))
    val delta = Graph.incrementDelta(prior, Seq((2L, 7L), (2L, 10L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // every member of {5,6,7} and {10,11} relabels to 2; node 2 is new;
    // the untouched {20,21} island contributes NO delta rows
    assert(delta === Map(2L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 2L,
      10L -> 2L, 11L -> 2L))
    val after = Graph.applyDelta(prior, delta.toSeq.toDF("node", "cluster"))
      .as[(Long, Long)].collect().toMap
    assert(after === ufComponents(inc0 ++ Seq((2L, 7L), (2L, 10L))))
  }

  test("x7j incremental fold is identical to x7 batch clustering at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = Graph.x7NeardupClusters(spark, dir)
      .collect().map(_.toSeq).toSeq
    val incr = Graph.x7jIncrClusters(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(incr === batch)
  }

  test("x7 clusters: every pair member is labeled, label is component min") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Text.stagedJaccardPairs(spark, dir)
      .select("da", "db").as[(Long, Long)].collect()
    val expected = ufComponents(pairs)
    val got = Graph.x7NeardupClusters(spark, dir)
      .select("doc_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("hierarchyPaths: deep chain resolves in log rounds, dangling parent throws") {
    val sp = spark
    import sp.implicits._
    // a 200-deep chain (node k's parent is k-1, root 0): needs pointer
    // doubling — a per-round single-step walk would blow the round budget
    val chain = (0L to 200L).map(k =>
      (k, if (k == 0) None else Some(k - 1))).toDF("node", "parent")
    val got = Graph.hierarchyPaths(chain).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(200L) === (0L, 200L))
    assert(got(0L) === (0L, 0L))
    assert(got(7L) === (0L, 7L))
    // dangling parent: node 5 points at absent node 99 -> loud failure,
    // never a silent null-rooted row
    val dangling = Seq((1L, None), (5L, Some(99L)))
      .toDF("node", "parent")
    val e = intercept[IllegalStateException](
      Graph.hierarchyPaths(dangling).collect())
    assert(e.getMessage.contains("dangling"))
  }

  test("hierarchyApply: conflicting same-batch parent pointers THROW " +
      "(no nondeterministic winner under replay); exact duplicates collapse") {
    val sp = spark
    import sp.implicits._
    val base = Graph.hierarchyPaths(
      Seq((1L, None: Option[Long]), (2L, None: Option[Long]),
        (11L, Some(1L))).toDF("node", "parent"))
    // the same node moved to TWO different parents inside one batch: a
    // micro-batch has no intra-batch order, so any picked winner would
    // be nondeterministic — a crash replay could commit the other
    // closure. Must throw before anything commits.
    val e2 = intercept[Exception](Graph.hierarchyApply(base,
      Seq((11L, Some(1L)), (11L, Some(2L))).toDF("node", "parent")))
    assert(e2.getMessage != null)
    // byte-identical duplicate rows are harmless: distinct collapses
    // them and the move applies once
    val ok = Graph.hierarchyApply(base,
        Seq((11L, Some(2L)), (11L, Some(2L))).toDF("node", "parent"))
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(ok.find(_._1 == 11L).get === ((11L, 2L, 1L, "2/11")))
  }

  test("connectedComponents is type-generic: string keys cluster to the " +
      "lexicographic min; x1e/x1f linkage invariants hold on the fixture") {
    val sp = spark
    import sp.implicits._
    val cc = Graph.connectedComponents(
        Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("u", "v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
    // linkage invariants on the fixture: every pair shares its 3-prefix
    // block and verifies lev <= 2; every clean name links to its
    // 4th-char-dropped variant; the canonical table conserves records
    val pairs = SparkEntry.queries("x1e_fuzzy_linkage")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (na, _, nb, _, lev) =>
      assert(na.take(3) === nb.take(3))
      assert(lev <= 2L)
    }
    val names = Tables.part(spark, TestSpark.sf)
      .selectExpr("lower(p_name) AS n", "1L AS one")
      .collect().map(_.getString(0))
    val pairSet = pairs.map(p => (p._1, p._3)).toSet
    names.distinct.foreach { n =>
      val dropped = n.take(3) + n.drop(4)
      val (a, b) = if (n <= dropped) (n, dropped) else (dropped, n)
      assert(pairSet.contains((a, b)),
        s"clean '$n' not linked to its variant '$dropped'")
    }
    val ents = SparkEntry.queries("x1f_linkage_apply")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // record conservation: dictionary carries clean + dirty copies
    assert(ents.map(_._3).sum === 2L * names.length)
    assert(ents.forall(_._2 >= 1L))
  }

  test("label centroids are invariant to input partitioning") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Mixing.labelCentroids(e.repartition(1))
      .orderBy("label", "pos").collect()
    val b = Mixing.labelCentroids(e.repartition(13))
      .orderBy("label", "pos").collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("temperature weights sum to ~1 and favor rare languages vs raw share") {
    val docs = (1 to 900).map(i => (i.toLong, "en")) ++
      (901 to 1000).map(i => (i.toLong, "fr"))
    val w = Mixing.temperatureWeights(
        docs.toDF("doc_id", "lang"), budget = 1000L)
      .select("lang", "n_docs", "weight").as[(String, Long, Double)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-4)
    // α=1/2 flattening: fr's weight (sqrt(100)/ (sqrt(900)+sqrt(100)) = .25)
    // exceeds its raw 10% share
    assert(w("fr")._2 > 0.24 && w("fr")._2 < 0.26)
  }

  /** Reference: the SAME integer PageRank recurrence over in-memory maps —
    * an independent sequential implementation of the contract, not a
    * replay of the DataFrame plan. */
  private def pageRankRef(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    // self-loops excluded BEFORE symmetrization — same graph semantics as
    // Graph.pageRank, the x7q fold, and the T32 store
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adjIn = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keySet
    val n = nodes.size.toLong
    var r: Map[Long, Long] = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        val in = adjIn.getOrElse(v, Nil).map(u => r(u) / deg(u)).sum
        v -> ((scale / n) * 15 / 100 + in * 85 / 100)
      }.toMap
    }
    r
  }

  test("pageRank matches the sequential integer reference; hub outranks leaves; repartition-invariant") {
    // star (1 hub, 3 leaves) plus a disjoint pair
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRank(df, iters = 3, scale = 1000000000000L, topK = 10)
      .as[(Long, Long)].collect().toSeq
    val ref = pageRankRef(edges, 3, 1000000000000L)
    assert(got === ref.toSeq.sortBy { case (v, r) => (-r, v) })
    val byNode = got.toMap
    assert(byNode(1L) > byNode(2L))              // hub concentrates mass
    assert(byNode(2L) === byNode(3L))            // symmetric leaves tie
    assert(byNode(10L) === byNode(11L))          // disjoint pair symmetric
    val reGot = Graph.pageRank(df.repartition(7), iters = 3,
      scale = 1000000000000L, topK = 10).as[(Long, Long)].collect().toSeq
    assert(reGot === got)                        // integer sums: order-free
  }

  test("self-loops are excluded identically by batch pageRank, the x7q fold, and the T32 store (end-to-end agreement)") {
    import graft.streaming.Streams
    // the q34 star+pair graph plus a self-loop on an EXISTING node (1)
    // and one on an otherwise-ABSENT node (5) — the fixtures cannot
    // produce either (parity-disjoint ids), so this is the only coverage
    // of the three loop-filter paths agreeing on the edge set
    val loopy = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L),
      (1L, 1L), (5L, 5L))
    val clean = loopy.filter(e => e._1 != e._2)
    val scale = 1000000000000L
    val batch = Graph.pageRank(loopy.toDF("src", "dst"), iters = 3,
      scale = scale, topK = 10).as[(Long, Long)].collect().toSeq
    // ground truth: the sequential reference gives the same answer on
    // the loopy and the loop-free inputs, and the plan matches it
    val ref = pageRankRef(loopy, 3, scale)
    assert(pageRankRef(clean, 3, scale) === ref)
    assert(batch === ref.toSeq.sortBy { case (v, r) => (-r, v) })
    // a loop-only node has NO edges after exclusion: absent entirely
    assert(!batch.map(_._1).contains(5L))
    // the x7q inline fold (foldGraphStores) over the symmetrized loopy
    // set: folded edge store + additively-maintained degrees must serve
    // the identical ranking
    val sym = (loopy ++ loopy.map(_.swap)).distinct.toDF("src", "dst")
    val (es, ds) = Graph.foldGraphStores(sym)
    val fold = Graph.pageRank(es, iters = 3, scale = scale, topK = 10,
      presymmetrized = true, degIn = Some(ds))
      .as[(Long, Long)].collect().toSeq
    assert(fold === batch)
    // the T32 durable store: raw edges across two epochs, with a
    // re-send (no-op) and both self-loops — served ≡ batch
    val dir = java.nio.file.Files.createTempDirectory("t32loop").toString
    Streams.graphEdgesBatch(
      Seq((1L, 2L), (1L, 3L), (1L, 1L)).toDF("src", "dst"), 0L, dir)
    Streams.graphEdgesBatch(
      Seq((1L, 4L), (10L, 11L), (5L, 5L), (1L, 2L)).toDF("src", "dst"),
      1L, dir)
    val served = Streams.servedPageRank(spark, dir, iters = 3,
      scale = scale, topK = 10).as[(Long, Long)].collect().toSeq
    assert(served === batch)
  }

  test("triangleCounts: K4 clique gives 3 per node, chains give none, counted once") {
    // K4 on 1..4 (4 triangles, each node in 3) + a chain 10-11-12 (none)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((10L, 11L), (11L, 12L))).toDF("da", "db")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    assert(got.map(_._2).sum === 4L * 3) // 4 triangles × 3 corners, once each
  }

  test("triangleDelta: incremental fold over random edge splits ≡ batch triangleCounts (triangles closing with 1, 2, or 3 in-batch edges)") {
    def batchRef(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
      Graph.triangleCounts(edges.toDF("da", "db"))
        .as[(Long, Long)].collect().toSeq.sorted
    def fold(incs: Seq[Seq[(Long, Long)]]): Seq[(Long, Long)] = {
      val seed = (Seq.empty[(Long, Long)].toDF("doc_id", "n_tri"),
        Seq.empty[(Long, Long)].toDF("da", "db"))
      val (cnt, _) = incs.foldLeft(seed) { case ((c, stored), inc) =>
        val fresh = inc.toDF("da", "db").distinct()
          .join(stored, Seq("da", "db"), "left_anti").localCheckpoint()
        (Graph.mergeTriangleCounts(c, Graph.triangleDelta(stored, fresh))
            .localCheckpoint(),
          stored.unionByName(fresh).localCheckpoint())
      }
      cnt.as[(Long, Long)].collect().toSeq.sorted
    }
    // K4 arriving one edge at a time: every triangle closes on a LATER
    // batch (the 1-new-edge case), including the last edge closing two
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSeq
    assert(fold(k4.map(Seq(_))) === batchRef(k4))
    // whole K4 in ONE increment: triangles with 3 in-batch edges must
    // still count exactly once (the max-new-edge attribution rule)
    assert(fold(Seq(k4)) === batchRef(k4))
    // random graphs, random 3-way splits — duplicate edges across
    // increments exercise the anti-join guard
    for (seedN <- 1 to 4) {
      val rnd = new scala.util.Random(seedN)
      val edges = (0 until 40).map { _ =>
        val a = rnd.nextInt(10).toLong; val b = rnd.nextInt(10).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val withDups = edges ++ edges.take(5) // re-sends across batches
      val incs = withDups.groupBy(_ => rnd.nextInt(3)).values.toSeq
      assert(fold(incs) === batchRef(edges))
    }
  }

  test("triangle retraction: decrement ≡ batch recount on the survivor graph; delete-then-reinsert nets to zero; counts never go negative") {
    def batchRef(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
      Graph.triangleCounts(edges.toDF("da", "db"))
        .as[(Long, Long)].collect().toSeq.sorted
    for (seedN <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seedN)
      val edges = (0 until 40).map { _ =>
        val a = rnd.nextInt(10).toLong; val b = rnd.nextInt(10).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val delSet = edges.filter { case (a, b) => (a + b) % 3 == 0 }.toSet
      val remSeq = edges.filterNot(delSet)
      val counts = Graph.triangleCounts(edges.toDF("da", "db"))
        .localCheckpoint()
      val del = delSet.toSeq.toDF("da", "db")
      val rem = remSeq.toDF("da", "db")
      // decrement by the destroyed-triangle delta, drop zero-count
      // nodes: must equal a from-scratch recount of the survivor graph
      val afterDel = Graph.mergeTriangleCounts(counts,
          Graph.triangleDeleteDelta(rem, del)
            .select(col("doc_id"), (-col("n_tri")).as("n_tri")))
        .localCheckpoint()
      assert(afterDel.filter(col("n_tri") > 0)
        .as[(Long, Long)].collect().toSeq.sorted === batchRef(remSeq))
      // exactly-once attribution ⇒ a decrement can never overdraw
      assert(afterDel.as[(Long, Long)].collect().forall(_._2 >= 0L))
      // re-inserting the retired slice recreates exactly the destroyed
      // triangles — the wave nets to zero and batch counts return
      assert(Graph.mergeTriangleCounts(afterDel,
          Graph.triangleDelta(rem, del))
        .filter(col("n_tri") > 0)
        .as[(Long, Long)].collect().toSeq.sorted === batchRef(edges))
    }
    // a triangle losing TWO edges in one wave is destroyed ONCE (the
    // max-deleted-edge attribution), and one losing all three likewise
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSeq
    val counts = Graph.triangleCounts(k4.toDF("da", "db")).localCheckpoint()
    for (delSet <- Seq(Set((1L, 2L), (1L, 3L)),
        Set((1L, 2L), (1L, 3L), (2L, 3L)))) {
      val remSeq = k4.filterNot(delSet)
      val after = Graph.mergeTriangleCounts(counts,
        Graph.triangleDeleteDelta(remSeq.toDF("da", "db"),
            delSet.toSeq.toDF("da", "db"))
          .select(col("doc_id"), (-col("n_tri")).as("n_tri")))
      assert(after.filter(col("n_tri") > 0)
        .as[(Long, Long)].collect().toSeq.sorted === batchRef(remSeq))
      assert(after.as[(Long, Long)].collect().forall(_._2 >= 0L))
    }
  }

  test("x6h leakage split: cluster partners always share a split, singletons group as themselves, and the naive per-doc coin provably separates some pair") {
    import graft.operators.Curation
    // docs 0..99; nodes 0..49 paired into clusters {2i, 2i+1}; 50..99 singleton
    val docs = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val clusters = (0L until 50L).map(n => (n, (n / 2) * 2))
      .toDF("node", "cluster")
    val split = Curation.leakageSplit(docs, clusters, valPct = 50)
    // every cluster's members land on ONE side — no near-dup relation
    // crosses the train/val boundary
    assert(split.groupBy("grp").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count() === 0)
    // unclustered docs group as themselves
    assert(split.filter(col("doc_id") >= 50)
      .filter(col("grp") =!= col("doc_id")).count() === 0)
    // at 50% both sides are populated (assignment isn't degenerate)
    assert(split.select("split").distinct().count() === 2)
    // the leak x6h exists to prevent: hashing per DOC splits at least one
    // clustered pair across the boundary
    val naive = docs.select(col("doc_id"),
      Curation.splitOf(col("doc_id"), 50).as("split"))
    assert(naive.join(clusters, naive("doc_id") === clusters("node"))
      .groupBy("cluster").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count() > 0)
  }

  test("x6i curation diff: statuses partition the two corpora exactly and every reason names a predicate that really flipped") {
    import graft.operators.Curation
    import graft.Tables
    val diff = Curation.x6iCurationDiff(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    val byStatus = diff.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._1).toSet }
    val (kept, removed, added) = (byStatus.getOrElse("kept", Set.empty[Long]),
      byStatus.getOrElse("removed", Set.empty[Long]),
      byStatus.getOrElse("added", Set.empty[Long]))
    assert(kept.nonEmpty && removed.nonEmpty && added.nonEmpty)
    // run A is exactly the x6 corpus: kept ⊎ removed reconstructs it, and
    // added is disjoint from it
    val corpusA = graft.operators.Curation.x6Curation(spark, TestSpark.sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((kept ++ removed) === corpusA)
    assert((kept & removed).isEmpty && (added & corpusA).isEmpty)
    // reason attribution: 'lang' rows really flipped the language verdict
    // (removed = es, added = fr); 'len' rows flipped only the band
    // (removed = below B's raised floor, added = above A's old ceiling)
    val meta = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    diff.filter(_._3.contains("lang")).foreach { case (id, s, _) =>
      assert(meta(id)._1 === (if (s == "removed") "es" else "fr")) }
    diff.filter(_._3.contains("len")).foreach { case (id, s, _) =>
      val n = meta(id)._2
      if (s == "removed") assert(n >= 20 && n < 25)
      else assert(n > 90 && n <= 100) }
    diff.filter(_._2 == "kept").foreach { case (_, _, r) => assert(r.isEmpty) }
  }

  test("x7q store fold: maintained symmetric edge + degree stores serve pageRank ≡ batch, with re-sent edges as no-ops") {
    // fold SYMMETRIC increments (both directions of an edge together,
    // as x7q's pmod(src+dst) split guarantees) into the two stores
    def fold(incs: Seq[Seq[(Long, Long)]]): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
      val seed = (Seq.empty[(Long, Long)].toDF("src", "dst"),
        Seq.empty[(Long, Long)].toDF("src", "deg"))
      incs.foldLeft(seed) { case ((stored, deg), inc) =>
        val sym = (inc ++ inc.map(_.swap)).toDF("src", "dst")
        val fresh = sym.distinct()
          .join(stored, Seq("src", "dst"), "left_anti").localCheckpoint()
        (stored.unionByName(fresh).localCheckpoint(),
          deg.unionByName(fresh.groupBy(col("src"))
              .agg(count(lit(1)).as("deg")))
            .groupBy(col("src")).agg(sum(col("deg")).as("deg"))
            .localCheckpoint())
      }
    }
    val rnd = new scala.util.Random(7)
    val edges = (0 until 30).map { _ =>
      val a = rnd.nextInt(9).toLong; val b = rnd.nextInt(9).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val withDups = edges ++ edges.take(6) // cross-batch re-sends
    val incs = withDups.groupBy(_ => rnd.nextInt(3)).values.toSeq
    val (edgeStore, degStore) = fold(incs)
    // the maintained degree table must equal the edge-derived one exactly
    val derived = edgeStore.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(degStore.as[(Long, Long)].collect().toSeq.sorted === derived)
    // serving from the stores ≡ the batch plan on the raw edge list
    val served = Graph.pageRank(edgeStore, iters = 3,
        scale = 1000000000000L, topK = 20, presymmetrized = true,
        degIn = Some(degStore))
      .as[(Long, Long)].collect().toSeq
    val batch = Graph.pageRank(edges.toDF("src", "dst"), iters = 3,
        scale = 1000000000000L, topK = 20)
      .as[(Long, Long)].collect().toSeq
    assert(served === batch)
  }
}
