package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TopK, VectorFunctions}
import graft.operators.Vectors
import graft.sources.CdcSources

/** Native-expression, SQL-registration, Aggregator and source coverage. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot_f32 native expression is bit-identical to the generated column chain") {
    val e = Tables.embeddings(spark, TestSpark.sf).limit(100)
    val pairs = e.select(col("vec_id"), col("embedding"))
      .crossJoin(e.select(col("vec_id").as("v2"), col("embedding").as("e2")).limit(5))
    val both = pairs.select(
      VectorFunctions.dotF32(col("embedding"), col("e2")).as("native"),
      Portable.dot(col("embedding"), col("e2"), 64).as("chain"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dot_f32 null handling and SQL registration") {
    VectorFunctions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("v_dot")
    val viaSql = spark.sql("SELECT dot_f32(a, b) AS d FROM v_dot").collect()(0).getDouble(0)
    assert(viaSql === 11.0)
    // null array propagates null (nullIntolerant)
    val n = spark.sql("SELECT dot_f32(a, CAST(NULL AS ARRAY<FLOAT>)) AS d FROM v_dot").collect()(0)
    assert(n.isNullAt(0))
  }

  test("dot_f32 via SparkSessionExtensions-style injection compiles the same builder") {
    // the extensions class is exercised for construction; full session
    // rebuild is avoided (one shared session per JVM in tests)
    val ext = new graft.functions.GraftExtensions
    assert(ext != null)
  }

  test("cms_probe native expression matches CountMinSketch.estimateCount exactly") {
    import graft.functions.CountMinProbe
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 200).map(i => s"tok${rnd.nextInt(60)}_$i") ++
      (0 until 300).map(_ => s"hot${rnd.nextInt(9)}")
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.05, 0.95, 11)
    vocab.foreach(cms.add)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val grid = CountMinProbe.parse(bos.toByteArray)
    assert(grid.table.length === grid.depth * grid.width)
    // probe present AND absent tokens through a real DataFrame (codegen
    // path) and compare bit-exactly with the reference sketch object
    val probes = (vocab.distinct ++ Seq("never-seen", "", "absent-token")).toDF("t")
    val got = probes.select(col("t"),
      CountMinProbe.probe(grid, col("t")).as("est")).collect()
    assert(got.nonEmpty)
    got.foreach(r =>
      assert(r.getLong(1) === cms.estimateCount(r.getString(0)), r.getString(0)))
    // interpreted path (no codegen) agrees too
    val interp = graft.functions.CountMinProbe(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("hot3"),
        org.apache.spark.sql.types.StringType),
      grid.table, grid.depth, grid.width)
    assert(interp.eval(null) === cms.estimateCount("hot3"))
  }

  test("cms_probe SQL registration: hex-literal sketch gives the same estimates") {
    import graft.functions.CountMinProbe
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.1, 0.95, 5)
    Seq("a", "a", "b", "c", "c", "c").foreach(cms.add)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val hex = bos.toByteArray.map("%02x".format(_)).mkString
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_probe", CountMinProbe.builder, "built-in")
    Seq("a", "b", "c", "zzz").toDF("t").createOrReplaceTempView("v_cms")
    val got = spark.sql(s"SELECT t, cms_probe(t, '$hex') AS est FROM v_cms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> cms.estimateCount("a"), "b" -> cms.estimateCount("b"),
      "c" -> cms.estimateCount("c"), "zzz" -> cms.estimateCount("zzz")))
  }

  test("cms_probe with a non-literal sketch argument fails at analysis, not runtime") {
    import graft.functions.CountMinProbe
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_probe", CountMinProbe.builder, "built-in")
    Seq("a", "b").toDF("t").createOrReplaceTempView("v_cms_neg")
    // the sketch must ride as a literal (parsed once at plan time); a
    // column reference is an ANALYSIS error with the standard
    // non-foldable-input error class, not a runtime IllegalArgumentException
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cms_probe(t, t) FROM v_cms_neg").collect()
    }
    assert(e.getCondition === "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
      s"unexpected error class: ${e.getCondition}")
  }

  test("x4m probe path contains no UDF and stays in whole-stage codegen") {
    val df = graft.operators.Text.cmsFrequencyBound(
      Tables.documents(spark, TestSpark.sf), eps = 0.1, confidence = 0.99,
      seed = 42)
    df.collect() // force execution so the final plan exists
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"udf in x4m plan:\n$plan")
    assert(plan.contains("cms_probe"), "probe expression missing from plan")
  }

  test("bloom membership: no false negatives, partition-order-invariant sketch, bounded false positives") {
    import graft.functions.BloomMembership
    val members = (0 until 2000).map(i => s"member-$i")
    val nonMembers = (0 until 10000).map(i => s"absent-$i")
    def sketchOf(parts: Int): Array[Byte] =
      members.toDF("t").repartition(parts)
        .agg(BloomMembership.bloomAgg(col("t"), 4096L, 1L << 16).as("bf"))
        .head.getAs[Array[Byte]]("bf")
    val sketch = sketchOf(1)
    // OR-merge is commutative: any partitioning builds the identical bytes
    assert(java.util.Arrays.equals(sketch, sketchOf(7)))
    // the theorem: every inserted member probes true — zero false negatives
    val misses = members.toDF("t")
      .filter(!BloomMembership.mightContain(sketch, col("t"))).count()
    assert(misses === 0L)
    // definitely-absent: fp rate bounded (16 KiB bits for 2k items,
    // k sized for 4k → fpp well under 1%; assert a loose 2%)
    val fps = nonMembers.toDF("t")
      .filter(BloomMembership.mightContain(sketch, col("t"))).count()
    assert(fps <= 200L, s"false-positive rate ${fps / 10000.0} above bound")
  }

  test("bloom sizing: bitsFor holds the formula over n/p ranges and the measured fpp tracks the target") {
    import graft.functions.BloomMembership
    val ln2sq = math.log(2.0) * math.log(2.0)
    // property over the n/p grid: ≥ the theoretical minimum, byte-aligned,
    // monotone in n and in 1/p
    val ns = Seq(100L, 10000L, 1000000L, 1000000000L)
    val ps = Seq(0.1, 0.01, 1e-4, 1e-8)
    for (n <- ns; p <- ps) {
      val bits = BloomMembership.bitsFor(n, p)
      assert(bits >= -n * math.log(p) / ln2sq, s"n=$n p=$p under formula")
      assert(bits % 8 === 0L, s"n=$n p=$p not byte-aligned")
    }
    for (p <- ps; Seq(a, b) <- ns.sliding(2))
      assert(BloomMembership.bitsFor(a, p) <= BloomMembership.bitsFor(b, p))
    for (n <- ns; Seq(pHi, pLo) <- ps.sliding(2))
      assert(BloomMembership.bitsFor(n, pHi) <= BloomMembership.bitsFor(n, pLo))
    // degenerate inputs fail loudly instead of sizing a broken sketch
    intercept[IllegalArgumentException](BloomMembership.bitsFor(0L, 0.01))
    intercept[IllegalArgumentException](BloomMembership.bitsFor(100L, 0.0))
    // measured fpp at the derived size stays near the target (≤3x covers
    // byte-rounding + integer-k quantization) for two target rates
    for (p <- Seq(0.01, 0.001)) {
      val n = 2000L
      val members = (0 until n.toInt).map(i => s"in-$p-$i")
      val sketch = members.toDF("t")
        .agg(BloomMembership.bloomAgg(col("t"), n,
          BloomMembership.bitsFor(n, p)).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      val probes = 20000
      val fps = (0 until probes).map(i => s"out-$p-$i").toDF("t")
        .filter(BloomMembership.mightContain(sketch, col("t"))).count()
      assert(fps <= (3 * p * probes).ceil.toLong,
        s"p=$p measured fpp ${fps.toDouble / probes}")
      val misses = members.toDF("t")
        .filter(!BloomMembership.mightContain(sketch, col("t"))).count()
      assert(misses === 0L) // sizing never touches the no-false-negative theorem
    }
  }

  test("guards fail loudly, never silently: dot_f32 length mismatch, bloomAgg over Spark's silent clamp, guardMoments NULL moment") {
    val sp = spark
    import sp.implicits._
    // a 3-elem vs 4-elem embedding is data corruption — a min-length
    // partial dot would return a plausible score and bury it
    val mm = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f, 4f)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.dotF32(col("a"), col("b")))
    val e1 = intercept[Exception](mm.collect())
    assert(e1.getMessage != null)
    // BloomFilterAggregate silently Math.min-clamps past the SQLConf
    // maxima — the helper must throw instead of building a useless sketch
    val e2 = intercept[IllegalArgumentException](
      graft.functions.BloomMembership.bloomAgg(col("x"),
        100000000L,
        graft.functions.BloomMembership.bitsFor(100000000L, 1e-4)))
    assert(e2.getMessage.contains("clamped"))
    // a NULL moment must THROW the q36 guard, not pass it fail-open
    val nullM = Seq((9L, 5L)).toDF("user_id", "n")
      .withColumn("m", lit(null).cast("long"))
    val e3 = intercept[Exception](
      operators.Relational.guardMoments(nullM).collect())
    assert(e3.getMessage != null)
  }

  test("TopK aggregator matches the window row_number formulation exactly") {
    val viaAgg = Vectors.x3dTopKAgg(spark, TestSpark.sf).collect()
    val viaWindow = Vectors.x3CosineTopK(spark, TestSpark.sf).collect()
    assert(viaAgg.length === viaWindow.length)
    viaAgg.zip(viaWindow).foreach { case (a, w) =>
      assert(a.getLong(0) === w.getLong(0))   // q_id
      assert(a.getInt(1) === w.getInt(1))     // rank
      assert(a.getLong(2) === w.getLong(2))   // vec_id
      assert(java.lang.Double.doubleToLongBits(a.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(w.getDouble(3)))
    }
  }

  test("IVF-PQ (coarse route x ADC shortlist x exact re-rank) recalls the brute-force top-5") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter(col("vec_id") < 10)
    val exact = Vectors.cosineTopK(q, e, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet // (q_id, vec_id, sim, rank)
    val pq = Vectors.pqSearch(q, e, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet // (q_id, rank, vec_id, sim)
    assert(pq.size === exact.size)
    val recall = (pq & exact).size.toDouble / exact.size
    // quantization error is absorbed by the exact re-rank; the loss path
    // is only coarse routing (as x3e) and ADC shortlist truncation
    assert(recall >= 0.6, s"IVF-PQ recall $recall")
    // codes are genuine product-quantization output: m entries in [0, ksub)
    val codes = Vectors.pqEncode(e.limit(20),
      Vectors.pqCodebooks(e, 8, 16, 3)).select("codes").collect()
    codes.foreach { r =>
      val cs = r.getSeq[Int](0)
      assert(cs.length === 8)
      assert(cs.forall(c => c >= 0 && c < 16), cs.mkString(","))
    }
  }

  test("pqReconstructionError: exact vs sequential reference; drifted increments read measurably worse (the refit alarm)") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val books = Vectors.pqCodebooks(e, 8, 16, 3)
    val sub = Vectors.dim / 8
    // exactness: the expression error equals a plain-Scala recompute
    val got = Vectors.pqReconstructionError(e.limit(50), books)
      .select("vec_id", "embedding", "codes", "recon_err").collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val cs = r.getSeq[Int](2)
      var ref = 0.0
      for (j <- 0 until 8; i <- 0 until sub) {
        val d = v(j * sub + i).toDouble - books(j)(cs(j))(i).toDouble
        ref += d * d
      }
      assert(math.abs(r.getDouble(3) - ref) < 1e-12,
        s"vec ${r.getLong(0)}: expr ${r.getDouble(3)} vs ref $ref")
    }
    // drift detection: an out-of-model increment (negated vectors — the
    // T16 worst case) reconstructs worse under the FROZEN codebooks than
    // the in-model corpus, so a per-batch mean is a refit signal
    def meanErr(df: org.apache.spark.sql.DataFrame): Double =
      Vectors.pqReconstructionError(df, books)
        .agg(avg(col("recon_err"))).head.getDouble(0)
    val inModel = meanErr(e)
    val drifted = meanErr(e.withColumn("embedding",
      expr("transform(embedding, v -> -v)")))
    assert(drifted > inModel,
      s"drifted increment ($drifted) should reconstruct worse than in-model ($inModel)")
  }

  test("pqEncode expression path equals a sequential reference encoder") {
    // the distributed encode runs argmax(v.c - |c|^2/2) through dotF32 +
    // array_position; a plain-Scala argmin ||v-c||^2 over the same
    // codebooks must pick the same code for every (vector, subspace) —
    // first-match tie-break both sides
    val e = Tables.embeddings(spark, TestSpark.sf).limit(100)
    val books = Vectors.pqCodebooks(e, 8, 16, 3)
    val sub = Vectors.dim / 8
    val got = Vectors.pqEncode(e, books)
      .select("vec_id", "embedding", "codes").collect()
    assert(got.length === 100)
    got.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val cs = r.getSeq[Int](2)
      for (j <- 0 until 8) {
        val xs = v.slice(j * sub, (j + 1) * sub)
        var best = 0; var bestD = Double.MaxValue
        for (c <- 0 until 16) {
          var d = 0.0
          for (i <- 0 until sub) {
            val t = xs(i).toDouble - books(j)(c)(i).toDouble; d += t * t
          }
          if (d < bestD) { bestD = d; best = c }
        }
        assert(cs(j) === best,
          s"vec ${r.getLong(0)} subspace $j: expr ${cs(j)} vs ref $best")
      }
    }
  }

  test("IVF search recalls most of the exact brute-force top-5") {
    val exact = Vectors.x3CosineTopK(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Vectors.x3eCosineIvf(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.size === exact.size)
    val recall = (ivf & exact).size.toDouble / exact.size
    // 4-of-16 probes on 500 random unit vectors: recall well above chance
    // (chance ≈ nprobe/nlist = 0.25); assert a conservative floor
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("Misra-Gries bound holds for random streams under random partitioning and merge order") {
    val rnd = new scala.util.Random(42)
    val agg = graft.functions.MisraGries.mg(8)
    for (trial <- 1 to 40) {
      // zipf-ish stream: token id ~ floor(vocab * u^2) skews low ids hot
      val vocab = 1 + rnd.nextInt(30)
      val stream = Seq.fill(50 + rnd.nextInt(500)) {
        val u = rnd.nextDouble(); s"t${(vocab * u * u).toInt}"
      }
      val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = stream.size.toLong
      // random partitioning, per-partition reduce, random-order pairwise merge
      val parts = stream.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(6))).values.toSeq
      var bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      while (bufs.size > 1)
        bufs = rnd.shuffle(agg.merge(bufs(0), bufs(1)) +: bufs.drop(2))
      val sketch = agg.finish(bufs.head)
      assert(sketch.size <= 7, s"trial $trial: ${sketch.size} counters")
      sketch.foreach { case (t, est) =>
        val cnt = truth(t)
        assert(est <= cnt, s"trial $trial: $t overcounted $est > $cnt")
        assert((cnt - est) * 8 <= n, s"trial $trial: $t undercount ${cnt - est} > N/k")
      }
      truth.foreach { case (t, cnt) =>
        if (cnt * 8 > n)
          assert(sketch.contains(t), s"trial $trial: heavy $t ($cnt of $n) missing")
      }
    }
  }

  test("x4l heavy hitters: every true heavy token captured within the N/k bound") {
    val rows = operators.Text.x4lHeavyHitters(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} not captured")
      assert(r.getBoolean(3), s"${r.getString(0)} undercount exceeds N/k")
    }
  }

  test("x4m CMS oracle: never undercounts, overcount within eps*N, grid partition-invariant") {
    val rows = operators.Text.x4mCmsBound(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} undercounted")
      assert(r.getBoolean(3), s"${r.getString(0)} overcount exceeds eps*N")
    }
    // counter-grid addition commutes: the SERIALIZED sketch must be
    // byte-identical under any repartitioning of the token stream
    val toks = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("token"))
    def grid(df: org.apache.spark.sql.DataFrame): Array[Byte] = df
      .agg(count_min_sketch(col("token"), lit(0.1), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(grid(toks), grid(toks.repartition(7))))
  }

  test("QDigest: totals preserved, size <= 3k, rank bound on deterministic " +
      "streams under arbitrary split points, q8g booleans all true") {
    val Q = graft.functions.QDigest
    val k = 128
    val vals: Seq[Long] = (0 until 5000).map(i => (i * i % 3777).toLong)
    val n = vals.size.toLong
    def leafCounts(vs: Seq[Long]) = vs.groupBy(identity).view
      .mapValues(_.size.toLong).map { case (v, c) => Q.leaf(v) -> c }.toMap
    val single = Q.compress(leafCounts(vals), n, k)
    assert(Q.total(single) === n)
    assert(single.size <= 3 * k)
    val sorted = vals.sorted
    val bound = Q.logU * math.max(1L, n / k)
    def assertBound(digest: Map[Long, Long], label: String): Unit =
      for (p <- Seq(1L, 25L, 50L, 75L, 99L)) {
        val dv = Q.quantile(digest, n, p, 100L)
        val target = (p * n + 99L) / 100L
        val rLo = sorted.count(_ < dv).toLong
        val rHi = sorted.count(_ <= dv).toLong
        assert(rHi >= target - bound && rLo <= target + bound,
          s"$label p$p: dv=$dv rank[$rLo,$rHi] target=$target bound=$bound")
      }
    assertBound(single, "single-pass")
    // the bound survives ANY merge tree: fold at several split points
    for (splits <- Seq(Seq(1000), Seq(100, 2500), Seq(700, 1400, 4000))) {
      val cuts = (0 +: splits :+ vals.size).sliding(2)
        .map { case Seq(a, b) => vals.slice(a, b) }.toSeq
      val merged = cuts.zipWithIndex.map { case (c, i) =>
        (leafCounts(c), c.size.toLong)
      }.reduceLeft[(Map[Long, Long], Long)] { case ((d1, n1), (lc2, n2)) =>
        (Q.merge(d1, lc2, n1 + n2, k), n1 + n2)
      }
      assert(Q.total(merged._1) === n)
      assert(merged._1.size <= 3 * k)
      assertBound(merged._1, s"merged@$splits")
    }
    // the registered q8g booleans
    val rows = operators.Relational.q8gQdigestBound(spark, TestSpark.sf)
      .collect()
    assert(rows.length === 7)
    rows.foreach(r => assert(r.getBoolean(2), s"q8g rank_ok false at $r"))
  }

  test("S3 JSON-lines changelog source roundtrips the envelope") {
    val dir = java.nio.file.Files.createTempDirectory("chg").toString
    val chg = operators.Cdc.changelog(spark, TestSpark.sf).limit(50)
    chg.select(to_json(struct(col("before"), col("after"), col("source"),
        col("op"), col("ts_ms"), col("transaction"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val back = CdcSources.jsonChangelog(spark, dir)
    assert(back.count() === 50)
    assert(back.schema.fieldNames.toSeq ===
      Seq("before", "after", "source", "op", "ts_ms", "transaction"))
    assert(back.filter(col("source.lsn").isNull).count() === 0)
  }

  test("S4/S5 sink builders produce streaming writers") {
    implicit val ctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[E]
    assert(CdcSources.consoleSink(mem.toDF) != null)
    val tmp = java.nio.file.Files.createTempDirectory("sink").toString
    assert(CdcSources.parquetSink(mem.toDF, s"$tmp/out", s"$tmp/ckpt") != null)
  }
}
