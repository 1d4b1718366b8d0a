package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Text, Vectors}

/** Unit-level checks for the extension operators on hand-built inputs. */
class TextVectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact dedup keeps the minimum-id representative per text") {
    val docs = Seq((3L, "a b c"), (1L, "a b c"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val kept = Text.dedupExact(docs, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L))
  }

  test("duplicate spans: cross-doc and within-doc runs merge into maximal spans") {
    val docs = Seq(
      (1L, "p q r s t u"),         // shares "p q r s t" with doc 2
      (2L, "z p q r s t"),
      (3L, "a b c d e a b c d e"), // self-repetition: adjacent runs merge
      (4L, "k l m n o w v"),       // all grams unique -> no spans
      (5L, "x y"))                 // shorter than n -> no grams, no crash
      .toDF("doc_id", "text")
    val spans = Text.duplicateSpans(docs)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq === Seq(
      (1L, 0L, 4L, 5L),   // gram at pos 0 covers tokens 0..4
      (2L, 1L, 5L, 5L),   // same content one position over
      (3L, 0L, 9L, 10L))) // two occurrences 0..4 and 5..9 fuse into one span
  }

  test("span-dedup apply strikes covered tokens, keeps order, nulls fully-dup docs") {
    val docs = Seq(
      (1L, "p q r s t u"),         // span [0,4] -> keeps only "u"
      (2L, "z p q r s t"),         // span [1,5] -> keeps only "z"
      (3L, "a b c d e a b c d e"), // fully covered -> nothing kept
      (4L, "k l m n o w v"))       // untouched
      .toDF("doc_id", "text")
    val r = Text.spanDedupApply(docs, Text.duplicateSpans(docs))
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), Option(x.getString(3))))
    def fp(s: String) = Some(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(r.toSeq === Seq(
      (1L, 1L, 5L, fp("u")),
      (2L, 1L, 5L, fp("z")),
      (3L, 0L, 10L, None),
      (4L, 7L, 0L, fp("k l m n o w v"))))
  }

  test("DSIR selection: target-like pool docs selected, partition-order invariant") {
    // target split (id < 2): bigrams of "a b" dominate; pool doc 2 repeats
    // them (target-like), pool doc 3 shares nothing (pool-like)
    val docs = Seq(
      (0L, "a b a b a b"),
      (1L, "a b c d"),
      (2L, "a b a b"),
      (3L, "x y z x y"))
      .toDF("doc_id", "text")
    val r = Text.dsirSelect(docs, targetMax = 2L)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(3)))
    assert(r.map(_._1).toSeq === Seq(2L, 3L))
    val sel = Text.dsirSelect(docs, targetMax = 2L)
      .filter(col("selected")).select("doc_id").as[Long].collect().toSeq
    assert(sel === Seq(2L))
    // fixed-point quantization => the score is an exact integer sum,
    // identical under any physical partitioning of the input
    val a = Text.dsirSelect(docs, 2L).select("doc_id", "logw_micro").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val b = Text.dsirSelect(docs.repartition(7), 2L)
      .select("doc_id", "logw_micro").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(a === b)
  }

  test("cosine top-k: identical vector ranks first, orthogonal last") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // identical to query
      (2L, Array(0.8f, 0.6f, 0.0f, 0.0f)),   // cos = 0.8
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)))   // orthogonal
      .toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") === 0)
    val top = Vectors.cosineTopK(q, e, 3)
      .orderBy("rank").select("vec_id", "sim").collect()
    assert(top(0).getLong(0) === 1L && math.abs(top(0).getDouble(1) - 1.0) < 1e-12)
    assert(top(1).getLong(0) === 2L)
    assert(top(2).getDouble(1) === 0.0)
  }

  test("sign-bucket LSH assigns equal buckets to sign-identical vectors") {
    val df = Seq(
      (0L, Array(0.5f, -0.1f, 0.2f, -0.3f)),
      (1L, Array(0.9f, -0.7f, 0.1f, -0.9f)),  // same sign pattern → same bucket
      (2L, Array(-0.5f, 0.1f, -0.2f, 0.3f)))  // inverted → different bucket
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Vectors.signBucket(col("embedding")).as("b"))
      .collect()
    assert(df(0).getInt(1) === df(1).getInt(1))
    assert(df(0).getInt(1) !== df(2).getInt(1))
  }

  test("multimodal: payload roundtrip, batch features deterministic, frames partition payload") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(50)
    val media = Multimodal.attachPayload(docs)
    val feats1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    val feats2 = Multimodal.extractFeatures(media.repartition(7), dim = 16)
      .collect().sortBy(_.doc_id)
    assert(feats1.length === 50)
    assert(feats1.forall(_.features.length === 16))
    // determinism across partitionings (batch boundaries must not matter)
    assert(feats1.zip(feats2).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.features.sameElements(b.features) })
    // frame sampling: concatenated frames == original payload bytes
    val byId = media.collect().map(m => m.doc_id -> m.payload).toMap
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
      .groupBy(_.doc_id)
    frames.foreach { case (id, fs) =>
      val joined = fs.sortBy(_.frame_idx).flatMap(_.frame_bytes)
      assert(joined.sameElements(byId(id)))
    }
    assert(frames.nonEmpty)
  }

  test("mmrSelect refuses non-integral id columns at plan time (the long cast would NULL them at runtime)") {
    val cand = Seq(("q", "x", 1.0)).toDF("q_id", "vec_id", "rel")
    val pairs = Seq(("q", "x", "y", 0.5)).toDF("q_id", "a", "b", "sim")
    val e = intercept[IllegalArgumentException](
      Vectors.mmrSelect(cand, pairs, 2))
    assert(e.getMessage.contains("integral"))
    // integral-but-narrow ids widen fine (the guard only rejects lossy casts)
    val ok = Vectors.mmrSelect(
      Seq((1, 2, 1.0), (1, 3, 0.4)).toDF("q_id", "vec_id", "rel"),
      Seq((1, 2, 3, 0.9)).toDF("q_id", "a", "b", "sim"), 1)
    assert(ok.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L)))
  }

  test("PPM codec: encode→decode round-trips bytes and dims; strict parser throws on malformed input; features equal a brute pixel walk") {
    // round-trip: decoded plane is exactly the cycled text bytes
    val text = "the quick brown fox jumps over the lazy dog"
    val tb = text.getBytes("UTF-8")
    val p = Multimodal.encodePpm(text, 6, 4)
    val (w, h, px) = Multimodal.decodePpm(p)
    assert(w === 6 && h === 4 && px.length === 6 * 4 * 3)
    assert(px.zipWithIndex.forall { case (b, j) => b === tb(j % tb.length) })
    // a '#' comment between header tokens parses per the Netpbm spec
    val hdr = s"P6\n# a comment\n6 4\n255\n".getBytes("US-ASCII")
    val withComment = hdr ++ px
    assert(Multimodal.decodePpm(withComment)._3.sameElements(px))
    // strict-parser guard rail: each malformation THROWS, never pads
    def bad(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodePpm(bytes))
      assert(e.getMessage.contains(what), s"$what: ${e.getMessage}")
    }
    bad("P5\n6 4\n255\n".getBytes("US-ASCII") ++ px, "magic")
    bad(s"P6\n6 4\n65535\n".getBytes("US-ASCII") ++ px, "maxval")
    bad(p.dropRight(1), "plane")         // truncated plane
    bad(p ++ Array(0.toByte), "plane")   // trailing garbage
    // a missing dimension token shifts the remaining tokens: the parser
    // reads 255 as height and then fails to find a maxval in the plane
    bad("P6\n6\n255\n".getBytes("US-ASCII") ++ px, "maxval")
    // features: the mapPartitions decode path ≡ a brute in-memory walk
    val docs = Tables.documents(spark, TestSpark.sf).limit(40)
    val media = Multimodal.attachPpmPayload(docs)
    val got = Multimodal.extractPpmFeatures(media, dim = 16)
      .collect().sortBy(_.doc_id)
    val ref = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).map { case (id, t) =>
        val bytes = t.getBytes("UTF-8")
        val n = (4 + id % 5).toInt * (3 + id % 3).toInt * 3
        val sums = new Array[Long](16)
        (0 until n).foreach(j => sums(j % 16) += bytes(j % bytes.length) & 0xff)
        (id, n.toLong, sums.toSeq)
      }
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (g, (id, n, sums)) =>
      assert(g.doc_id === id && g.n_px === n)
      assert(g.buckets.toSeq === sums && g.px_sum === sums.sum)
    }
    // repartition-invariant (batch boundaries must not matter)
    val got2 = Multimodal.extractPpmFeatures(media.repartition(7), dim = 16)
      .collect().sortBy(_.doc_id)
    assert(got.zip(got2).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.buckets.sameElements(b.buckets) })
    // header/metadata contradiction THROWS (catalog row lies about dims)
    val lying = media.map(m => m.copy(meta = m.meta.copy(width = 999)))(
      org.apache.spark.sql.Encoders.product[graft.operators.Multimodal.MediaRow])
    val ex = intercept[org.apache.spark.SparkException](
      Multimodal.extractPpmFeatures(lying, dim = 16).collect())
    assert(ex.getMessage.contains("contradicts") ||
      Option(ex.getCause).exists(_.getMessage.contains("contradicts")))
  }

  test("x5f manifest row-identical to the typed sampleFrames mapPartitions path") {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    val media = Multimodal.attachPayload(Tables.documents(spark, TestSpark.sf))
    val typed = Multimodal.sampleFrames(media, n = 4).collect()
      .map(f => (f.doc_id, f.frame_idx.toLong,
        f.frame_bytes.length.toLong, md5hex(f.frame_bytes))).toSet
    val decl = SparkEntry.queries("x5f_frame_manifest")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(typed.nonEmpty)
    assert(decl === typed)
  }

  test("x5d media bound holds at the largest fixture (worst-case float accumulation)") {
    // sf0.1 has the longest documents (~577 bytes → ~37 terms/bucket); the
    // decode_ok bound must hold with margin there, not just at sf0.001.
    val dir = if (new java.io.File("/root/testdata/sf0.1").isDirectory)
      "/root/testdata/sf0.1" else TestSpark.sf
    val out = Vectors.x5dMediaBound(spark, dir)
      .select("decode_ok", "byte_sum").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(0)), "a decoded feature drifted beyond 5e-4")
    assert(out.forall(_.getLong(1) > 0L))
  }

  test("stratified sample is invariant to input partitioning (md5 order, not row order)") {
    import graft.operators.Curation
    val direct = Curation.x6bStratifiedSample(spark, TestSpark.sf).collect().toSeq
    // same query over a deliberately reshuffled source must pick the SAME docs
    val docs = Tables.documents(spark, TestSpark.sf).repartition(13)
    val tmp = java.nio.file.Files.createTempDirectory("strat").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // the query reads only documents.parquet from the sf dir
    val reshuffled = Curation.x6bStratifiedSample(spark, tmp).collect().toSeq
    assert(direct === reshuffled)
  }

  test("simhash of identical texts is identical; different texts differ somewhere") {
    val q = Text.x2bSimhash(spark, TestSpark.sf)
    val rows = q.limit(20).collect()
    assert(rows.forall(_.getString(1).length === 16))
  }

  test("LSH hot-bucket cap bounds candidates on adversarially skewed input") {
    import spark.implicits._
    // 400 documents with IDENTICAL text: every band bucket they occupy
    // holds all 400 — uncapped, the self-join would emit 4 bands ×
    // C(400,2) ≈ 319k pairs. Plus one planted near-dup pair with unique
    // text that must survive the cap.
    val boiler = (1L to 400L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val pair = Seq(
      (901L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (902L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val sh = Text.shingles(docs)
    val capped = Text.lshCandidates(sh, maxBucket = 10).collect()
    // the planted pair is found; the boilerplate flood is not exploded
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).contains((901L, 902L)))
    val bound = Text.numHashes / 2 * 10 * 10 / 2 // bands · cap²/2
    assert(capped.length <= bound,
      s"${capped.length} candidates exceed the cap bound $bound")
    // sanity: uncapped, the same input explodes quadratically
    val uncapped = Text.lshCandidates(sh, maxBucket = 100000).count()
    assert(uncapped > 70000L, s"uncapped=$uncapped")
  }

  test("two-phase stratified sample equals the single-window formulation") {
    import graft.operators.Curation
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, TestSpark.sf)
    val naive = docs
      .withColumn("rn", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("samp:"), col("doc_id").cast("string"))), col("doc_id"))))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn")).collect().toSeq
    for (b <- Seq(1, 4, 16)) {
      val twoPhase = Curation.stratifiedSample(docs, k = 20, subBuckets = b)
        .orderBy(col("lang"), col("rn")).collect().toSeq
      assert(twoPhase === naive, s"subBuckets=$b")
    }
  }

  test("two-phase token packing equals the single-window running total") {
    import graft.operators.Curation
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, TestSpark.sf)
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("shard", ((col("cum_tokens") - 1) / 2000L).cast("long"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
      .orderBy(col("lang"), col("shard")).collect().toSeq
    for (width <- Seq(100L, 500L, 1000000L)) { // incl. one bucket spanning everything
      val twoPhase = Curation.tokenPacking(docs, budget = 2000L, bucketWidth = width)
        .orderBy(col("lang"), col("shard")).collect().toSeq
      assert(twoPhase === naive, s"bucketWidth=$width")
    }
  }

  test("fingerprint counts equal the window form on a hot-fingerprint corpus") {
    // 400 copies of one text (the skew case the groupBy+join form exists
    // for) plus a few uniques; the de-skewed plan must agree with the
    // single-partition window definition row for row
    val docs = ((1 to 400).map(i => (i.toLong, "same boilerplate text")) ++
      Seq((900L, "unique a"), (901L, "unique b")))
      .toDF("doc_id", "text")
    val got = Text.fingerprintCounts(docs)
      .orderBy("doc_id").collect().toSeq
    val windowed = docs
      .select(col("doc_id"), md5(lower(col("text")).cast("binary")).as("fp"))
      .withColumn("n_same", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .orderBy("doc_id").collect().toSeq
    assert(got === windowed)
    assert(got.count(_.getLong(2) == 400L) === 400)
    // and no per-fp window remains in the de-skewed plan
    val plan = Text.fingerprintCounts(docs).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"))
  }

  test("domain stats: hosts extracted per URL, counted per doc and occurrence") {
    val docs = Seq(
      (1L, "intro https://a.example.com/x then https://a.example.com/y done"),
      (2L, "see http://b.example.net/z and https://a.example.com/w"),
      (3L, "no links at all"))
      .toDF("doc_id", "text")
    val got = operators.Text.domainStats(docs)
      .select("domain", "n_docs", "n_urls")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("a.example.com", 2L, 3L),
      ("b.example.net", 1L, 1L)))
  }

  test("PII scrub masks emails and phones and counts matches") {
    val docs = Seq(
      (1L, "write to jane.doe@corp.example or call 555-0137 today"),
      (2L, "no contact info here at all"))
      .toDF("doc_id", "text")
    val got = operators.Scrub.piiScrub(docs)
      .select("doc_id", "n_emails", "n_phones", "scrubbed")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 1L, 1L, "write to <EMAIL> or call <PHONE> today"),
      (2L, 0L, 0L, "no contact info here at all")))
  }

  test("bm25: rarest-term gate bounds candidates, tf raises the score at equal length") {
    val docs = Seq(
      (1L, "rare common zz zz"),          // tf(common)=1
      (2L, "rare common common zz"),      // tf(common)=2, same dl
      (3L, "common common common common"), // no gate term -> never scored
      (4L, "zz zz zz zz"))
      .toDF("doc_id", "text")
    val got = Text.bm25Retrieve(docs, Seq("rare", "common"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(1L, 2L)) // candidate set = docs holding 'rare'
    assert(got.map(_._2) === Seq(2L, 2L)) // both match both query terms
    val score = got.map(g => g._1 -> g._3).toMap
    assert(score(2L) > score(1L)) // higher tf, identical dl and idf
    assert(score(1L) > 0L)        // Lucene-style idf is always positive
  }

  test("bm25: gate term is the computed argmin-df — a shuffled term order changes nothing") {
    val docs = Seq(
      (1L, "rare common zz zz"),
      (2L, "rare common common zz"),
      (3L, "common common common common"),
      (4L, "zz zz zz zz"))
      .toDF("doc_id", "text")
    // 'common' listed first: a caller-ordered gate (the old terms.head)
    // would flip the semantics to "docs containing 'common'" and score
    // doc 3; the computed argmin-df gate still selects 'rare'
    val shuffled = Text.bm25Retrieve(docs, Seq("common", "rare"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val canon = Text.bm25Retrieve(docs, Seq("rare", "common"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(shuffled === canon)
    assert(shuffled.map(_._1) === Seq(1L, 2L)) // gated on 'rare', not 'common'
  }

  test("quality probe: exactly-interpolable groups score their labels, keep matches") {
    // three distinct (x1, x2) feature points, three parameters -> the
    // least-squares optimum interpolates exactly; scores equal labels
    val docs = Seq(
      (1L, "w w w w w w", "en", 12L),
      (2L, "w w w w w w", "en", 12L),
      (3L, "w w", "de", 4L),
      (4L, "w w w", "fr", 9L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = Text.qualityProbe(docs)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) === Seq(1L, 1L, 0L, 0L))
    assert(got.map(_._3) === Seq(1.0, 1.0, 0.0, 0.0))
    assert(got.map(_._4) === Seq(true, true, false, false))
  }

  test("rrf fusion: both-list docs outrank single-list peers, absent side ranks 0, values integer-exact") {
    val bmr = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "brank")
    val vr = Seq((20L, 1L), (30L, 2L)).toDF("doc_id", "vrank")
    val got = Text.rrfFuse(bmr, vr)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val d61 = 1000000000L / 61; val d62 = 1000000000L / 62
    assert(got === Seq(
      (1L, 20L, 2L, 1L, d62 + d61), // in both lists → top
      (2L, 10L, 1L, 0L, d61),
      (3L, 30L, 0L, 2L, d62)))
  }

  test("repetition metrics: degenerate repeats score 1.0, varied text scores low, single token safe") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // 4 tokens, 3 dups; 3 bigrams all equal
      (2L, "a b c d"),             // no repeats; 3 distinct bigrams
      (3L, "x"))                   // single token: no bigrams at all
      .toDF("doc_id", "text")
    val got = operators.Scrub.repetitionMetrics(docs)
      .select("doc_id", "n_tokens", "dup_tokens", "tok_dup_frac",
        "n_bigrams", "top2_n", "top2_frac")
      .as[(Long, Long, Long, Double, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 4L, 3L, 0.75, 3L, 3L, 1.0),
      (2L, 4L, 0L, 0.0, 3L, 1L, 0.3333),
      (3L, 1L, 0L, 0.0, 0L, 0L, 0.0)))
  }

  test("simhash near-dup pairs: hamming<=3 pairs found, distant pairs excluded") {
    // identical docs -> hamming 0; one with a couple tokens swapped stays
    // within the band recall contract; a disjoint-vocabulary doc pairs with
    // nobody
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"))
      .toDF("doc_id", "text")
    val pairs = Text.simhashPairs(Text.simhash(docs))
      .select("da", "db", "hamming").as[(Long, Long, Long)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("line dedup strikes corpus-hot segments and reassembles survivors in order") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // "x y" appears in 4 distinct docs (df=4 > maxDocs=2) → boilerplate,
    // struck everywhere; the per-doc unique segments survive. Doc 4 is
    // ALL boilerplate → n_kept=0 and a null fingerprint.
    val docs = Seq(
      (1L, "x y a b"), (2L, "x y c d"), (3L, "e f x y"), (4L, "x y x y"))
      .toDF("doc_id", "text")
    val got = Text.lineDedup(docs, width = 2, maxDocs = 2)
      .select("doc_id", "n_segs", "n_kept", "clean_fp")
      .as[(Long, Long, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, Some(md5hex("a b"))),
      (2L, 2L, 1L, Some(md5hex("c d"))),
      (3L, 2L, 1L, Some(md5hex("e f"))),
      (4L, 2L, 0L, None)))
    // survivors keep document order: a doc with two kept segments joins
    // them idx-ascending regardless of shuffle order
    val multi = Seq((1L, "a b c d e f"), (2L, "hot hot")).toDF("doc_id", "text")
    val kept = Text.lineDedup(multi.repartition(5), width = 2, maxDocs = 1)
      .filter(col("doc_id") === 1L).select("clean_fp").as[String].head()
    assert(kept === md5hex("a b c d e f"))
  }

  test("chunking: overlapping windows cover the token stream with short tails") {
    val docs = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val got = Text.chunk(docs, window = 3, stride = 2)
      .select("chunk_idx", "n_chunk_tokens", "chunk_fp")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === Seq(
      (0L, 3L, md5hex("a b c")),
      (1L, 3L, md5hex("c d e")),
      (2L, 1L, md5hex("e"))))
  }

  test("mix apply: two-phase ranking equals the single-window mixture, per-lang sizes honor the allocation") {
    import graft.operators.Mixing
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, TestSpark.sf)
    val alloc = Mixing.temperatureWeights(docs, budget = 200L)
      .select(col("lang"), col("n_sample"), col("n_docs"))
    val naive = docs.select(col("lang"), col("doc_id"))
      .withColumn("skey", md5(concat(lit("mix:"), col("doc_id").cast("string"))))
      .join(broadcast(alloc.select("lang", "n_sample")), "lang")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))).cast("long"))
      .filter(col("rn") <= col("n_sample"))
      .select(col("lang"), col("rn"), col("doc_id"), col("n_sample"))
      .orderBy(col("lang"), col("rn")).collect().toSeq
    for (b <- Seq(1, 4, 16)) {
      val twoPhase = Mixing.mixApply(docs, budget = 200L, subBuckets = b)
        .orderBy(col("lang"), col("rn")).collect().toSeq
      assert(twoPhase === naive, s"subBuckets=$b")
    }
    // every language contributes exactly min(n_sample, n_docs) documents
    val sizes = Mixing.mixApply(docs, budget = 200L)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .join(alloc, "lang")
      .select(col("lang"), col("n"), least(col("n_sample"), col("n_docs")).as("want"))
      .as[(String, Long, Long)].collect()
    assert(sizes.nonEmpty && sizes.forall(s => s._2 == s._3), sizes.mkString(","))
  }

  test("line dedup survives a boilerplate flood: one hot segment across 400 docs") {
    // the hot-key case the groupBy+join discipline exists for: one segment
    // shared by 400 documents (df=400) must be struck from all of them
    // without funneling the flood into one task or exploding the join
    val docs = ((1L to 400L).map(i => (i, s"hot seg one two $i")) ++
      Seq((900L, "calm unique text here")))
      .toDF("doc_id", "text")
    val got = Text.lineDedup(docs, width = 2, maxDocs = 2).collect()
    assert(got.length === 401)
    val flood = got.filter(_.getLong(0) <= 400)
    // every flood doc: 3 segments ("hot seg", "one two", "<i>"), the two
    // shared ones struck, the unique id-segment kept
    assert(flood.forall(r => r.getLong(1) === 3L && r.getLong(2) === 1L))
    val calm = got.find(_.getLong(0) == 900L).get
    assert(calm.getLong(2) === 2L) // untouched
    // and the plan keeps the skew discipline: no per-segment window
    val plan = Text.lineDedup(docs, 2, 2).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan)
  }

  test("bigram familiarity survives a flooded bigram: pre-agg bounds the frequency join") {
    // one bigram repeated 3× inside each of 400 docs (hot-key flood): the
    // per-(doc, bigram) pre-aggregation must carry ONE row per doc into the
    // frequency join, and the score must still be exact
    val docs = ((1L to 400L).map(i => (i, s"hot hot hot hot x$i")) ++
      Seq((900L, "calm unique text here")))
      .toDF("doc_id", "text")
    val got = Text.bigramFamiliarity(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // flood doc: bigrams = (hot,hot)×3 + (hot,xi)×1; freq(hot,hot)=1200
    assert((1L to 400L).forall(i => got(i) == ((4L, 3L * 1200L + 1L))))
    assert(got(900L) == ((3L, 3L))) // all three bigrams unique
    // plan discipline: both inputs of the frequency join are aggregates
    // (occurrences never meet the join), and no hot-key Window anywhere
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = Text.bigramFamiliarity(docs).queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.nonEmpty)
    assert(joins.forall(_.children.forall(
      c => c.collectFirst { case a: Aggregate => a }.isDefined)),
      lp.toString)
    assert(!lp.toString.contains("Window"), lp.toString)
  }

  test("corpus shuffle: every doc exactly once, deterministic under repartition, seed changes order") {
    import graft.operators.Curation
    val docs = Tables.documents(spark, TestSpark.sf)
    val a = Curation.corpusShuffle(docs, shards = 8).orderBy("shard", "pos").collect().toSeq
    val b = Curation.corpusShuffle(docs.repartition(13), shards = 8)
      .orderBy("shard", "pos").collect().toSeq
    assert(a === b) // placement depends only on (seed, doc_id)
    // a permutation: every doc exactly once, positions dense 1..n per shard
    assert(a.map(_.getLong(2)).distinct.size === a.size)
    assert(a.size === docs.count())
    a.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.size).toSeq)
    }
    // a different seed is a different permutation
    val c = Curation.corpusShuffle(docs, shards = 8, seed = "other")
      .orderBy("shard", "pos").collect().toSeq
    assert(c.map(_.getLong(2)) !== a.map(_.getLong(2)))
  }

  test("weighted sample: deterministic coin, full-weight docs always kept") {
    import graft.operators.Curation
    val docs = Tables.documents(spark, TestSpark.sf)
    val a = Curation.weightedSample(docs).orderBy("doc_id").collect().toSeq
    val b = Curation.weightedSample(docs.repartition(13)).orderBy("doc_id").collect().toSeq
    assert(a === b) // the coin depends only on doc_id, not row placement
    assert(a.nonEmpty && a.size < docs.count()) // a real sample, not a pass-through
    // weight min(1, n/100): every ≥100-token doc clears any possible coin
    val longDocs = docs.filter(size(split(col("text"), " ")) >= 100)
      .select("doc_id").as[Long].collect().toSet
    val kept = a.map(_.getLong(0)).toSet
    assert(longDocs.subsetOf(kept))
  }

  test("corpus encoding: ids follow frequency rank, arrays keep token order") {
    // corpus: "b" appears 3x (id 1), "a" 2x (id 2), "c" 1x (id 3)
    val sfDir = java.nio.file.Files.createTempDirectory("enc").toString
    Seq((1L, "a b c"), (2L, "b a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$sfDir/documents.parquet")
    val got = Text.x4kEncodeIds(spark, sfDir)
      .select("doc_id", "n_tokens", "ids")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 3L, "2,1,3"),
      (2L, 3L, "1,2,1")))
  }

  test("semantic dedup drops lower-priority near-identical vectors within a cluster only") {
    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    val e = Seq(
      (1L, "A", unit(0)),  // kept: lowest id of the A-cluster duplicate set
      (2L, "A", unit(0)),  // dropped: identical to 1 in the same cluster
      (3L, "B", unit(0)),  // kept: identical content but DIFFERENT cluster
      (4L, "A", unit(7)),  // kept: same cluster, orthogonal
      (5L, "A", unit(0)))  // dropped: identical to 1 (and 2)
      .toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    for (b <- Seq(1, 2, 4)) {
      val kept = Vectors.semanticDedup(e, tau = 0.9, numBlocks = b)
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(kept === Seq(1L, 3L, 4L), s"numBlocks=$b")
    }
  }

  test("contamination fraction: full copies gate dirty, incidental overlap stays clean, short docs score 0") {
    // bench doc 1; training docs: 10 = verbatim copy (frac 1), 11 = one
    // shared 5-gram in a long doc (frac < 0.5 → clean under the severity
    // rule though x7e's any-hit would flag it), 12 = disjoint, 13 = too
    // short for any shingle
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, bench),
      (10L, bench),
      (11L, "alpha beta gamma delta epsilon x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"),
      (12L, "k1 k2 k3 k4 k5 k6 k7 k8"),
      (13L, "too short")).toDF("doc_id", "text")
    val out = Text.contaminationFraction(docs, Text.shingles(docs), benchMax = 5L)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_hits", "dirty")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (10L, 4L, 4L, true),   // 8 tokens → 4 shingles, all in bench
      (11L, 13L, 1L, false), // 17 tokens → 13 shingles, 1 shared
      (12L, 4L, 0L, false),
      (13L, 0L, 0L, false)))
  }

  test("filtered ANN: neighbors respect the label predicate; exact form matches a sequential reference") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val rows = e.select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val got = Vectors.x3mFilteredAnn(spark, TestSpark.sf)
      .select("q_id", "rank", "vec_id").as[(Long, Int, Long)].collect()
    assert(got.nonEmpty)
    // every hit shares its query's label
    assert(got.forall { case (q, _, v) => byId(q)._2 === byId(v)._2 })
    // sequential reference: per query, top-3 among same-label rows
    val expected = rows.filter(_._1 < 10).flatMap { case (q, lbl, qe) =>
      rows.filter(r => r._2 == lbl && r._1 != q)
        .map(r => (r._1, dot(qe, r._3)))
        .sortBy { case (id, s) => (-s, id) }.take(3)
        .zipWithIndex.map { case ((v, _), i) => (q, i + 1, v) }
    }.toSet
    assert(got.toSet === expected)
    // the filtered-IVF scale path honors the same predicate and keeps
    // the recall floor its oracle twin commits to
    val ivf = Vectors.ivfSearchFiltered(
      e.filter(col("vec_id") < 10), e, Seq("label"), k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(ivf.forall { case (q, v) => byId(q)._2 === byId(v)._2 })
    val ok = Vectors.x3nFilteredIvf(spark, TestSpark.sf).collect()
    assert(ok.nonEmpty && ok.forall(_.getBoolean(1)), "recall bound failed")
  }

  test("max-sim doc retrieval: chunk-max scoring matches a sequential reference, own doc excluded") {
    val rows = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val expected = rows.filter(_._1 < 10).flatMap { case (qid, qe) =>
      rows.filter(r => r._1 != qid && r._1 / 8 != qid / 8)
        .groupBy(_._1 / 8).view
        .mapValues(ms => ms.map(r => dot(qe, r._2)).max).toSeq
        .sortBy { case (d, s) => (-s, d) }.take(3)
        .zipWithIndex.map { case ((d, _), i) => (qid, i + 1, d) }
    }.toSet
    val got = Vectors.x3oMaxsimDocs(spark, TestSpark.sf)
      .select("q_id", "rank", "doc_id").as[(Long, Int, Long)].collect().toSet
    assert(got === expected && got.nonEmpty)
  }

  test("x3g int8 quantization: every vector reconstructs within half a step") {
    val out = Vectors.x3gQuantize(spark, TestSpark.sf).collect()
    assert(out.length === Tables.embeddings(spark, TestSpark.sf).count())
    assert(out.forall(_.getBoolean(2)), "a vector exceeded the half-step bound")
    // codes live in 0..255 ⇒ a 64-dim code sum is bounded by 64·255
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 64L * 255))
  }

  test("x3i k-means step matches a sequential Lloyd reference; ties break low-id") {
    // 2-D corpus, k=2: centroids are vecs 0 (x-axis) and 1 (y-axis).
    // vec 4 is EXACTLY equidistant (sim 0.6 to both) -> must go to c_id 0.
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)),  // -> 0
      (3L, Array(0.2f, 0.8f)),  // -> 1
      (4L, Array(0.6f, 0.6f)),  // tie -> 0
      (5L, Array(0.7f, 0.3f)))  // -> 0
      .toDF("vec_id", "embedding")
    // sequential reference with the same fixed-point discipline
    val members = Map(0L -> Seq(Array(1.0f, 0.0f), Array(0.9f, 0.1f),
        Array(0.6f, 0.6f), Array(0.7f, 0.3f)),
      1L -> Seq(Array(0.0f, 1.0f), Array(0.2f, 0.8f)))
    val expected = (for {
      (cid, vs) <- members.toSeq; pos <- 1 to 2
      qsum = vs.map(v => math.floor(v(pos - 1).toDouble * 1e6).toLong).sum
    } yield (cid, pos.toLong, vs.size.toLong, qsum,
      qsum.toDouble / vs.size / 1e6)).sorted
    for (parts <- Seq(1, 7)) {
      val got = Vectors.kmeansRefine(corpus.repartition(parts), k = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).sorted.toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("x3p residual PQ: finer reconstruction than raw PQ on clustered data; codes stay in range") {
    // 4 well-separated unit clusters in 64-d: block centers + small jitter.
    // Raw codebooks must span the BETWEEN-cluster layout with the same 16
    // entries the residual books spend entirely on within-cluster spread.
    val rnd = new scala.util.Random(7)
    val pts = for (c <- 0 until 4; i <- 0 until 60) yield {
      val raw = Array.tabulate(64) { d =>
        val base = if (d / 16 == c) 0.25f else 0.0f
        base + (rnd.nextFloat() - 0.5f) * 0.1f
      }
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      ((c * 60 + i).toLong, raw.map(_ / n))
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val coarse = Vectors.kmeansCentroids(corpus, 4, 3)
    val rawBooks = Vectors.pqCodebooks(corpus, 8, 16, 3)
    val resBooks = Vectors.pqCodebooksResidual(corpus, coarse, 8, 16, 3)
    val rawErr = Vectors.pqReconstructionError(corpus, rawBooks)
      .agg(avg(col("recon_err"))).head.getDouble(0)
    val resErr = Vectors.pqReconstructionErrorResidual(corpus, coarse, resBooks)
      .agg(avg(col("recon_err"))).head.getDouble(0)
    assert(resErr < rawErr,
      s"residual mean recon err $resErr should beat raw $rawErr on clustered data")
    // stored-index row invariants: m codes, each a valid codebook id
    val enc = Vectors.encodeForIndexResidual(corpus, coarse, resBooks)
    assert(enc.filter(size(col("codes")) =!= 8).count() === 0)
    assert(enc.filter(exists(col("codes"),
      c => c < 0 || c >= 16)).count() === 0)
    // served result: residual search finds the planted nearest neighbor
    // (each vector's own cluster-mates dominate) for every probe
    val q = corpus.filter(col("vec_id") % 60 === 0)
    val got = Vectors.pqSearchIndexResidual(q, enc, coarse, resBooks,
        k = 5, nprobe = 2, shortlist = 50)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("vec_id")).collect()
    got.foreach { r =>
      assert(r.getLong(0) / 60 === r.getLong(1) / 60,
        s"top hit for ${r.getLong(0)} left its cluster: ${r.getLong(1)}")
    }
  }

  test("containment pairs catch a quoted document that symmetric Jaccard misses; contained side named") {
    // doc 1: a short article. doc 2: a much larger host page embedding the
    // article verbatim. doc 3: unrelated. Jaccard(1,2) = 6/56 — far below
    // any near-dup threshold — while containment(1 in 2) = 6/6.
    val article = (1 to 10).map(i => s"w$i").mkString(" ")
    val host = ((1 to 10).map(i => s"w$i") ++ (11 to 60).map(i => s"z$i"))
      .mkString(" ")
    val unrelated = (100 to 130).map(i => s"q$i").mkString(" ")
    val docs = Seq((1L, article), (2L, host), (3L, unrelated))
      .toDF("doc_id", "text")
    val sh = Text.shingles(docs)
    assert(Text.jaccardPairs(sh).count() === 0,
      "symmetric Jaccard should NOT fire on the quote-embedding pair")
    val cont = Text.containmentPairs(sh).collect()
    assert(cont.length === 1)
    val r = cont(0)
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getLong(2) === 6L)                      // all of the article's shingles
    assert(r.getAs[Long]("contained") === 1L)        // the article is the duplicate
  }

  test("MMR re-rank: a near-duplicate of pick 1 is demoted; selection matches a sequential greedy reference") {
    // hand case: candidates 10 (rel .9) and 11 (rel .89) are near-identical
    // (sim .99); candidate 12 (rel .5) is orthogonal to both. Plain top-2
    // keeps (10, 11); MMR's second pick must skip 11 for 12:
    // score(11) = .445 − .495 < 0 < score(12) = .25 − 0.
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.89), (1L, 12L, 0.5))
      .toDF("q_id", "vec_id", "rel")
    val pairs = Seq(
      (1L, 10L, 11L, 0.99), (1L, 11L, 10L, 0.99),
      (1L, 10L, 12L, 0.0), (1L, 12L, 10L, 0.0),
      (1L, 11L, 12L, 0.0), (1L, 12L, 11L, 0.0))
      .toDF("q_id", "a", "b", "sim")
    val got = Vectors.mmrSelect(cand, pairs, 3)
      .orderBy("pick").select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(10L, 12L, 11L))

    // property: distributed greedy ≡ sequential reference on random sims,
    // two query groups advancing in parallel
    val rnd = new scala.util.Random(11)
    val qids = Seq(1L, 2L)
    val candR = qids.flatMap(q => (0 until 8).map(i =>
      (q, q * 100 + i, rnd.nextInt(1000) / 1000.0)))
    val pairR = qids.flatMap { q =>
      val ids = (0 until 8).map(q * 100 + _)
      for (a <- ids; b <- ids if a != b && a < b; s = rnd.nextInt(1000) / 1000.0;
           p <- Seq((q, a, b, s), (q, b, a, s))) yield p
    }
    def seqRef(q: Long, k: Int): Seq[Long] = {
      val rel = candR.filter(_._1 == q).map(c => c._2 -> c._3).toMap
      val sim = pairR.filter(_._1 == q).map(p => (p._2, p._3) -> p._4).toMap
      var sel = Vector.empty[Long]
      for (_ <- 1 to k) {
        val rest = rel.keys.filterNot(sel.contains).toSeq
        val best = rest.minBy { d =>
          val ms = if (sel.isEmpty) 0.0 else sel.map(s => sim((d, s))).max
          (-(0.5 * rel(d) - 0.5 * ms), d)
        }
        sel :+= best
      }
      sel
    }
    val gotR = Vectors.mmrSelect(
        candR.toDF("q_id", "vec_id", "rel"), pairR.toDF("q_id", "a", "b", "sim"), 5)
      .orderBy("q_id", "pick")
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSeq
    val want = qids.flatMap(q => seqRef(q, 5).map(q -> _))
    assert(gotR === want)
  }

  test("x4w phrase match: overlapping and repeated-term occurrences count exactly, non-matches excluded, term order is load-bearing") {
    import graft.operators.Text
    val docs = Seq(
      (1L, "a b a b a"),      // "a b a" anchors at 0 and 2 (overlap)
      (2L, "a b c a b a x"),  // one occurrence at 3
      (3L, "b a a b b a"),    // scrambled tokens, no "a b a" run
      (4L, "a a a"),          // repeated gate term, still no match
      (5L, "x y z"))          // no phrase terms at all
      .toDF("doc_id", "text")
    val got = Text.phraseMatch(docs, Seq("a", "b", "a"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
    // a bigram phrase distinguishes order: "b a" matches where "a b" doesn't
    assert(Text.phraseMatch(docs, Seq("b", "b"))
      .as[(Long, Long)].collect().toMap === Map(3L -> 1L))
    // single-term phrase degenerates to per-doc term counts
    assert(Text.phraseMatch(docs, Seq("c"))
      .as[(Long, Long)].collect().toMap === Map(2L -> 1L))
  }

  test("t-closeness: a class mirroring the global source mix passes; a one-source class is flagged; distance matches a rational reference") {
    import graft.operators.Scrub
    // global mix: sources A and B, 10 docs each. Class en/bucket-0 mirrors
    // it exactly (TV = 0); class de/bucket-1 is all-A (TV = 1/2 > 1/4).
    val docs = ((1 to 5).map(i => (s"e$i", "en", 10L, "A")) ++
      (1 to 5).map(i => (s"f$i", "en", 10L, "B")) ++
      (1 to 5).map(i => (s"g$i", "de", 60L, "A")) ++
      (1 to 5).map(i => (s"h$i", "xx", 60L, "B")))
      .toDF("doc_id", "lang", "n_chars", "source")
    val got = Scrub.tClosenessAudit(docs)
      .select("lang", "len_bucket", "n", "dist_num", "at_risk")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    // N_g = 20, global {A:10, B:10}. en (N_c=10, {A:5,B:5}):
    // |5*20-10*10| = 0 per source → dist_num 0 → TV 0, pass.
    // de (N_c=5, all A): present |5*20-10*5| = 50, absent-B tail
    // (20-10)*5 = 50 → dist_num 100 → TV = 100/(2*5*20) = 1/2 > 1/4
    // → at risk; xx symmetric.
    assert(got === Seq(
      ("de", 1L, 5L, 100L, true),
      ("en", 0L, 10L, 0L, false),
      ("xx", 1L, 5L, 100L, true)))
  }
}
