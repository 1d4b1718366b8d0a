package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.{Relational, Text}

/** Property-based invariants for the text-pipeline and analytics
  * composites: each distributed formulation must equal a pure-Scala
  * sequential reference on arbitrary inputs.
  */
object TextPropertySpec extends Properties("TextOps") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = TestSpark.spark

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // small vocabulary so segments collide across documents
  val genDoc: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
  val genCorpus: Gen[List[String]] = Gen.choose(1, 10)
    .flatMap(n => Gen.listOfN(n, genDoc))

  /** Sequential reference for [[Text.lineDedup]]. */
  def lineDedupRef(texts: List[String], width: Int, maxDocs: Int)
      : Map[Long, (Long, Long, Option[String])] = {
    def segs(t: String): List[String] =
      t.split(" ").grouped(width).map(_.mkString(" ")).toList
    val df = texts.zipWithIndex
      .flatMap { case (t, id) => segs(t).distinct.map(_ -> id.toLong) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    texts.zipWithIndex.map { case (t, id) =>
      val all = segs(t)
      val kept = all.filter(s => df(s) <= maxDocs)
      id.toLong -> (all.size.toLong, kept.size.toLong,
        if (kept.isEmpty) None else Some(md5hex(kept.mkString(" "))))
    }.toMap
  }

  property("line dedup == sequential per-document reference on random corpora") =
    forAll(genCorpus, Gen.choose(1, 3), Gen.choose(1, 3)) { (texts, width, maxDocs) =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val got = Text.lineDedup(docs, width, maxDocs).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
      val want = lineDedupRef(texts, width, maxDocs)
      Prop(got == want) :| s"got=$got want=$want (width=$width maxDocs=$maxDocs)"
    }

  /** Sequential reference for [[Text.duplicateSpans]]: count every n-gram
    * globally (with multiplicity), mark covered token positions, merge
    * consecutive runs.
    */
  def spansRef(texts: List[String], n: Int): Set[(Long, Long, Long, Long)] = {
    val toks = texts.map(_.split(" ").toList)
    val gramCount = toks.flatMap(t =>
      (0 to t.size - n).map(i => t.slice(i, i + n).mkString(" ")))
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    toks.zipWithIndex.flatMap { case (t, id) =>
      val covered = (for {
        i <- 0 to t.size - n
        if gramCount(t.slice(i, i + n).mkString(" ")) >= 2
        p <- i until i + n
      } yield p).toSet.toList.sorted
      covered.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) =>
        (id.toLong, s.toLong, e.toLong, (e - s + 1).toLong) }
    }.toSet
  }

  property("duplicate spans == sequential reference on random corpora") =
    forAll(genCorpus, Gen.choose(2, 3)) { (texts, n) =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val got = Text.duplicateSpans(docs, n).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = spansRef(texts, n)
      Prop(got == want) :| s"got=$got want=$want (n=$n)"
    }

  /** Sequential reference for [[Text.spanDedupApply]] built on
    * [[spansRef]]: strike covered positions, reassemble in order.
    */
  def applyRef(texts: List[String], n: Int): Map[Long, (Long, Long, Option[String])] = {
    val byDoc = spansRef(texts, n).groupBy(_._1)
    texts.zipWithIndex.map { case (t, id) =>
      val toks = t.split(" ").toVector
      val covered = byDoc.getOrElse(id.toLong, Set.empty)
        .flatMap { case (_, s, e, _) => s to e }
      val kept = toks.indices.filterNot(p => covered(p.toLong)).map(toks)
      id.toLong -> ((kept.size.toLong, covered.size.toLong,
        if (kept.isEmpty) None else Some(md5hex(kept.mkString(" ")))))
    }.toMap
  }

  property("span-dedup apply == sequential reference on random corpora") =
    forAll(genCorpus, Gen.choose(2, 3)) { (texts, n) =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val got = Text.spanDedupApply(docs, Text.duplicateSpans(docs, n)).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
      val want = applyRef(texts, n)
      Prop(got == want) :| s"got=$got want=$want (n=$n)"
    }

  /** Sequential reference for [[Text.dsirSelect]], mirroring the
    * fixed-point quantization exactly (BigDecimal HALF_UP = Spark round).
    */
  def dsirRef(texts: List[String], targetMax: Long): Map[Long, (Long, Long, Boolean)] = {
    def bgs(t: String): List[String] = {
      val w = t.split(" ").toList
      if (w.size < 2) Nil else w.zip(w.tail).map { case (a, b) => s"$a $b" }
    }
    val perDoc = texts.zipWithIndex.map { case (t, id) =>
      id.toLong -> bgs(t).groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    }.toMap
    def side(p: Long => Boolean): Map[String, Long] =
      perDoc.filter(kv => p(kv._1)).values
        .flatten.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
    val ct = side(_ < targetMax); val cs = side(_ >= targetMax)
    val vocab = ct.keySet ++ cs.keySet
    val (nt, ns, v) = (ct.values.sum, cs.values.sum, vocab.size.toLong)
    def q(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val dqf = vocab.map { g =>
      g -> q(1e6 * (math.log(ct.getOrElse(g, 0L) + 1d) - math.log(nt + v.toDouble)
        - math.log(cs.getOrElse(g, 0L) + 1d) + math.log(ns + v.toDouble)))
    }.toMap
    perDoc.collect { case (id, fs) if id >= targetMax && fs.nonEmpty =>
      val nFeats = fs.values.sum
      val logw = fs.map { case (g, c) => c * dqf(g) }.sum
      id -> ((nFeats, logw, logw > 0))
    }
  }

  property("DSIR selection == exact integer reference on random corpora") =
    forAll(genCorpus, Gen.choose(1, 5)) { (texts, cut) =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val got = Text.dsirSelect(docs, cut.toLong).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      val want = dsirRef(texts, cut.toLong)
      Prop(got == want) :| s"got=$got want=$want (cut=$cut)"
    }

  val stages = Seq("s1", "s2", "s3")
  val genEvents: Gen[List[(Long, String, Long)]] = Gen.choose(0, 30).flatMap(n =>
    Gen.listOfN(n, Gen.zip(
      Gen.choose(1L, 5L),
      Gen.oneOf("s1", "s2", "s3", "noise"),
      Gen.choose(0L, 50L))))

  /** Sequential reference for [[Relational.funnel]]: for each user, stage
    * i's time is the earliest event of that type at-or-after stage i-1's.
    */
  def funnelRef(events: List[(Long, String, Long)])
      : Map[Long, (List[Option[Long]], Int)] =
    events.groupBy(_._1).map { case (u, es) =>
      val ts = stages.foldLeft(List.empty[Option[Long]]) { (acc, st) =>
        val floor = acc.lastOption.getOrElse(Some(Long.MinValue))
        val t = floor.flatMap(f =>
          es.collect { case (_, `st`, t) if t >= f => t }.minOption)
        acc :+ t
      }
      u -> (ts, ts.lastIndexWhere(_.isDefined) + 1)
    }

  property("funnel == sequential per-user reference on random event streams") =
    forAll(genEvents) { events =>
      import spark.implicits._
      if (events.isEmpty) Prop.passed
      else {
        val df = events.toDF("user_id", "event_type", "ts_ms")
        val got = Relational.funnel(df, stages).collect()
          .map(r => r.getLong(0) -> (List(1, 2, 3).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))), r.getInt(4))).toMap
        val want = funnelRef(events)
        Prop(got == want) :| s"got=$got want=$want"
      }
    }

  property("funnel stages are monotone: reaching stage k implies reaching k-1") =
    forAll(genEvents) { events =>
      import spark.implicits._
      if (events.isEmpty) Prop.passed
      else {
        val rows = Relational.funnel(events.toDF("user_id", "event_type", "ts_ms"),
          stages).collect()
        Prop(rows.forall { r =>
          val ts = List(1, 2, 3).map(!r.isNullAt(_))
          ts.zip(ts.tail).forall { case (lo, hi) => lo || !hi }
        }) :| rows.mkString(";")
      }
    }

  // ---------------------------------------------------------- X4n BPE
  val genBpeWord: Gen[String] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
  val genBpeCorpus: Gen[List[String]] = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.choose(1, 8).flatMap(m =>
      Gen.listOfN(m, genBpeWord).map(_.mkString(" ")))))


  /** Left-to-right non-overlapping application of one merge rule. */
  def bpeApplyMerge(toks: List[String], l: String, r: String): List[String] = {
    val b = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += toks(i); i += 1 }
    }
    b.toList
  }

  /** Sequential Sennrich BPE over the word-count dictionary: count
    * adjacent symbol pairs weighted by word count, take the (count desc,
    * pair asc) argmax, merge left-to-right non-overlapping, repeat.
    */
  def bpeRef(texts: List[String], n: Int)
      : List[(Int, String, String, String, Long)] = {
    var dict: Map[List[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity)
      .map { case (w, xs) => w.map(_.toString).toList -> xs.size.toLong }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    var k = 1
    var done = false
    while (k <= n && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (toks, c) =>
        toks.zip(toks.drop(1)).foreach(p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), pc) = pairs.toList
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((k, l, r, l + r, pc))
        dict = dict.toList
          .map { case (toks, c) => bpeApplyMerge(toks, l, r) -> c }
          .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
        k += 1
      }
    }
    out.toList
  }

  property("BPE merge training == sequential Sennrich reference on random corpora") =
    forAll(genBpeCorpus, Gen.choose(1, 5)) { (texts, n) =>
      val sp = spark
      import sp.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Text.bpeMerges(sp, docs, n).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList
      got == bpeRef(texts, n)
    }

  property("BPE encode == sequential merge application on random corpora") =
    forAll(genBpeCorpus, Gen.choose(1, 5)) { (texts, n) =>
      val sp = spark
      import sp.implicits._
      val merges = bpeRef(texts, n).map(m => (m._2, m._3))
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Text.bpeEncode(docs, merges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = texts.zipWithIndex.map { case (t, i) =>
        val total = t.split(" ").filter(_.nonEmpty).toSeq.map { w =>
          var cur = w.map(_.toString).toList
          merges.foreach { case (l, r) => cur = bpeApplyMerge(cur, l, r) }
          cur.length.toLong
        }.sum
        i.toLong -> total
      }.toMap
      got == ref
    }
}
