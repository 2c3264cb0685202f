package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.Mixture

/** Mixture sampling: the two-phase bucket plan must be row-identical to
  * the naive single-window formulation (which IS the declared semantics
  * and the shape the DuckDB oracle states), across random corpora,
  * budgets, and bucket counts — including 0-token docs, budget 0, and
  * budgets exceeding a source's total.
  */
object MixturePropSpec extends Properties("Mixture") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val genDoc = for {
    id <- Gen.choose(0L, 100000L)
    src <- Gen.oneOf("a", "b", "c", "d")
    toks <- Gen.frequency(9 -> Gen.choose(0L, 200L), 1 -> Gen.const(0L))
  } yield (id, src, toks)

  private val genCorpus =
    Gen.chooseNum(1, 120).flatMap(n => Gen.listOfN(n, genDoc))
      // Priority ties are fine (ordering falls back to id) but duplicate
      // IDS are not part of the contract — dedupe.
      .map(_.groupBy(_._1).map(_._2.head).toList)

  private val genBudgets = Gen.listOfN(4, Gen.choose(0L, 2000L))
    .map(bs => List("a", "b", "c", "d").zip(bs))

  property("two-phase bucket plan == naive window plan") =
    Prop.forAllNoShrink(genCorpus, genBudgets,
      Gen.oneOf(1, 2, 16, 256, 65536)) { (rows, budgetRows, buckets) =>
      val s = spark
      import s.implicits._
      val docs = rows.toDF("doc_id", "source", "toks")
      val budgets = budgetRows.toDF("source", "budget")
      val fast = Mixture.sampleByTokenBudget(docs, "doc_id", "toks", "source", budgets, buckets)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val slow = Mixture.sampleByTokenBudgetNaive(docs, "doc_id", "toks", "source", budgets)
        .select("doc_id").as[Long].collect().sorted.toSeq
      fast == slow
    }

  property("tokenShards == naive global-window assignment") =
    Prop.forAllNoShrink(genCorpus, Gen.oneOf(1, 3, 8),
      Gen.oneOf(1, 2, 256, 65536)) { (rows, shards, buckets) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val docs = rows.toDF("doc_id", "source", "toks")
      val fast = Mixture.tokenShards(docs, "doc_id", "toks", shards, buckets)
        .select("doc_id", "shard_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val total = rows.map(_._3).sum
      val target = math.max(1L, (total + shards - 1) / shards)
      val slow = docs
        .withColumn("prior", coalesce(
          sum(col("toks")).over(Window.orderBy(Mixture.priority(col("doc_id")), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("shard_id",
          least(expr(s"prior div $target"), lit(shards - 1L)).cast("int"))
        .select("doc_id", "shard_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      fast == slow
    }

  property("curriculumShards == naive quality-ordered window assignment") =
    Prop.forAllNoShrink(genCorpus, Gen.oneOf(1, 2, 4),
      Gen.oneOf(1, 2, 256, 65536)) { (rows, shards, buckets) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      // Quality derived deterministically from the id; include values
      // at and just past 1.0 (the float-sum overshoot case).
      val docs = rows.toDF("doc_id", "source", "toks")
        .withColumn("q",
          when(col("doc_id") % 17 === 0, lit(1.0000000000000002))
            .otherwise(pmod(col("doc_id"), lit(97)).cast("double") / 97d))
      val fast = Mixture.curriculumShards(docs, "doc_id", "toks", "q", shards, buckets)
        .select("doc_id", "shard_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val total = rows.map(_._3).sum
      val target = math.max(1L, (total + shards - 1) / shards)
      val key = least(greatest(
        floor((lit(1d) - col("q")) * lit(1048576d)).cast("long"), lit(0L)),
        lit(1048575L))
      val slow = docs
        .withColumn("prior", coalesce(
          sum(col("toks")).over(Window.orderBy(key, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("shard_id",
          least(expr(s"prior div $target"), lit(shards - 1L)).cast("int"))
        .select("doc_id", "shard_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      Prop(fast == slow) :| s"shards=$shards buckets=$buckets"
    }

  property("clusterBalancedSample == brute per-cluster priority cut") =
    Prop.forAllNoShrink(genCorpus, Gen.oneOf(1, 2, 5)) { (rows, perCell) =>
      val s = spark
      import s.implicits._
      // Reuse the corpus gen's source column as the cluster key.
      val docs = rows.toDF("doc_id", "cluster", "toks")
      def prio(id: Long): Long =
        ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong
      val ref = rows.groupBy(_._2).toSeq.flatMap { case (cl, rs) =>
        rs.sortBy(r => (prio(r._1), r._1)).take(perCell)
          .zipWithIndex.map { case (r, i) => (r._1, cl, i + 1) }
      }.sorted
      val got = Mixture.clusterBalancedSample(docs, "doc_id", "cluster", perCell)
        .select("doc_id", "cluster", "pick_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
      Prop(got == ref) :| s"perCell=$perCell got=$got ref=$ref"
    }
  // Shares are multiples of 0.05 summing to 1 — exact SHORT decimals, so
  // the independent rational reference (percent / 100 integer math)
  // states the documented floors without float ambiguity.
  private val genRebalance: Gen[(Seq[(Long, String)], Seq[(String, Int)])] = for {
    k <- Gen.chooseNum(2, 4)
    cuts <- Gen.listOfN(k - 1, Gen.chooseNum(1, 19)).map(_.map(_ * 5))
    counts <- Gen.listOfN(k, Gen.chooseNum(0, 40))
    stray <- Gen.chooseNum(0, 5)
  } yield {
    val bounds = (0 +: cuts.sorted :+ 100).distinct
    // Percentages from consecutive distinct bounds; may collapse — pad.
    val pcts0 = bounds.sliding(2).map(p => p(1) - p(0)).filter(_ > 0).toSeq
    val pcts = if (pcts0.size >= 2) pcts0 else Seq(50, 50)
    val doms = pcts.indices.map(i => s"d$i")
    val rows = Seq.newBuilder[(Long, String)]
    var id = 0L
    doms.zip(counts).foreach { case (d, c) =>
      (0 until c).foreach { _ => rows += ((id, d)); id += 7 } // gappy ids
    }
    (0 until stray).foreach { _ => rows += ((id, "stray")); id += 7 }
    (rows.result(), doms.zip(pcts))
  }

  property("rebalanceToTarget == rational floors; picks are hash-first") =
    Prop.forAllNoShrink(genRebalance) { case (rows, domPcts) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("doc_id", "domain")
      val target = domPcts.map { case (d, p) => d -> p / 100d }.toMap
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // Rational reference: N = min ⌊100·count_d / pct_d⌋, need_d =
      // min(⌊pct_d·N / 100⌋, count_d) — exact integer arithmetic.
      val feasible = domPcts.map { case (d, p) =>
        counts.getOrElse(d, 0L) * 100L / p }.min
      val needs = domPcts.map { case (d, p) =>
        d -> math.min(p * feasible / 100L, counts.getOrElse(d, 0L)) }.toMap
      val got = Mixture.rebalanceToTarget(df, "doc_id", "domain", target)
        .select("doc_id", "domain").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val gotCounts = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def prio(idv: Long): Long =
        ((BigInt(idv) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong
      val expectedIds = domPcts.flatMap { case (d, _) =>
        rows.filter(_._2 == d).map(_._1)
          .sortBy(idv => (prio(idv), idv)).take(needs(d).toInt)
      }.toSet
      Prop(domPcts.forall { case (d, _) =>
        gotCounts.getOrElse(d, 0L) == needs(d) } &&
        got.map(_._1).toSet == expectedIds) :|
        s"needs=$needs gotCounts=$gotCounts"
    }
}

class MixtureSpec extends SparkSpec {

  test("tokenShardsOrdered: contract-violating order keys fail loudly, never drop rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, 5L), (2L, 7L)).toDF("doc_id", "toks")
    // Out-of-space key (negative) and an undefined (null) key must both
    // surface as errors — pre-guard they vanished through the bucket
    // join as silent data loss.
    val bad = intercept[Exception](
      Mixture.tokenShardsOrdered(docs, "doc_id", "toks",
        col("doc_id") - 10L, 1L << 20, 2).collect())
    assert(bad.getMessage.contains("order key outside") ||
      Option(bad.getCause).exists(_.getMessage.contains("order key outside")))
    val nullKey = intercept[Exception](
      Mixture.tokenShardsOrdered(docs, "doc_id", "toks",
        when(col("doc_id") === 1L, lit(null)).otherwise(lit(0L)).cast("long"),
        1L << 20, 2).collect())
    def says(e: Throwable) =
      e != null && e.getMessage != null && e.getMessage.contains("order key")
    assert(says(nullKey) || says(nullKey.getCause), s"got: ${nullKey.getMessage}")
  }

  test("tokenShardsOrdered: a single hot order key still shards exactly (skew rebucketing)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Every row carries the SAME order key — the fixed-width layout
    // would put the whole corpus in one bucket (a corpus-sized
    // single-partition sort); the skew path must rebucket by rank over
    // (key, id) and still produce the exact global-order shard ids.
    val n = 2000L
    val toks = (1L to n).map(i => 10L + (i % 7))
    val docs = (1L to n).map(i => (i, 10L + (i % 7))).toDF("doc_id", "toks")
    // skewMinBucketRows = 0 forces the rebucketing leg at fixture size
    // (the default 256k floor exists precisely so corpora this small
    // never pay the extra skinny-sort passes).
    val out = Mixture.tokenShardsOrdered(docs, "doc_id", "toks",
      lit(42L), 1L << 20, numShards = 8, numBuckets = 256,
      skewMinBucketRows = 0L)
      .select("doc_id", "shard_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val total = toks.sum
    val target = math.max(1L, (total + 7) / 8)
    var acc = 0L
    val exp = (1L to n).map { i =>
      val s = math.min(acc / target, 7L).toInt
      acc += 10L + (i % 7)
      i -> s
    }.toMap
    assert(out == exp)
    assert(out.values.toSet == (0 until 8).toSet, "not all shards used")
  }

  test("budget fill: crossing doc included, later docs excluded, order is priority order") {
    import spark.implicits._
    // One source; priorities of ids 0..4 determine the fill order.
    val docs = Seq((0L, "s", 10L), (1L, "s", 10L), (2L, "s", 10L), (3L, "s", 10L), (4L, "s", 10L))
      .toDF("doc_id", "source", "toks")
    val order = docs.withColumn("pr", Mixture.priority(col("doc_id")))
      .orderBy("pr").select("doc_id").as[Long].collect().toSeq
    // budget 25 -> running totals 10,20,30: third doc crosses and is kept.
    val budgets = Seq(("s", 25L)).toDF("source", "budget")
    val got = Mixture.sampleByTokenBudget(docs, "doc_id", "toks", "source", budgets)
      .select("doc_id").as[Long].collect().toSet
    assert(got == order.take(3).toSet)
  }

  test("sources missing from the budget table select nothing; zero budget selects nothing") {
    import spark.implicits._
    val docs = Seq((1L, "x", 5L), (2L, "y", 5L)).toDF("doc_id", "source", "toks")
    val budgets = Seq(("x", 0L)).toDF("source", "budget")
    assert(Mixture.sampleByTokenBudget(docs, "doc_id", "toks", "source", budgets).count() == 0L)
  }

  test("budget above total selects the whole source") {
    import spark.implicits._
    val docs = Seq((1L, "x", 5L), (2L, "x", 0L), (3L, "x", 7L)).toDF("doc_id", "source", "toks")
    val budgets = Seq(("x", 1000L)).toDF("source", "budget")
    assert(Mixture.sampleByTokenBudget(docs, "doc_id", "toks", "source", budgets).count() == 3L)
  }

  test("tokenShards: every shard within one doc of target; all shards used") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, 1L + i % 50)).toDF("doc_id", "toks")
    val out = Mixture.tokenShards(docs, "doc_id", "toks", numShards = 8)
    val per = out.groupBy("shard_id").agg(sum("toks").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = (0L until 400L).map(i => 1L + i % 50).sum
    val target = (total + 7) / 8
    assert(per.keySet == (0 until 8).toSet, s"shards used: ${per.keySet}")
    // A shard closes only when a doc CROSSES target: overshoot < max doc.
    per.foreach { case (sid, t) =>
      if (sid < 7) assert(t >= target - 50 && t < target + 50, s"shard $sid off: $t vs $target")
    }
  }

  test("temperatureSample: rates follow c^alpha, selection matches the hash threshold") {
    import spark.implicits._
    // Skewed sources: 60 / 30 / 10 docs.
    val docs = ((0L until 60L).map((_, "big")) ++ (60L until 90L).map((_, "mid")) ++
      (90L until 100L).map((_, "small"))).toDF("doc_id", "source")
    val got = Mixture.temperatureSample(docs, "doc_id", "source",
        alpha = 0.5, budgetDocs = 40L)
      .select("doc_id").as[Long].collect().toSet
    val c = Map("big" -> 60L, "mid" -> 30L, "small" -> 10L)
    val z = c.values.map(n => math.pow(n.toDouble, 0.5)).sum
    def rate(s: String): Double =
      BigDecimal(math.min(1d, 40d * math.pow(c(s).toDouble, 0.5) / z / c(s)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // alpha < 1 up-weights the tail: small source rate > big source rate.
    assert(rate("small") > rate("big"))
    val expect = (0L until 100L).filter { id =>
      val s = if (id < 60) "big" else if (id < 90) "mid" else "small"
      ((id * 2654435761L) % 4294967296L).toDouble < rate(s) * 4294967296d
    }.toSet
    assert(got == expect, s"diff: ${(got -- expect) ++ (expect -- got)}")
  }

  test("weightedSample: matches the A-ES formula exactly and excludes nonpositive weights") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, if (i % 13 == 0) 0L else 1L + i % 37))
      .toDF("doc_id", "w")
    val got = Mixture.weightedSample(docs, "doc_id", "w", k = 20)
      .select("doc_id").as[Long].collect().toSeq
    // Reference recomputation of the same deterministic draw.
    val expect = (0L until 200L)
      .map(i => (i, if (i % 13 == 0) 0L else 1L + i % 37))
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val u = ((id * 2654435761L) % 4294967296L + 1).toDouble / 4294967297d
        (id, -math.log(u) / w)
      }
      .sortBy { case (id, key) => (key, id) }
      .take(20).map(_._1)
    assert(got.sorted == expect.sorted, s"got $got")
    assert(!got.exists(_ % 13 == 0), "zero-weight rows must never be drawn")
    // k above the eligible count returns everything eligible.
    assert(Mixture.weightedSample(docs, "doc_id", "w", k = 1000).count() ==
      (0L until 200L).count(_ % 13 != 0))
    // Scale shape: selection must plan as a bounded top-k
    // (TakeOrderedAndProject), never a global sort.
    val plan = Mixture.weightedSample(docs, "doc_id", "w", k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("rebalanceToTarget: exact needs per domain, deterministic picks, strays dropped") {
    import spark.implicits._
    // Domain counts a=6, b=3, c=1 (+2 'stray' rows outside the target).
    // Target (0.5, 0.3, 0.2): feasible N = min(⌊6/.5⌋, ⌊3/.3⌋, ⌊1/.2⌋)
    // = min(12, 10, 5) = 5 (decimal floors — 3/0.3 is exactly 10);
    // needs = ⌊.5·5⌋, ⌊.3·5⌋, ⌊.2·5⌋ = 2, 1, 1.
    val rows = (0L until 6L).map((_, "a")) ++
      (10L until 13L).map((_, "b")) ++ Seq((20L, "c")) ++
      Seq((30L, "stray"), (31L, "stray"))
    val df = rows.toDF("doc_id", "domain")
    val target = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val got = Mixture.rebalanceToTarget(df, "doc_id", "domain", target)
    val counts = got.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
    // Deterministic: same corpus -> same docs, and they are the
    // hash-priority-first rows of each domain.
    val again = Mixture.rebalanceToTarget(df, "doc_id", "domain", target)
      .select("doc_id").as[Long].collect().toSet
    assert(got.select("doc_id").as[Long].collect().toSet === again)
    val expected = rows.filter(_._2 != "stray").groupBy(_._2).flatMap {
      case (d, rs) =>
        rs.map(_._1).sortBy(id => ((id * 2654435761L) % 4294967296L, id))
          .take(counts(d).toInt)
    }.toSet
    assert(again === expected)
    // A target domain absent from the corpus pins N = 0: empty result,
    // never a silently mis-mixed sample.
    assert(Mixture.rebalanceToTarget(
      df, "doc_id", "domain", Map("a" -> 0.5, "nope" -> 0.5)).count() === 0L)
    // Decimal-floor contract: shares 0.29/0.71 over counts 29/71 are a
    // PERFECT mixture (N = 100, needs = 29 and 71) — double arithmetic
    // computes 0.29·100 = 28.999…6 and would short domain a by one row.
    val perfect = ((0L until 29L).map((_, "a")) ++ (100L until 171L).map((_, "b")))
      .toDF("doc_id", "domain")
    val pc = Mixture.rebalanceToTarget(
      perfect, "doc_id", "domain", Map("a" -> 0.29, "b" -> 0.71))
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pc === Map("a" -> 29L, "b" -> 71L))
  }

  test("rebalanceToTarget: non-string domain columns compare as strings, schema preserved") {
    import spark.implicits._
    // Integer domain codes with string target keys: the op casts the
    // domain to string on BOTH sides of the budget join, so "1"/"2"
    // select the int-coded domains instead of silently mis-joining (or
    // failing analysis) through an implicit cast.
    val df = ((0L until 6L).map((_, 1)) ++ (10L until 13L).map((_, 2)))
      .toDF("doc_id", "domain")
    val got = Mixture.rebalanceToTarget(
      df, "doc_id", "domain", Map("1" -> 0.6, "2" -> 0.4))
    // feasible N = min(⌊6/.6⌋, ⌊3/.4⌋) = min(10, 7) = 7; needs = ⌊.6·7⌋,
    // ⌊.4·7⌋ = 4, 2.
    val counts = got.groupBy("domain").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts === Map(1 -> 4L, 2 -> 2L))
    // The output schema is the input's — the internal string-cast and
    // unit-token columns never leak.
    assert(got.columns.toSeq === df.columns.toSeq)
    assert(got.schema("domain").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("unimaxSample: greedy waterfill, epoch cap binds smallest-first, priority prefix") {
    import spark.implicits._
    // Languages a=4, b=10, c=30 docs. Budget 30, maxEpochs 2.0 —
    // smallest-first waterfill:
    //   a: left=3, fair=30/3=10, cap=8  -> quota 8 (CAP binds), R=22
    //   b: left=2, fair=22/2=11, cap=20 -> quota 11,            R=11
    //   c: left=1, fair=11,     cap=60 -> quota 11,            R=0
    // Selection: min(quota, n) priority-first docs — a takes ALL 4
    // (epochs 2.0), b takes 10 (epochs 1.1), c takes 11 of 30.
    val rows = (0L until 4L).map((_, "a")) ++
      (100L until 110L).map((_, "b")) ++ (200L until 230L).map((_, "c"))
    val df = rows.toDF("doc_id", "lang")
    val got = Mixture.unimaxSample(df, "doc_id", "lang",
      budgetDocs = 30L, maxEpochs = 2.0)
    val byLang = got.groupBy("lang").agg(
      count(lit(1)).as("n"), min("ux_quota").as("q"), min("ux_epochs").as("e"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byLang == Map(
      "a" -> ((4L, 8L, 2.0)), "b" -> ((10L, 11L, 1.1)),
      "c" -> ((11L, 11L, round11(11d / 30d)))), byLang.toString)
    // Selection is the hash-priority prefix (ties by id) — the same
    // deterministic order every mixture op uses.
    val cSel = got.where(col("lang") === "c")
      .select("doc_id").as[Long].collect().toSet
    val cExp = (200L until 230L)
      .sortBy(id => ((id * 2654435761L) % 4294967296L, id)).take(11).toSet
    assert(cSel == cExp)
    // Budget exhaustion: zero budget selects nothing; a budget smaller
    // than the language count still floors fairly (1 doc each here).
    assert(Mixture.unimaxSample(df, "doc_id", "lang", 0L).count() == 0L)
    val tiny = Mixture.unimaxSample(df, "doc_id", "lang", 3L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("unimaxSampleTokens: token-mass waterfill, atomic boundary doc, zero-token lang") {
    import spark.implicits._
    // Token masses a=40 (4 docs x 10), b=100 (10 x 10), c=300 (30 x 10),
    // z=0 (2 empty docs). Budget 300 tokens, maxEpochs 2.0 — the SAME
    // waterfill as the doc test scaled by 10, plus the zero language
    // first (cap 0, quota 0):
    //   z: left=4, fair=75,  cap=0   -> 0 (cap), R=300
    //   a: left=3, fair=100, cap=80  -> 80 (CAP binds), R=220
    //   b: left=2, fair=110, cap=200 -> 110,            R=110
    //   c: left=1, fair=110, cap=600 -> 110,            R=0
    // Selection: a all 4 docs (2 epochs); b 10 of 10 (prior of doc 10 =
    // 90 < 110); c the 11-doc priority prefix (prior of doc 11 = 100 <
    // 110 — the BOUNDARY doc carries the total to 110; doc 12's prior
    // 110 is not < 110).
    val rows = (0L until 4L).map((_, "a", 10L)) ++
      (100L until 110L).map((_, "b", 10L)) ++
      (200L until 230L).map((_, "c", 10L)) ++
      Seq((300L, "z", 0L), (301L, "z", 0L))
    val df = rows.toDF("doc_id", "lang", "toks")
    val got = Mixture.unimaxSampleTokens(df, "doc_id", "toks", "lang",
      budgetTokens = 300L, maxEpochs = 2.0)
    val byLang = got.groupBy("lang").agg(
      count(lit(1)).as("n"), min("ux_quota").as("q"), min("ux_epochs").as("e"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byLang == Map(
      "a" -> ((4L, 80L, 2.0)), "b" -> ((10L, 110L, 1.1)),
      "c" -> ((11L, 110L, round11(110d / 300d)))), byLang.toString)
    // z allocated 0 tokens -> selects nothing, and the epochs division
    // is guarded (no ANSI divide-by-zero, no NaN row).
    assert(!byLang.contains("z"))
    val cSel = got.where(col("lang") === "c")
      .select("doc_id").as[Long].collect().toSet
    val cExp = (200L until 230L)
      .sortBy(id => ((id * 2654435761L) % 4294967296L, id)).take(11).toSet
    assert(cSel == cExp)
    // The doc variant IS the unit-token case — identical selection and
    // quota columns on the shared fixture (delegation pinned).
    val viaTokens = Mixture.unimaxSampleTokens(
      df.select("doc_id", "lang").withColumn("one", lit(1L)),
      "doc_id", "one", "lang", 30L, 2.0)
      .select("doc_id", "ux_quota", "ux_epochs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaDocs = Mixture.unimaxSample(
      df.select("doc_id", "lang"), "doc_id", "lang", 30L, 2.0)
      .select("doc_id", "ux_quota", "ux_epochs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaTokens == viaDocs)
  }

  private def round11(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("leakageSafeSplit: groups never straddle splits; label = anchor's hashSplit") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // 60 groups of 1-4 members each; member ids interleave across groups
    // so group min is NOT a contiguous range.
    val docs = (0L until 150L).map(i => (i, s"g${i % 60}")).toDF("doc_id", "grp")
    val got = Mixture.leakageSafeSplit(docs, "doc_id", "grp", "graft", splits)
    assert(got.count() == 150)
    // (a) each group lands in exactly one split
    val perGroup = got.groupBy("grp")
      .agg(countDistinct("split").as("n")).where(col("n") > 1).count()
    assert(perGroup == 0L)
    // (b) the shared label is precisely hashSplit of the group's min id
    val anchors = docs.groupBy("grp").agg(min("doc_id").as("doc_id"))
    val expected = Mixture.hashSplit(anchors, "doc_id", "graft", splits)
      .select(col("grp"), col("split").as("exp_split"))
    val mismatches = got.join(expected, "grp")
      .where(col("split") =!= col("exp_split")).count()
    assert(mismatches == 0L)
  }
}
