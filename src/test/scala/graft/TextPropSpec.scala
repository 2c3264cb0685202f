package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.{Dedup, TextOps}

/** Property tests for the round-7 text operators, each checked against
  * an independent in-memory reference model on random tiny-vocabulary
  * corpora (small vocab on purpose: shared windows, seen/backoff/OOV
  * branches, and span-boundary collisions happen on every run instead
  * of almost never). The fixture oracle grades one corpus shape; these
  * pin the operator semantics on adversarial ones — repeated windows
  * inside one doc, docs shorter than the window, whitespace-only and
  * null texts, benchmark spans at document edges.
  */
object TextPropSpec extends Properties("TextOps.reference") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  /** The operator's own tokenization (TextOps.tokens): trim, split \s+. */
  private def toks(s: String): Seq[String] = {
    val t = if (s == null) "" else s.trim
    if (t.isEmpty) Seq.empty else scala.collection.immutable.ArraySeq.unsafeWrapArray(t.split("\\s+"))
  }

  // Docs draw 0-12 tokens from a 6-word vocab; ~1 in 12 is whitespace
  // only and ~1 in 12 is a SQL NULL.
  private val genDoc: Gen[Option[String]] = Gen.frequency(
    10 -> Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f")).map(ws => Some(ws.mkString(" ")))),
    1 -> Gen.const(Some("   ")),
    1 -> Gen.const(None))

  private val genCorpus: Gen[Seq[(Long, Option[String])]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, genDoc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def toDf(corpus: Seq[(Long, Option[String])]) = {
    import spark.implicits._
    corpus.toDF("id", "text")
  }

  property("exactSubstringOverlap == brute-force shared-window counts") =
    Prop.forAllNoShrink(genCorpus, Gen.chooseNum(2, 4)) { (corpus, k) =>
      val windows = corpus.map { case (id, t) =>
        id -> toks(t.orNull).sliding(k).filter(_.length == k).map(_.mkString(" ")).toSeq
      }
      val docFreq = windows.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val expected = windows.collect { case (id, ws) if ws.nonEmpty =>
        id -> ((ws.size.toLong, ws.count(w => docFreq(w) >= 2).toLong))
      }.toMap
      val got = TextOps.exactSubstringOverlap(toDf(corpus), "id", "text", k = k)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected k=$k"
    }

  /** In-memory stupid-backoff bigram model mirroring lmFluencyScores'
    * documented semantics: p = c(w1w2)/c(w1·) when seen, else
    * 0.4·c(w2)/N, floored at 0.4/(N+1) when that is 0 (OOV under a
    * foreign LM).
    */
  private def lmRef(
      docs: Seq[(Long, Option[String])],
      lmDocs: Seq[(Long, Option[String])]): Map[Long, (Long, Double)] = {
    val uni = lmDocs.flatMap(d => toks(d._2.orNull))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum
    val bi = lmDocs.flatMap(d => toks(d._2.orNull).sliding(2).filter(_.size == 2)
        .map(w => (w.head, w(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val left = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    docs.flatMap { case (id, t) =>
      val w = toks(t.orNull)
      if (w.size < 2) None
      else {
        val ps = w.sliding(2).filter(_.size == 2).map { bg =>
          val p0 = bi.get((bg.head, bg(1))) match {
            case Some(cb) => cb.toDouble / left(bg.head)
            case None if n > 0 => 0.4 * uni.getOrElse(bg(1), 0L).toDouble / n
            case None => 0d
          }
          StrictMath.log10(if (p0 > 0d) p0 else 0.4 / (n + 1d))
        }.toSeq
        Some(id -> ((ps.size.toLong, ps.sum / ps.size)))
      }
    }.toMap
  }

  property("lmFluencyScores == in-memory stupid backoff (self and foreign LM)") =
    Prop.forAllNoShrink(genCorpus, genCorpus) { (docs, lmDocs) =>
      def check(lm: Option[Seq[(Long, Option[String])]]): Prop = {
        val expected = lmRef(docs, lm.getOrElse(docs))
        val got = TextOps.lmFluencyScores(toDf(docs), "id", "text", lm.map(toDf))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        val same = got.keySet == expected.keySet && expected.forall { case (id, (nb, s)) =>
          got(id)._1 == nb && math.abs(got(id)._2 - s) < 1e-9
        }
        Prop(same) :| s"lm=${lm.isDefined} got=$got expected=$expected"
      }
      check(None) && check(Some(lmDocs))
    }

  property("removeDuplicatedSpans: first copy intact, later copies lose == brute") =
    Prop.forAllNoShrink(genCorpus, Gen.chooseNum(2, 4)) { (corpus, k) =>
      val windows = corpus.map { case (id, t) =>
        id -> toks(t.orNull).sliding(k).filter(_.length == k).map(_.mkString(" ")).toVector
      }
      val firstDoc = windows.flatMap { case (id, ws) => ws.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val expected = corpus.map { case (id, t) =>
        val w = toks(t.orNull)
        val covered = (0 to w.size - k)
          .filter(st => firstDoc(w.slice(st, st + k).mkString(" ")) < id)
          .flatMap(st => st until st + k).toSet
        val kept = w.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
        id -> ((w.size.toLong, covered.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = TextOps.removeDuplicatedSpans(toDf(corpus), "id", "text", k = k)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      Prop(got == expected) :| s"k=$k got=$got expected=$expected"
    }

  property("removeContaminatedSpans: total, order-preserving, == brute coverage") =
    Prop.forAllNoShrink(genCorpus, genCorpus, Gen.chooseNum(1, 3)) { (corpus, benchDocs, n) =>
      val benchSh = benchDocs.flatMap(d =>
        toks(d._2.orNull).sliding(n).filter(_.length == n).map(_.mkString(" "))).toSet
      val expected = corpus.map { case (id, t) =>
        val w = toks(t.orNull)
        val covered = (0 to w.size - n)
          .filter(st => benchSh.contains(w.slice(st, st + n).mkString(" ")))
          .flatMap(st => st until st + n).toSet
        val kept = w.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
        id -> ((w.size.toLong, covered.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = TextOps.removeContaminatedSpans(toDf(corpus), toDf(benchDocs),
        "id", "text", n = n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      // Totality is part of the contract: EVERY corpus id comes back,
      // including null/whitespace docs (as 0/0/"").
      Prop(got == expected) :| s"n=$n got=$got expected=$expected"
    }

  // ---- round-8 late ops: blocking, containment, normalization ----

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Distinct n-shingles, the ops' contract (TextOps.shingles dedups). */
  private def shingleSet(t: Option[String], n: Int): Set[String] =
    toks(t.orNull).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  property("blockingNearDupPairs == brute per-block Jaccard with the block cap") =
    Prop.forAllNoShrink(genCorpus, Gen.chooseNum(1, 3), Gen.chooseNum(2L, 4L),
      Gen.oneOf(0.2, 0.5, 0.8)) { (corpus, blockTokens, maxBlock, threshold) =>
      // Small vocab + tiny maxBlockSize: hot blocks (the cap branch) and
      // shared prefixes both occur on nearly every run.
      val keyed = corpus.flatMap { case (id, t) =>
        val bk = toks(t.orNull).take(blockTokens).mkString(" ")
        if (bk.isEmpty) None else Some(id -> bk)
      }
      val blockSizes = keyed.groupBy(_._2).view.mapValues(_.size).toMap
      val kept = keyed.filter { case (_, bk) => blockSizes(bk) <= maxBlock }
      val expected = (for {
        (a, bkA) <- kept; (b, bkB) <- kept
        if bkA == bkB && a < b
        shA = shingleSet(corpus.find(_._1 == a).get._2, 2)
        shB = shingleSet(corpus.find(_._1 == b).get._2, 2)
        union = (shA ++ shB).size if union > 0
        j = (shA & shB).size.toDouble / union if j >= threshold
      } yield (a, b) -> r4(j)).toMap
      val got = Dedup.blockingNearDupPairs(toDf(corpus), "id", "text",
        blockTokens = blockTokens, n = 2, threshold = threshold,
        maxBlockSize = maxBlock)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      Prop(got == expected) :|
        s"bt=$blockTokens cap=$maxBlock thr=$threshold got=$got expected=$expected"
    }

  property("containmentNearDupPairs == brute |A∩B|/min with the shingle hot-cap") =
    Prop.forAllNoShrink(genCorpus, Gen.chooseNum(2L, 4L),
      Gen.oneOf(0.3, 0.6, 0.9)) { (corpus, cap, threshold) =>
      val sh0 = corpus.map { case (id, t) => id -> shingleSet(t, 2) }
      val docFreq = sh0.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val sh = sh0.map { case (id, s) =>
        id -> s.filter(docFreq(_) <= cap) }.filter(_._2.nonEmpty).toMap
      val expected = (for {
        (a, shA) <- sh; (b, shB) <- sh
        if a < b
        common = (shA & shB).size if common > 0
        c = common.toDouble / math.min(shA.size, shB.size) if c >= threshold
      } yield (a, b) -> r4(c)).toMap
      val got = Dedup.containmentNearDupPairs(toDf(corpus), "id", "text",
        n = 2, threshold = threshold, maxShingleDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      Prop(got == expected) :| s"cap=$cap thr=$threshold got=$got expected=$expected"
    }

  /** Case flips, punctuation injections, and whitespace-run expansion —
    * exactly the degradations [[TextOps.normalizeForMatch]] promises to
    * erase (punctuation strips BEFORE whitespace collapse, so an
    * injected punct char can never create a new token boundary).
    */
  private val genPerturbed: Gen[(String, String)] = for {
    n <- Gen.chooseNum(1, 8)
    words <- Gen.listOfN(n, Gen.chooseNum(1, 5).flatMap(l =>
      Gen.listOfN(l, Gen.alphaNumChar).map(_.mkString)))
    base = words.mkString(" ")
    perturbed <- {
      val punct = Gen.oneOf("!", "@", ",", ".", ";", ":", "'", "\"", "-", "(", ")")
      val ws = Gen.oneOf(" ", "  ", " \t ", "\t", "\n ")
      val charGens: Seq[Gen[String]] = base.map { ch =>
        if (ch == ' ') ws
        else for {
          flip <- Gen.oneOf(true, false)
          ins <- Gen.frequency(4 -> Gen.const(""), 1 -> punct)
        } yield (if (flip) ch.toUpper else ch.toLower).toString + ins
      }
      val lead = Gen.frequency(3 -> Gen.const(""), 1 -> punct)
      charGens.foldLeft(lead)((acc, g) =>
        acc.flatMap(s => g.map(s + _)))
    }
  } yield (base, perturbed)

  property("normalizeForMatch: idempotent and invariant under case/punct/ws noise") =
    Prop.forAllNoShrink(Gen.listOfN(6, genPerturbed)) { pairs =>
      import spark.implicits._
      val rows = pairs.toDF("base", "perturbed")
        .select(
          TextOps.normalizeForMatch(org.apache.spark.sql.functions.col("base")).as("nb"),
          TextOps.normalizeForMatch(org.apache.spark.sql.functions.col("perturbed")).as("np"),
          TextOps.normalizeForMatch(
            TextOps.normalizeForMatch(
              org.apache.spark.sql.functions.col("perturbed"))).as("npp"))
        .collect()
      val invariant = rows.forall(r => r.getString(1) == r.getString(0))
      val idempotent = rows.forall(r => r.getString(2) == r.getString(1))
      Prop(invariant && idempotent) :|
        rows.map(r => s"(${r.getString(0)}|${r.getString(1)}|${r.getString(2)})").mkString(",")
    }

  // Ranked lists for rrfFuse: 1-4 lists, each a permutation-prefix of a
  // small id universe (distinct ids within a list, ranks 1..len).
  private val genRankedLists: Gen[Seq[Seq[(Long, Int)]]] =
    Gen.chooseNum(1, 4).flatMap(nl => Gen.listOfN(nl,
      Gen.chooseNum(0, 10).flatMap { len =>
        Gen.pick(len, 0L until 15L).map(ids =>
          ids.toSeq.sorted.zipWithIndex.map { case (id, i) => (id, i + 1) })
      }))

  property("rrfFuse == brute reciprocal-rank fusion incl. the top-k cut") =
    Prop.forAllNoShrink(genRankedLists, Gen.chooseNum(1, 8)) { (lists, k) =>
      import spark.implicits._
      val c = 60
      // In-memory reference: sum 1/(c+rank) per id, round 6, cut top-k
      // on (rounded score desc, id asc).
      val ref = lists.flatten.groupBy(_._1).toSeq
        .map { case (id, rs) =>
          val score = BigDecimal(rs.map(r => 1.0 / (c + r._2)).sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, rs.size.toLong, score)
        }
        .sortBy { case (id, _, score) => (-score, id) }
        .take(k)
      val got = TextOps.rrfFuse(
          lists.map(l => l.toDF("id", "rank")), k = k, c = c)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      Prop(got.toSeq == ref) :| s"got=${got.toSeq} ref=$ref"
    }

  property("topNgramStats == brute top-gram, coverage, and integer threshold") =
    Prop.forAllNoShrink(genCorpus, Gen.chooseNum(1, 3)) { (corpus, n) =>
      // In-memory reference: sliding n-grams, max count with lex-min
      // tie-break, covered = count * non-space gram chars, frac capped
      // at 1.0 and HALF_UP-rounded like Spark's round(); the repetitive
      // flag is the exact integer rule (covered*100 > 20*doc_chars).
      val ref = corpus.flatMap { case (id, t) =>
        val w = toks(t.orNull)
        if (w.size < n) None
        else {
          val counts = w.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).map { case (g, o) => (g, o.size.toLong) }
          val (gram, cnt) = counts.minBy { case (g, c) => (-c, g) }
          val docChars = t.get.replaceAll("\\s+", "").length
          val covered = cnt * gram.replace(" ", "").length
          val frac = BigDecimal(math.min(1.0, covered.toDouble / docChars))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some((id, gram, cnt, covered, docChars, frac,
            covered * 100L > 20L * docChars))
        }
      }.sortBy(_._1)
      val got = TextOps.topNgramStats(toDf(corpus), "id", "text", n = n)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getDouble(5), r.getBoolean(6)))
      Prop(got.toSeq == ref) :| s"n=$n got=${got.toSeq} ref=$ref"
    }

  /** In-memory reference BPE trainer: word-frequency compaction, then
    * per round count adjacent pairs weighted by word freq, argmax with
    * (count desc, "a b" asc) tie-break, GREEDY left-to-right
    * non-overlapping apply ("aaa" + merge (a,a) → [aa, a]).
    */
  private def refBpe(
      texts: Seq[Option[String]], numMerges: Int): Seq[(Int, String, String, Long)] = {
    def applyMerge(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.result()
    }
    var vocab: Map[Vector[String], Long] = texts.flatMap(t => toks(t.orNull))
      .filter(w => w.length >= 2 && w.matches("^[\\p{L}\\p{N}]+$"))
      .groupBy(w => w.map(_.toString).toVector)
      .map { case (k, v) => (k, v.size.toLong) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var continue = true
    while (r <= numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
        merges += ((r, a, b, n))
        vocab = vocab.groupBy { case (syms, _) => applyMerge(syms, a, b) }
          .map { case (k, g) => (k, g.values.sum) }
        r += 1
      }
    }
    merges.result()
  }

  property("bpeTrain == in-memory reference merge loop (greedy, tie-broken)") = {
    // Tiny alphabet ON PURPOSE: adjacent repeats ("aaaa") and exact
    // count ties happen every run, pinning the greedy non-overlapping
    // apply and the (count desc, pair asc) tie-break — the two places a
    // distributed reformulation could silently diverge.
    val genWord = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genDocB: Gen[Option[String]] = Gen.frequency(
      10 -> Gen.chooseNum(0, 10).flatMap(n =>
        Gen.listOfN(n, genWord).map(ws => Some(ws.mkString(" ")))),
      1 -> Gen.const(Some("   ")),
      1 -> Gen.const(None))
    val genCorpusB = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, genDocB))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    Prop.forAllNoShrink(genCorpusB) { corpus =>
      // Both routes against the reference: the default (small vocab →
      // the r19 driver-local loop) and the forced-distributed per-round
      // census (smallVocabMaxRows = 0) — route equality is the local
      // loop's correctness contract.
      def run(cap: Long) =
        TextOps.bpeTrain(toDf(corpus), "text", numMerges = 5,
            smallVocabMaxRows = cap)
          .orderBy("round").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
      val gotLocal = run(TextOps.DefaultSmallVocabMaxRows)
      val gotDist = run(0L)
      val ref = refBpe(corpus.map(_._2), 5)
      (Prop(gotLocal == ref) :| s"local=$gotLocal ref=$ref") &&
        (Prop(gotDist == ref) :| s"dist=$gotDist ref=$ref")
    }
  }

  // Funnel corpora mix every rejection class: tiny docs, one-word
  // repetition, stopword-free, rule-passing docs with disjoint
  // vocabularies (unique suffix per doc — zero cross-doc shingles), and
  // exact duplicates of earlier good docs (dedup clusters).
  private val genFunnelCorpus: Gen[Seq[(Long, String)]] =
    Gen.chooseNum(3, 18).flatMap { n =>
      Gen.listOfN(n, Gen.frequency(
        2 -> Gen.const("tiny"),
        2 -> Gen.const("repeat"),
        2 -> Gen.const("nostop"),
        4 -> Gen.const("good"),
        3 -> Gen.const("dup")))
    }.map { kinds =>
      def good(i: Int): String =
        "the and " + ('a' to 'z').map(c => s"w$i$c").mkString(" ")
      val out = Seq.newBuilder[(Long, String)]
      var lastGood = -1
      kinds.zipWithIndex.foreach { case (k, i) =>
        val text = k match {
          case "tiny" => "too short"
          case "repeat" => Seq.fill(30)("word").mkString(" ")
          case "nostop" => ('a' to 'z').map(c => s"v$i$c").mkString(" ") +
            s" v${i}aa v${i}bb"
          case "dup" if lastGood >= 0 => good(lastGood)
          case _ => lastGood = i; good(i)
        }
        out += ((i.toLong, text))
      }
      out.result()
    }

  property("rejectionFunnel: one labeled row per doc; kept == composite pipeline") =
    Prop.forAllNoShrink(genFunnelCorpus) { rows =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions._
      val corpus = rows.toDF("doc_id", "text")
      // Benchmark shares a trigram with the FIRST good doc (if any), so
      // contamination bites exactly when that doc survives dedup.
      val firstGood = rows.collectFirst {
        case (_, t) if t.startsWith("the and ") => t.split(" ").take(5).mkString(" ")
      }.getOrElse("zz zz zz zz zz")
      val bench = Seq((999L, firstGood)).toDF("doc_id", "text")
      val out = TextOps.rejectionFunnel(corpus, bench, "doc_id", "text")
        .select("doc_id", "stage").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val partitionOk = out.length == rows.length &&
        out.map(_._1).toSet == rows.map(_._1).toSet &&
        out.forall(_._2 != null)
      // Independent composite: the pipeline the funnel attributes.
      val q = corpus.where(TextOps.qualityRules(col("text")).keep)
      val dd = Dedup.dedupByJaccard(q, "doc_id", "text")
      val survivors = dd.join(
        TextOps.contaminationOverlap(dd, bench, "doc_id", "text").select("doc_id"),
        Seq("doc_id"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      val keptOk = out.filter(_._2 == "kept").map(_._1).toSet == survivors
      Prop(partitionOk && keptOk) :| s"out=${out.toSeq} survivors=$survivors"
    }
}
