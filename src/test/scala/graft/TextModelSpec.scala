package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.VectorExpressions
import graft.ops.TextOps

/** Learned quality scorer (qn105) + tokenizer store lifecycle (qn106):
  * the hashing/scoring expressions are pinned bit-for-bit against an
  * in-memory reference scorer, training is validated end-to-end on a
  * separable corpus, and the persisted-merges lifecycle (save →
  * supersede → `use_last` vs pinned-key rollback) is exercised against
  * a real store.
  */
class TextModelSpec extends SparkSpec {

  import org.apache.spark.sql.graft.HashedTokenBucket

  private def refBucket(tok: String, dim: Int): Int =
    HashedTokenBucket.bucket(UTF8String.fromString(tok), dim)

  /** In-memory mirror of HashedTokenLogitExpr: aux dot with the weight
    * prefix, then per-token hashed adds, accumulated left-to-right from
    * the intercept — double addition is non-associative, so bit-for-bit
    * means SAME association, not just same terms.
    */
  private def refScore(aux: Seq[Double], toks: Seq[String], w: Array[Double],
      hashDim: Int, b: Double): Double = {
    val nAux = w.length - hashDim
    var z = b
    aux.take(nAux).zipWithIndex.foreach { case (v, i) => z += v * w(i) }
    toks.foreach(t => z += w(nAux + refBucket(t, hashDim)))
    1d / (1d + math.exp(-z))
  }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaa aaa aaa aaa",
    "", "   ",
    "über Äpfel und Öl zür 42 tokens",
    "one-token",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z")

  test("hashedTokenCounts matches the in-memory reference (counts, dim, empties)") {
    import spark.implicits._
    val dim = 64
    val got = texts.toDF("text")
      .select(VectorExpressions.hashedTokenCounts(TextOps.tokens(col("text")), dim))
      .as[Seq[Double]].collect()
    texts.zip(got).foreach { case (t, arr) =>
      assert(arr.length === dim)
      val toks = t.trim match { case "" => Seq.empty[String]; case s => s.split("\\s+").toSeq }
      val exp = new Array[Double](dim)
      toks.foreach(tok => exp(refBucket(tok, dim)) += 1d)
      assert(arr === exp.toSeq, s"counts mismatch for '$t'")
      assert(arr.sum === toks.size.toDouble)
    }
  }

  test("hashedTokenLogit matches the in-memory scorer bit-for-bit (with and without aux)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val w = Array.fill(64)(rnd.nextGaussian() * 0.3)
    val b = -0.7
    val noAux = texts.toDF("text")
      .select(VectorExpressions.hashedTokenLogit(
        array().cast("array<double>"), TextOps.tokens(col("text")), w, w.length, b))
      .as[Double].collect()
    texts.zip(noAux).foreach { case (t, p) =>
      val toks = t.trim match { case "" => Seq.empty[String]; case s => s.split("\\s+").toSeq }
      assert(p === refScore(Nil, toks, w, w.length, b), s"score mismatch for '$t'")
    }
    val auxVals = Seq(0.5, -1.25)
    val wAux = Array(0.9, 0.11) ++ w
    val withAux = texts.toDF("text")
      .select(VectorExpressions.hashedTokenLogit(
        array(lit(0.5), lit(-1.25)), TextOps.tokens(col("text")), wAux, w.length, b))
      .as[Double].collect()
    texts.zip(withAux).foreach { case (t, p) =>
      val toks = t.trim match { case "" => Seq.empty[String]; case s => s.split("\\s+").toSeq }
      assert(p === refScore(auxVals, toks, wAux, w.length, b), s"aux score mismatch for '$t'")
    }
  }

  /** In-memory mirror of HashedTokenMultiLogitExpr — same loop order
    * (per-feature outer, per-class inner), so bit-for-bit again means
    * same float association, not just same terms.
    */
  private def refMulti(aux: Seq[Double], toks: Seq[String], w: Array[Double],
      hashDim: Int, b: Array[Double]): (Int, Double) = {
    val k = b.length
    val stride = w.length / k
    val nAux = stride - hashDim
    val z = b.clone()
    var i = 0
    while (i < nAux) {
      var c = 0
      while (c < k) { z(c) += aux(i) * w(c * stride + i); c += 1 }
      i += 1
    }
    toks.foreach { t =>
      val bk = nAux + refBucket(t, hashDim)
      var c = 0
      while (c < k) { z(c) += w(c * stride + bk); c += 1 }
    }
    var best = 0
    var c = 1
    while (c < k) { if (z(c) > z(best)) best = c; c += 1 }
    var denom = 0d
    c = 0
    while (c < k) { denom += math.exp(z(c) - z(best)); c += 1 }
    (best, 1d / denom)
  }

  test("hashedTokenMultiLogit matches the in-memory reference; ties break low; drift rejected") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val hashDim = 32
    val k = 3
    val w = Array.fill(k * (2 + hashDim))(rnd.nextGaussian() * 0.4)
    val b = Array(-0.2, 0.05, 0.3)
    val auxVals = Seq(0.8, -0.4)
    val got = texts.toDF("text")
      .select(VectorExpressions.hashedTokenMultiLogit(
        array(lit(0.8), lit(-0.4)), TextOps.tokens(col("text")), w, hashDim, b)
        .as("p"))
      .select(col("p.pred"), col("p.prob")).collect()
    texts.zip(got).foreach { case (t, r) =>
      val toks = t.trim match {
        case "" => Seq.empty[String]; case s => s.split("\\s+").toSeq }
      val (pred, prob) = refMulti(auxVals, toks, w, hashDim, b)
      assert(r.getInt(0) === pred, s"pred mismatch for '$t'")
      assert(r.getDouble(1) === prob, s"prob mismatch for '$t'")
    }
    // All-zero model: every class logit equal -> argmax must break to
    // class 0 with prob exactly 1/K (deterministic scoring contract).
    val tie = Seq("some text here").toDF("text")
      .select(VectorExpressions.hashedTokenMultiLogit(
        array().cast("array<double>"), TextOps.tokens(col("text")),
        new Array[Double](k * hashDim), hashDim, new Array[Double](k)).as("p"))
      .select(col("p.pred"), col("p.prob")).head()
    assert(tie.getInt(0) === 0 && tie.getDouble(1) === 1d / k)
    // Aux arity drift (model trained with 2 dense features, caller
    // supplies 1) must throw, not silently mis-score.
    val ex = intercept[Exception] {
      Seq("x").toDF("text").select(VectorExpressions.hashedTokenMultiLogit(
        array(lit(1.0)), TextOps.tokens(col("text")), w, hashDim, b)).collect()
    }
    assert(ex.getMessage.contains("layout drift")
      || Option(ex.getCause).exists(_.getMessage.contains("layout drift")))
  }

  test("trainDomainModel separates a vocab-split corpus; expression == in-memory; lifecycle") {
    import spark.implicits._
    // Three classes, disjoint content vocabularies + shared filler.
    val rnd = new scala.util.Random(13)
    val vocab = Map(
      "news" -> Seq("election", "minister", "policy", "vote", "reform"),
      "code" -> Seq("compile", "function", "array", "pointer", "thread"),
      "chat" -> Seq("lol", "omg", "gonna", "wanna", "haha"))
    val fill = Seq("the", "a", "of", "and", "is", "to")
    def doc(words: Seq[String]): String =
      Seq.fill(20)(if (rnd.nextBoolean()) words(rnd.nextInt(words.size))
      else fill(rnd.nextInt(fill.size))).mkString(" ")
    val classes = vocab.keys.toSeq.sorted
    val rows = (0 until 600).map { i =>
      val cls = classes((i / 2) % 3)
      (i.toLong, doc(vocab(cls)), cls)
    }
    val df = rows.toDF("id", "text", "domain")
    // charDim = 0 pins the word-lane-only path (the char lane has its
    // own reference test below).
    val model = TextOps.trainDomainModel(
      df.where(col("id") % 2 === 0), "text", "domain", dim = 128,
      charDim = 0)
    assert(model.labels.toSeq === classes)
    val scored = df.where(col("id") % 2 === 1)
      .select(col("text"), col("domain"),
        TextOps.domainPredict(col("text"), model).as("p"),
        array(log1p(TextOps.tokenCount(col("text")).cast("double")),
          TextOps.avgWordLen(col("text")), TextOps.typeTokenRatio(col("text")),
          TextOps.stopwordFraction(col("text"))).as("aux"))
      .select(col("text"), col("domain"), col("p.pred"), col("p.prob"), col("aux"))
      .collect()
    scored.foreach { r =>
      val (pred, prob) = refMulti(r.getSeq[Double](4),
        r.getString(0).trim.split("\\s+").toSeq,
        model.weights, model.hashDim, model.intercepts)
      assert(r.getInt(2) === pred && r.getDouble(3) === prob)
    }
    val acc = scored.count(r => model.labels(r.getInt(2)) == r.getString(1))
      .toDouble / scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // Artifact lifecycle: save -> supersede -> use_last vs pinned
    // rollback, serving equality from the rolled-back artifact.
    val store = new graft.store.Store(spark, TempDirs.create("graft_dmspec_"))
    TextOps.saveDomainModel(spark, store, "models/dom", model, externalKey = "v1")
    TextOps.saveDomainModel(spark, store, "models/dom",
      model.copy(weights = new Array[Double](model.weights.length)),
      externalKey = "v2")
    val last = TextOps.loadDomainModel(store, "models/dom")
    val rolled = TextOps.loadDomainModel(store, "models/dom", Some("v1"))
    assert(last.weights.forall(_ == 0d), "_last must serve the superseding artifact")
    assert(rolled.weights.sameElements(model.weights)
      && rolled.intercepts.sameElements(model.intercepts)
      && rolled.labels.sameElements(model.labels)
      && rolled.hashDim === model.hashDim)
    val both = df.limit(10).select(
      TextOps.domainPredict(col("text"), rolled).as("a"),
      TextOps.domainPredict(col("text"), model).as("b")).collect()
    both.foreach(r => assert(r.getStruct(0) === r.getStruct(1)))
  }

  test("trainQualityModel separates its labels; expression scoring == in-memory model application") {
    import spark.implicits._
    // Separable-by-vocabulary synthetic corpus: good docs draw from one
    // word set, bad docs from another, with shared filler.
    val rnd = new scala.util.Random(7)
    val good = Seq("science", "method", "result", "observed", "theory")
    val bad = Seq("click", "winner", "free", "pills", "casino")
    val fill = Seq("the", "a", "of", "and", "is", "to")
    def doc(words: Seq[String]): String =
      Seq.fill(20)(if (rnd.nextBoolean()) words(rnd.nextInt(words.size))
      else fill(rnd.nextInt(fill.size))).mkString(" ")
    // class = (i/2) % 2, NOT i % 2: the train/test split below is by id
    // parity, and class ≡ parity would put ONE class in each half.
    val rows = (0 until 400).map { i =>
      val y = (i / 2) % 2
      (i.toLong, if (y == 1) doc(good) else doc(bad), y)
    }
    val df = rows.toDF("id", "text", "y")
    val model = TextOps.trainQualityModel(df.where(col("id") % 2 === 0), "text",
      dim = 128, label = Some(col("y") === 1))
    // Fetch the aux features Spark computes, so the in-memory mirror
    // tests the expression arithmetic, not a re-derivation of the stats.
    val scored = df.where(col("id") % 2 === 1)
      .select(col("text"), col("y"),
        TextOps.qualityModelScore(col("text"), model).as("p"),
        array(log1p(TextOps.tokenCount(col("text")).cast("double")),
          TextOps.avgWordLen(col("text")), TextOps.typeTokenRatio(col("text")),
          TextOps.stopwordFraction(col("text"))).as("aux"))
      .collect()
    // Expression scoring is exactly the in-memory model application.
    scored.foreach { r =>
      val exp = refScore(r.getSeq[Double](3), r.getString(0).trim.split("\\s+").toSeq,
        model.weights, model.hashDim, model.intercept)
      assert(r.getDouble(2) === exp)
    }
    // And the model actually separates: every held-out doc on the right
    // side of 0.5 (the corpus is linearly separable by construction).
    val acc = scored.count(r => (r.getDouble(2) >= 0.5) == (r.getInt(1) == 1))
      .toDouble / scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
  }

  test("binaryAuc: exact on a hand-checkable ranking, null on a single class") {
    import spark.implicits._
    // scores 0.1..0.8; labels: the top half positive except one swap —
    // hand AUC: positives {0.8,0.7,0.6,0.4}, negatives {0.5,0.3,0.2,0.1}
    // pairs won = 4+4+4+3 = 15 of 16 -> 0.9375.
    val df = Seq(
      (0.8, 1d), (0.7, 1d), (0.6, 1d), (0.5, 0d),
      (0.4, 1d), (0.3, 0d), (0.2, 0d), (0.1, 0d)).toDF("p", "y")
    val auc = TextOps.binaryAuc(df, "p", "y").as[Double].head()
    assert(math.abs(auc - 0.9375) < 1e-12)
    val one = Seq((0.8, 1d), (0.2, 1d)).toDF("p", "y")
    assert(TextOps.binaryAuc(one, "p", "y").head().isNullAt(0))
  }

  test("quality-model artifact lifecycle: save -> supersede -> use_last vs pinned rollback") {
    import spark.implicits._
    val store = new graft.store.Store(spark, TempDirs.create("graft_qmspec_"))
    // 4 aux weights + hashDim hashed weights — the layout
    // qualityModelScore serves (it always passes the 4 engineered
    // stats; hashed_token_logit rejects any other aux arity as
    // train/serve drift since r14).
    val m1 = TextOps.QualityModel(Array(0.5, -0.25, 1.5, 0.3, -1.0, 0.9), -0.75, 2)
    val m2 = TextOps.QualityModel(Array(9.0, 9.0, 9.0, 9.0, 9.0, 9.0), 0.0, 2)
    TextOps.saveQualityModel(spark, store, "quality/model", m1, externalKey = "v1")
    TextOps.saveQualityModel(spark, store, "quality/model", m2, externalKey = "v2")
    val last = TextOps.loadQualityModel(store, "quality/model")
    val rolled = TextOps.loadQualityModel(store, "quality/model", Some("v1"))
    assert(last.weights.toSeq === m2.weights.toSeq)
    assert(rolled.weights.toSeq === m1.weights.toSeq
      && rolled.intercept === m1.intercept && rolled.hashDim === m1.hashDim)
    // served scores from the rolled-back artifact == original model
    val got = Seq("a b", "").toDF("text")
      .select(TextOps.qualityModelScore(col("text"), rolled),
        TextOps.qualityModelScore(col("text"), m1)).collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("tokenizer artifact lifecycle: save -> supersede -> use_last vs pinned rollback") {
    val store = new graft.store.Store(spark, TempDirs.create("graft_tokspec_"))
    val d = Tables.read(spark, sf(), "documents")
    val m5 = TextOps.bpeTrain(d, "text", numMerges = 5)
    val fresh = m5.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    TextOps.saveBpeMerges(store, "tok/merges", m5, externalKey = "v1")
    // supersede with a 2-merge artifact
    TextOps.saveBpeMerges(store, "tok/merges",
      TextOps.bpeTrain(d.limit(50), "text", numMerges = 2), externalKey = "v2")
    val last = TextOps.loadBpeMerges(store, "tok/merges")
    val rolled = TextOps.loadBpeMerges(store, "tok/merges", Some("v1"))
    assert(last.size === 2, "_last must serve the superseding artifact")
    assert(rolled === fresh, "pinned read must return the original artifact")
    // serving from the rolled-back artifact == serving from fresh merges
    val viaStored = TextOps.bpeSegmentStats(d, "text", "source", rolled)
      .orderBy("source").collect().toSeq
    val viaFresh = TextOps.bpeSegmentStats(d, "text", "source", fresh)
      .orderBy("source").collect().toSeq
    assert(viaStored === viaFresh)
  }

  /** In-memory mirror of the char-n-gram lane: uses the SAME shared gram
    * iterator the kernels use (the bucket function IS the contract; the
    * loop-order pin is the per-gram-outer / per-class-inner accumulation
    * below).
    */
  private def refCharBuckets(tok: String, n: Int, dim: Int): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    HashedTokenBucket.foreachCharNgramBucket(
      UTF8String.fromString(tok), n, dim)(out += _)
    out.result()
  }

  test("hashedCharNgramCounts matches the in-memory reference (grams, short tokens, unicode)") {
    import spark.implicits._
    val n = 3
    val dim = 64
    val got = texts.toDF("text")
      .select(VectorExpressions.hashedCharNgramCounts(
        TextOps.tokens(col("text")), n, dim))
      .as[Seq[Double]].collect()
    texts.zip(got).foreach { case (t, arr) =>
      assert(arr.length === dim)
      val toks = t.trim match {
        case "" => Seq.empty[String]; case s => s.split("\\s+").toSeq }
      val exp = new Array[Double](dim)
      toks.foreach(tok => refCharBuckets(tok, n, dim).foreach(exp(_) += 1d))
      assert(arr === exp.toSeq, s"char-gram counts mismatch for '$t'")
      // A token of L >= n code points yields L - n + 1 grams; shorter
      // tokens yield exactly one (themselves).
      val expGrams = toks.map(tok =>
        math.max(1, tok.codePointCount(0, tok.length) - n + 1)).sum
      assert(arr.sum === expGrams.toDouble, s"gram count for '$t'")
    }
  }

  test("char lane: serving == in-memory reference; unseen-vocab generalization") {
    import spark.implicits._
    // Two "languages" distinguishable ONLY by character shape: every
    // content word is unseen at test time (hashed whole-word buckets
    // carry no weight for it), but the suffix n-grams transfer. The
    // word-lane-only model cannot beat chance here; the char lane can.
    val rnd = new scala.util.Random(7)
    def word(suffix: String): String =
      (0 until 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString + suffix
    def doc(suffix: String): String =
      (0 until 15).map(_ => word(suffix)).mkString(" ")
    // EQUAL-LENGTH suffixes: every aux stat (token count, avg word
    // length, ttr, stopword fraction) is identical across classes, so
    // neither the aux nor the word lane carries class signal for
    // unseen words — only the char grams do.
    val train = (0 until 400).map(i =>
      (i.toLong, doc(if (i % 2 == 0) "ius" else "oxa"),
        if (i % 2 == 0) "lat" else "grk"))
    val test = (1000 until 1200).map(i =>
      (i.toLong, doc(if (i % 2 == 0) "ius" else "oxa"),
        if (i % 2 == 0) "lat" else "grk"))
    val trainDf = train.toDF("id", "text", "lang")
    val testDf = test.toDF("id", "text", "lang")
    val charModel = TextOps.trainDomainModel(
      trainDf, "text", "lang", dim = 64, charDim = 128, charN = 3)
    val wordModel = TextOps.trainDomainModel(
      trainDf, "text", "lang", dim = 64, charDim = 0)
    def acc(m: TextOps.DomainModel): Double =
      testDf.select(
        when(TextOps.domainLabel(
          TextOps.domainPredict(col("text"), m).getField("pred"), m)
          === col("lang"), 1d).otherwise(0d).as("hit"))
        .agg(avg("hit")).head().getDouble(0)
    val charAcc = acc(charModel)
    val wordAcc = acc(wordModel)
    assert(charAcc >= 0.95, s"char-lane accuracy $charAcc on unseen vocab")
    assert(wordAcc <= 0.75,
      s"word-only model should NOT generalize to unseen vocab (got $wordAcc)" +
        " — if it does, this fixture no longer isolates the char lane")
    // Bit-for-bit serving pin with the lane on: kernel == in-memory
    // reference sharing loop order (aux, word bucket, then char grams
    // per token).
    def refMultiChar(aux: Seq[Double], toks: Seq[String],
        m: TextOps.DomainModel): (Int, Double) = {
      val k = m.intercepts.length
      val stride = m.weights.length / k
      val nAux = stride - m.hashDim - m.charDim
      val z = m.intercepts.clone()
      var i = 0
      while (i < nAux) {
        var c = 0
        while (c < k) { z(c) += aux(i) * m.weights(c * stride + i); c += 1 }
        i += 1
      }
      toks.foreach { t =>
        val bk = nAux + refBucket(t, m.hashDim)
        var c = 0
        while (c < k) { z(c) += m.weights(c * stride + bk); c += 1 }
        refCharBuckets(t, m.charN, m.charDim).foreach { g =>
          var cc = 0
          while (cc < k) {
            z(cc) += m.weights(cc * stride + nAux + m.hashDim + g); cc += 1 }
        }
      }
      var best = 0
      var c = 1
      while (c < k) { if (z(c) > z(best)) best = c; c += 1 }
      var denom = 0d
      c = 0
      while (c < k) { denom += math.exp(z(c) - z(best)); c += 1 }
      (best, 1d / denom)
    }
    val scored = testDf.limit(40)
      .select(col("text"),
        TextOps.domainPredict(col("text"), charModel).as("p"),
        array(log1p(TextOps.tokenCount(col("text")).cast("double")),
          TextOps.avgWordLen(col("text")), TextOps.typeTokenRatio(col("text")),
          TextOps.stopwordFraction(col("text"))).as("aux"))
      .select(col("text"), col("p.pred"), col("p.prob"), col("aux")).collect()
    scored.foreach { r =>
      val (pred, prob) = refMultiChar(r.getSeq[Double](3),
        r.getString(0).trim.split("\\s+").toSeq, charModel)
      assert(r.getInt(1) === pred && r.getDouble(2) === prob)
    }
    // Lifecycle carries the lane: store round-trip preserves char dims
    // and serves identically.
    val store = new graft.store.Store(spark, TempDirs.create("graft_dmchar_"))
    TextOps.saveDomainModel(spark, store, "models/domc", charModel,
      externalKey = "v1")
    val back = TextOps.loadDomainModel(store, "models/domc", Some("v1"))
    assert(back.charDim === charModel.charDim && back.charN === charModel.charN)
    val both = testDf.limit(10).select(
      TextOps.domainPredict(col("text"), back).as("a"),
      TextOps.domainPredict(col("text"), charModel).as("b")).collect()
    both.foreach(r => assert(r.getStruct(0) === r.getStruct(1)))
  }
}
