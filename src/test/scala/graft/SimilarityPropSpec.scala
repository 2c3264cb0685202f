package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.Similarity

/** Property pins for the margin bitext miner (qn113): the exact leg is
  * reproduced bit-for-bit by an in-memory reference that mirrors the
  * documented float-op sequence — per-element float→double cast,
  * sequential L2 normalize and dot (the kernels' loop order), 6dp
  * HALF_UP sims, (sim desc, id) top-k, DECIMAL(·,6) neighbor sums,
  * per-side avg then one final division, 6dp margin, (margin desc, id)
  * argmax, threshold cut. Small integer-grid vectors on purpose:
  * cosine TIES happen every run, pinning both tie-breaks.
  */
object SimilarityPropSpec extends Properties("Similarity.reference") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def norm(v: Array[Float]): Array[Double] = {
    val d = v.map(_.toDouble)
    var ss = 0d
    var i = 0
    while (i < d.length) { ss += d(i) * d(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0d) d.map(_ => 0d) else d.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0d
    var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }

  private def refPairs(
      src: Seq[(Long, Array[Float])],
      tgt: Seq[(Long, Array[Float])],
      k: Int,
      threshold: Double): Set[(Long, Long, Double, Double)] = {
    val sn = src.map { case (id, v) => id -> norm(v) }
    val tn = tgt.map { case (id, v) => id -> norm(v) }
    def topk(q: Array[Double], corpus: Seq[(Long, Array[Double])], qid: Long) =
      corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, r6(dot(q, v))) }
        .sortBy { case (id, sim) => (-sim, id) }.take(k)
    val fwd = sn.map { case (sid, q) => sid -> topk(q, tn, sid) }.toMap
    val bwd = tn.map { case (tid, q) => tid -> topk(q, sn, tid) }.toMap
    def sumCnt(l: Seq[(Long, Double)]): (Double, Long) = {
      var s = java.math.BigDecimal.ZERO
      l.foreach { case (_, sim) =>
        s = s.add(new java.math.BigDecimal(sim.toString).setScale(6)) }
      (s.doubleValue(), l.size.toLong)
    }
    fwd.toSeq.flatMap { case (sid, cands) =>
      if (cands.isEmpty) None
      else {
        val (ss, cs) = sumCnt(cands)
        val scored = cands.flatMap { case (tid, sim) =>
          bwd.get(tid).filter(_.nonEmpty).map { bl =>
            val (st, ct) = sumCnt(bl)
            (tid, sim, r6(sim / ((ss / cs + st / ct) / 2)))
          }
        }
        scored.sortBy { case (tid, _, m) => (-m, tid) }.headOption
          .filter(_._3 >= threshold)
          .map { case (tid, sim, m) => (sid, tid, sim, m) }
      }
    }.toSet
  }

  // Integer-grid components: repeated directions => exact cosine ties.
  private val genVec: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.oneOf(-1f, 0f, 1f, 2f)).map(_.toArray)

  private val genSide: Gen[Seq[(Long, Array[Float])]] =
    Gen.chooseNum(2, 9).flatMap(n => Gen.listOfN(n, genVec))
      .map(_.zipWithIndex.map { case (v, i) => (i.toLong * 3, v) })

  property("marginBitextPairs exact leg == in-memory reference (ties, counts, threshold)") =
    Prop.forAllNoShrink(genSide, genSide, Gen.chooseNum(1, 4),
      Gen.oneOf(0.9, 1.0, 1.05)) { (srcRows, tgtRows0, k, threshold) =>
      val s = spark
      import s.implicits._
      // Disjoint ids across sides (ids * 3 vs * 3 + 1).
      val tgtRows = tgtRows0.map { case (id, v) => (id + 1, v) }
      val src = srcRows.toDF("vec_id", "embedding")
      val tgt = tgtRows.toDF("vec_id", "embedding")
      val got = Similarity.marginBitextPairs(src, tgt, "vec_id", "embedding",
        k = k, threshold = threshold, maxExactRows = Long.MaxValue)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      val ref = refPairs(srcRows, tgtRows, k, threshold)
      Prop(got == ref) :| s"k=$k thr=$threshold got=$got ref=$ref"
    }
}
