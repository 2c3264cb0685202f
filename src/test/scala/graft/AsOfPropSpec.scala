package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.AsOfJoin

/** Property test for the as-of hot-key bucketing: for ANY data and ANY
  * bucket width, the bucketed path must equal the unbucketed path in
  * every direction, with and without tolerance. The carry-row stitching
  * is the most boundary-condition-prone code in the operator surface
  * (empty buckets, matches many buckets away, ties at bucket edges),
  * and random (data, width) pairs hit exactly those shapes.
  */
object AsOfPropSpec extends Properties("AsOfJoin.bucketWidth") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  // Small ts domain on purpose: forces heavy (key, ts) collisions, so
  // the tie-break rules are exercised on every run.
  private val genLeft: Gen[Seq[(Long, Long, Long)]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, for {
      key <- Gen.chooseNum(0L, 2L)
      ts <- Gen.chooseNum(0L, 400L)
    } yield (key, ts, 0L))).map(_.zipWithIndex.map { case ((k, t, _), i) => (i.toLong, k, t) })

  private val genRight: Gen[Seq[(Long, Long, Long)]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, for {
      key <- Gen.chooseNum(0L, 2L)
      ts <- Gen.chooseNum(0L, 400L)
    } yield (key, ts, 0L))).map(_.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) })

  private val genWidth: Gen[Double] = Gen.oneOf(1d, 7d, 50d, 130d, 401d, 1000d)
  private val genTol: Gen[Option[Double]] = Gen.oneOf(None, Some(25d), Some(90d))

  property("bucketed == unbucketed for every direction and tolerance") =
    Prop.forAllNoShrink(genLeft, genRight, genWidth, genTol) { (l, r, width, tol) =>
      import spark.implicits._
      val left = l.toDF("lid", "k", "ts")
      val right = r.toDF("k", "ts", "pid")
      type Dir = (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        Seq[String], String, String, Seq[String], Option[String], Option[Double],
        Option[Double]) => org.apache.spark.sql.DataFrame
      val dirs: Seq[Dir] = Seq(AsOfJoin.backward, AsOfJoin.forward, AsOfJoin.nearest)
      dirs.forall { dir =>
        def run(bw: Option[Double]) =
          dir(left, right, Seq("k"), "ts", "ts", Seq("pid"), Some("pid"), tol, bw)
            .orderBy("lid").collect().toSeq
        run(Some(width)) == run(None)
      }
    }
}
