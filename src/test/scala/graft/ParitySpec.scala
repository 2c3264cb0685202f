package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-9 pandas-parity queries (q60–q66) and
  * embedding-audit queries (qn74/qn75) — properties the DuckDB oracle
  * gate can't see (it only proves Spark ≡ DuckDB on one fixture), pinned
  * here on structural grounds: closed-form expectations, internal
  * consistency between rank methods, and conservation totals.
  */
class ParitySpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("q60 ewma: first row of each user series equals its raw value") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .where(col("user_id") % 5 === 0)
    val firstIds = events
      .groupBy("user_id")
      .agg(min_by(struct(col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("f"))
      .select(col("f.event_id").as("event_id"),
        round(col("f.value"), 6).as("expect"))
    // With one observation the weighted mean IS the observation:
    // num = x·w^0, den = w^0.
    val got = q("q60_ewma").join(firstIds, "event_id")
      .where(col("ewma") =!= col("expect"))
    assert(got.count() == 0, "first-row ewma != raw value")
  }

  test("q60 ewma: steady-state of a constant series is the constant") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val const = (1 to 20).map(i =>
      (i.toLong, new java.sql.Timestamp(ts0.getTime + i * 1000L), 0L, "view", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = TempDirs.create("parity_ewma_").toString
    const.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q60_ewma")(spark, dir)
      .agg(min("ewma"), max("ewma")).head()
    assert(out.getDouble(0) == 7.5 && out.getDouble(1) == 7.5,
      s"constant series should smooth to itself, got $out")
  }

  test("q61 binning: bins partition the data; qcut quartiles are balanced") {
    val rows = q("q61_binning").collect()
    val orders = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
    val n = orders.count()
    assert(rows.map(_.getAs[Long]("n")).sum == n, "histogram loses rows")
    val byQ = rows.groupBy(_.getAs[Int]("qcut_bin")).view
      .mapValues(_.map(_.getAs[Long]("n")).sum)
    // ntile(4) balance: sizes differ by at most 1.
    assert(byQ.values.max - byQ.values.min <= 1, s"qcut unbalanced: $byQ")
    // Equal-width edges: every bucket's observed [lo,hi] stays inside
    // its bin's value range (bin = floor((x-mn)/w) clamped).
    val (mn, mx) = {
      val r = orders.agg(min("o_totalprice"), max("o_totalprice")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val w = (mx - mn) / 10.0
    rows.foreach { r =>
      val b = r.getAs[Int]("cut_bin")
      val lo = r.getAs[Double]("lo"); val hi = r.getAs[Double]("hi")
      assert(lo >= mn + b * w - 0.01 && (b == 9 || hi <= mn + (b + 1) * w + 0.01),
        s"bucket $b holds values outside its edges: [$lo,$hi]")
    }
  }

  test("q62 one-hot: exactly one indicator fires per row") {
    val bad = q("q62_one_hot")
      .where(col("seg_automobile") + col("seg_building") + col("seg_furniture")
        + col("seg_household") + col("seg_machinery") =!= 1)
    assert(bad.count() == 0, "a row has zero or multiple dummies set")
  }

  test("q63 value_counts: shares are a probability distribution") {
    val rows = q("q63_value_counts").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == spark.read.parquet(s"${sf("sf0.001")}/events.parquet").count())
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // Descending by count.
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sorted.reverse), "not sorted by count desc")
  }

  test("q64 rank methods agree with pandas-documented identities") {
    val rows = q("q64_rank_methods").collect()
    val n = rows.length
    assert(n > 0)
    // method='first' is a permutation of 1..n.
    assert(rows.map(_.getAs[Int]("r_first")).sorted.sameElements(1 to n))
    // average rank identity: sum of r_avg over all rows = n(n+1)/2
    // (each method redistributes the same total rank mass).
    val avgSum = rows.map(_.getAs[Double]("r_avg")).sum
    assert(math.abs(avgSum - n * (n + 1) / 2.0) < 1e-6,
      s"rank mass $avgSum != ${n * (n + 1) / 2.0}")
    rows.foreach { r =>
      val rMin = r.getAs[Int]("r_min"); val rAvg = r.getAs[Double]("r_avg")
      val rDense = r.getAs[Int]("r_dense"); val rFirst = r.getAs[Int]("r_first")
      assert(rAvg >= rMin && rDense <= rMin && rFirst >= rMin,
        s"rank ordering violated: min=$rMin avg=$rAvg dense=$rDense first=$rFirst")
    }
  }

  test("q65 pct_change: reconstructible from consecutive day values") {
    val rows = q("q65_pct_change").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      assert(rs.head.isNullAt(rs.head.fieldIndex("diff")),
        "first day of a series must have null diff")
      rs.sliding(2).foreach {
        case Array(prev, cur) =>
          val d = cur.getAs[Double]("day_value") - prev.getAs[Double]("day_value")
          assert(math.abs(cur.getAs[Double]("diff") - d) < 1e-3,
            s"diff mismatch: ${cur.getAs[Double]("diff")} vs $d")
        case _ =>
      }
    }
  }

  test("q66 group sample: exactly min(5, group size) per source, stable under rerun") {
    val a = q("q66_group_sample").collect()
    val sizes = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      assert(rs.length == math.min(5L, sizes(src)),
        s"$src sampled ${rs.length} of ${sizes(src)}")
    }
    val b = q("q66_group_sample").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "sample not deterministic across reruns")
  }

  test("q67 rolling corr matches a driver-side recomputation") {
    val got = q("q67_rolling_corr").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("corr_30d"))
      .toMap
    assert(got.nonEmpty)
    // Brute recomputation of the same contract from the raw events.
    val daily = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "click", col("value"))).as("x"),
        sum(when(col("event_type") === "purchase", col("value"))).as("y"))
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        Option(r.get(1)).fold(0.0)(_.toString.toDouble),
        Option(r.get(2)).fold(0.0)(_.toString.toDouble)))
    daily.indices.drop(29).foreach { i =>
      val win = daily.slice(i - 29, i + 1)
      val n = win.length.toDouble
      val (sx, sy) = (win.map(_._2).sum, win.map(_._3).sum)
      val sxy = win.map(t => t._2 * t._3).sum
      val sxx = win.map(t => t._2 * t._2).sum
      val syy = win.map(t => t._3 * t._3).sum
      val c = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val day = daily(i)._1
      val g = got(day)
      if (!c.isNaN)
        assert(math.abs(g - c) < 1e-4, s"$day: got $g, brute $c")
    }
  }

  test("q68 autocorr: in [-1,1]; lag-0 sanity via brute recomputation") {
    val rows = q("q68_autocorr").collect()
    assert(rows.map(_.getAs[Int]("lag")).toSeq == Seq(1, 7))
    rows.foreach { r =>
      val a = r.getAs[Double]("autocorr")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"autocorr $a out of range")
    }
    // Brute lag-1 recomputation from the raw events.
    val daily = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum("value").as("v")).orderBy("day")
      .collect().map(_.getAs[Double]("v"))
    val (xs, ys) = (daily.dropRight(1), daily.drop(1))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val brute = (n * xs.zip(ys).map(t => t._1 * t._2).sum - sx * sy) /
      math.sqrt((n * xs.map(x => x * x).sum - sx * sx) *
        (n * ys.map(y => y * y).sum - sy * sy))
    assert(math.abs(rows(0).getAs[Double]("autocorr") - brute) < 1e-4,
      s"lag-1 ${rows(0).getAs[Double]("autocorr")} vs brute $brute")
  }

  test("qn74 cluster balance: assignment conserves the corpus; centroids self-assign") {
    val rows = q("qn74_cluster_balance").collect()
    val corpus = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == corpus, "vectors lost in assignment")
    rows.foreach { r =>
      val share = r.getAs[Double]("top_label_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Double]("avg_sim") <= 1.0 + 1e-9)
    }
    // Every centroid's own vector has cosine 1 with itself, so all 8
    // clusters are non-empty.
    assert(rows.length == 8, s"expected 8 clusters, got ${rows.length}")
  }

  test("qn77 dataset card: conserves the corpus and is consistent with the dedup layer") {
    val rows = q("qn77_dataset_card").collect()
    val d = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == d.count())
    rows.foreach { r =>
      Seq("pct_en", "dup_rate", "quality_pass_rate").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
      assert(r.getAs[Double]("p50_tokens") > 0.0)
    }
    // Σ source dup counts == corpus docs − normalized groups (each group
    // contributes exactly one anchor, wherever it lives).
    val dupDocs = rows.map(r =>
      math.round(r.getAs[Long]("n_docs") * r.getAs[Double]("dup_rate"))).sum
    val groups = d.select(
      md5(graft.ops.TextOps.normalizeForMatch(col("text")).cast("binary")))
      .distinct().count()
    assert(math.abs(dupDocs - (d.count() - groups)) <= rows.length,
      s"dup mass $dupDocs vs ${d.count() - groups} (rounding slack ${rows.length})")
  }

  test("qn75 embedding health: clean fixture and a poisoned frame both audited") {
    val rows = q("qn75_embedding_health").collect()
    val corpus = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == corpus)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_zero") == 0 && r.getAs[Long]("n_nan") == 0,
        "fixture should be clean")
      assert(r.getAs[Int]("min_dim") == r.getAs[Int]("max_dim"),
        "fixture dims should be uniform")
      assert(r.getAs[Double]("min_norm") > 0.0)
    }
    // Poisoned copy: one zero vector, one NaN vector, one short vector —
    // the audit must surface each in the right column.
    import spark.implicits._
    val dim = 8
    val bad = Seq(
      (0L, Array.fill(dim)(0.0f), 0),
      (1L, Array.fill(dim)(Float.NaN), 0),
      (2L, Array.fill(dim - 2)(1.0f), 0),
      (3L, Array.fill(dim)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = TempDirs.create("parity_health_").toString
    bad.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val audit = SparkEntry.queries("qn75_embedding_health")(spark, dir).head()
    assert(audit.getAs[Long]("n") == 4)
    assert(audit.getAs[Long]("n_zero") == 1, "zero vector missed")
    assert(audit.getAs[Long]("n_nan") == 1, "NaN vector missed")
    assert(audit.getAs[Int]("min_dim") == dim - 2 && audit.getAs[Int]("max_dim") == dim,
      "dim drift missed")
  }
}
