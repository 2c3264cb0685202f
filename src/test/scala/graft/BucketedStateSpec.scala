package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.store.BucketedState

/** The bucketed signature-state layout behind the incremental ingest
  * path: versioned write/read round-trips, the storage-partitioned join
  * plan (state side scans with NO Exchange), the restart re-registration
  * path, replay idempotence, compaction, and bit-equality of the sliced
  * incremental dedup against the single-frame op.
  */
class BucketedStateSpec extends SparkSpec {

  private def fsOf(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // force AQE to finalize
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("write/slice round-trip; state side of a join scans bucketed with no Exchange") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_rt_") + "/sigs"
    val state = (1 to 5000).map(i => (i.toLong, s"sh${i % 400}"))
      .toDF("id", "s")
    BucketedState.write(state, root, "b0", "s", numBuckets = 4)
    val slice = BucketedState.slice(spark, root, "b0")
    assert(slice.count() == 5000L)
    assert(BucketedState.versions(spark, root) == Seq("b0"))

    val batch = (1 to 500).map(i => (i.toLong + 100000L, s"sh${i % 400}"))
      .toDF("id", "s")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a shuffle-class join so the Exchange structure is visible.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = slice.as("p").join(batch.as("q"), col("p.s") === col("q.s"))
        .groupBy(col("p.id")).agg(count(lit(1)).as("n"))
      val plan = finalPlan(j)
      assert(plan.contains("Bucketed: true"), s"state scan not bucketed:\n$plan")
      // Exactly TWO exchanges: the batch side's join shuffle and the
      // final groupBy — the state side reads IN PLACE. (An unbucketed
      // state would add a third, state-sized one.)
      val exchanges = plan.split("\n").count(_.contains("Exchange"))
      assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("restart path: catalog drop re-registers from the sidecar, still bucketed") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_rr_") + "/sigs"
    val state = (1 to 1000).map(i => (i.toLong, s"w${i % 50}")).toDF("id", "s")
    BucketedState.write(state, root, "b0", "s", numBuckets = 4)
    // Simulate a fresh session: the in-memory catalog forgot the table.
    val path = new org.apache.hadoop.fs.Path(root, "v_b0").toString
    spark.sql(s"DROP TABLE ${BucketedState.tableName(path)}")
    val slice = BucketedState.slice(spark, root, "b0")
    assert(slice.count() == 1000L)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = slice.as("p")
        .join(state.limit(100).as("q"), col("p.s") === col("q.s"))
        .select(col("p.id"))
      assert(finalPlan(j).contains("Bucketed: true"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("version rewrite is replace (replay-idempotent); compact folds slices") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_cp_") + "/sigs"
    val v0 = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "s")
    BucketedState.write(v0, root, "b0", "s", numBuckets = 2)
    // Replayed batch rewrites its version: same rows, not doubled.
    BucketedState.write(v0, root, "b0", "s", numBuckets = 2)
    assert(BucketedState.slice(spark, root, "b0").count() == 100L)
    val v1 = (101 to 150).map(i => (i.toLong, s"a$i")).toDF("id", "s")
    BucketedState.write(v1, root, "b1", "s", numBuckets = 2)
    assert(BucketedState.versions(spark, root) == Seq("b0", "b1"))
    val before = BucketedState.slices(spark, root)
      .map(_.select("id").collect().map(_.getLong(0)).toSet)
      .reduce(_ ++ _)
    BucketedState.compact(spark, root, "c0", "s", numBuckets = 2)
    assert(BucketedState.versions(spark, root) == Seq("c0"))
    val after = BucketedState.slice(spark, root, "c0")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(after == before && after.size == 150)
  }

  test("replay after a crash in a FRESH session: debris cleared, write succeeds") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_cr_") + "/sigs"
    val v0 = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "s")
    // Simulate a crashed first attempt seen from a RESTARTED session:
    // data files landed in the version dir, the sidecar (written last)
    // did not, and the new session's catalog has no table entry. The
    // old write() then hit CTAS's non-empty-location refusal and the
    // stream was wedged forever.
    val path = new org.apache.hadoop.fs.Path(root, "v_b0")
    val f = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    v0.write.parquet(path.toString) // debris: data, no _bucketspec
    spark.sql(s"DROP TABLE IF EXISTS ${BucketedState.tableName(path.toString)}")
    assert(BucketedState.versions(spark, root).isEmpty) // not readable yet
    BucketedState.write(v0, root, "b0", "s", numBuckets = 2)
    assert(BucketedState.versions(spark, root) == Seq("b0"))
    assert(BucketedState.slice(spark, root, "b0").count() == 100L)
    // Same shape for a crashed COMPLETE version being replayed from a
    // fresh session (sidecar present, catalog empty).
    spark.sql(s"DROP TABLE IF EXISTS ${BucketedState.tableName(path.toString)}")
    assert(f.exists(new org.apache.hadoop.fs.Path(path, "_bucketspec")))
    BucketedState.write(v0, root, "b0", "s", numBuckets = 2)
    assert(BucketedState.slice(spark, root, "b0").count() == 100L)
  }

  test("compact crash windows: no reader ever sees a doc in two slices; replay heals") {
    import spark.implicits._
    def fsOf(p: org.apache.hadoop.fs.Path) =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ids(root: String): Seq[Long] = BucketedState.slices(spark, root)
      .map(_.select("id").collect().map(_.getLong(0)).toSeq)
      .foldLeft(Seq.empty[Long])(_ ++ _) // with multiplicity: catches double-count
    def setup(tag: String): String = {
      val root = TempDirs.create(s"graft_bstate_$tag") + "/sigs"
      val v0 = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "s")
      val v1 = (101 to 150).map(i => (i.toLong, s"a$i")).toDF("id", "s")
      BucketedState.write(v0, root, "b0", "s", numBuckets = 2)
      BucketedState.write(v1, root, "b1", "s", numBuckets = 2)
      root
    }
    val expect = (1 to 150).map(_.toLong)

    // Window 1: crash AFTER the staged fold's data landed (and the
    // manifest with it), BEFORE the sidecar publish. The old slices must
    // still be the one live set; the staged successor is invisible.
    val rootA = setup("cwA_")
    val succA = new org.apache.hadoop.fs.Path(rootA, "v_c0")
    (1 to 150).map(i => (i.toLong, s"a$i")).toDF("id", "s")
      .write.parquet(succA.toString) // staged data, NO _bucketspec
    val manA = new org.apache.hadoop.fs.Path(rootA, "_compaction")
    val outA = fsOf(manA).create(manA, true)
    outA.write("successor=c0\nretired=b0,b1".getBytes("UTF-8")); outA.close()
    assert(BucketedState.versions(spark, rootA) == Seq("b0", "b1"))
    assert(ids(rootA).sorted == expect, "pending manifest must change nothing")
    spark.sql(s"DROP TABLE IF EXISTS ${BucketedState.tableName(succA.toString)}")
    BucketedState.compact(spark, rootA, "c0", "s", numBuckets = 2) // replay
    assert(BucketedState.versions(spark, rootA) == Seq("c0"))
    assert(ids(rootA).sorted == expect)
    assert(!fsOf(manA).exists(manA), "manifest must be gone after replay")

    // Window 2: crash AFTER the sidecar publish, BEFORE the old subtrees
    // were removed — the r15 verdict's defect. Both the folded slice AND
    // the originals are sidecar-complete on disk; the manifest must keep
    // exactly ONE of them live (the successor), never both.
    val rootB = setup("cwB_")
    val all = (1 to 150).map(i => (i.toLong, s"a$i")).toDF("id", "s")
    BucketedState.write(all, rootB, "c0", "s", numBuckets = 2)
    val manB = new org.apache.hadoop.fs.Path(rootB, "_compaction")
    val outB = fsOf(manB).create(manB, true)
    outB.write("successor=c0\nretired=b0,b1".getBytes("UTF-8")); outB.close()
    assert(BucketedState.versions(spark, rootB) == Seq("c0"),
      "published compaction must hide the retired slices")
    assert(ids(rootB).sorted == expect, "no doc may appear in two slices")
    // Partial retirement (b0 already deleted) is the same read state.
    val b0B = new org.apache.hadoop.fs.Path(rootB, "v_b0")
    spark.sql(s"DROP TABLE IF EXISTS ${BucketedState.tableName(b0B.toString)}")
    fsOf(b0B).delete(b0B, true)
    assert(BucketedState.versions(spark, rootB) == Seq("c0"))
    // Replaying the SAME compaction label heals instead of throwing or
    // folding the duplicates in (the old code did one of each).
    BucketedState.compact(spark, rootB, "c0", "s", numBuckets = 2)
    assert(BucketedState.versions(spark, rootB) == Seq("c0"))
    assert(ids(rootB).sorted == expect)
    assert(!fsOf(manB).exists(manB))
    val b1B = new org.apache.hadoop.fs.Path(rootB, "v_b1")
    assert(!fsOf(b1B).exists(b1B), "retired dir must be physically gone")

    // And the thing the contract protects: an ingest against the healed
    // state equals the ingest against the never-crashed one-shot state.
    val baseDocs = (0L until 6L).map(i =>
      (i, s"alpha beta gamma delta epsilon tag$i")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon tag0"), // near-dup of doc 0
      (11L, "totally novel content words here")).toDF("doc_id", "text")
    val sig = graft.ops.Dedup.shingleSignatures(baseDocs, "doc_id", "text")
    val rootC = TempDirs.create("graft_bstate_cwC_") + "/sigs"
    BucketedState.write(sig.where(col("id") < 3L), rootC, "b0", "s", 2)
    BucketedState.write(sig.where(col("id") >= 3L), rootC, "b1", "s", 2)
    BucketedState.write(sig, rootC, "c0", "s", 2) // staged fold, published…
    val manC = new org.apache.hadoop.fs.Path(rootC, "_compaction")
    val outC = fsOf(manC).create(manC, true)
    outC.write("successor=c0\nretired=b0,b1".getBytes("UTF-8")); outC.close()
    val viaCrashed = graft.ops.Dedup.dedupIncrementalSliced(fresh,
      BucketedState.slices(spark, rootC), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = graft.ops.Dedup.dedupIncremental(fresh, sig,
      "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaCrashed == oneShot && oneShot == Set(11L),
      s"crashed-compaction state diverged: $viaCrashed vs $oneShot")
  }

  test("compact lease: second compactor and interleaved writer fail loudly; stale lease stolen") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_ls_") + "/sigs"
    val v0 = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "s")
    val v1 = (101 to 150).map(i => (i.toLong, s"a$i")).toDF("id", "s")
    BucketedState.write(v0, root, "b0", "s", numBuckets = 2)
    BucketedState.write(v1, root, "b1", "s", numBuckets = 2)
    // Another compactor holds a FRESH lease: a second compact must not
    // reach the fold (double-publish), and a live ingest writer must not
    // land a slice the in-flight fold can't know about (the
    // manual-compact-vs-live-stream race) — both fail loudly instead.
    val lease = new org.apache.hadoop.fs.Path(root, ".compact_lease")
    val f = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(lease, false)
    out.write("other-token".getBytes("UTF-8")); out.close()
    val e1 = intercept[IllegalStateException] {
      BucketedState.compact(spark, root, "c0", "s", numBuckets = 2)
    }
    assert(e1.getMessage.contains("already being compacted"))
    val e2 = intercept[IllegalStateException] {
      BucketedState.write(v0, root, "b2", "s", numBuckets = 2)
    }
    assert(e2.getMessage.contains("compaction holds the lease"))
    assert(BucketedState.versions(spark, root) == Seq("b0", "b1")) // untouched
    // A STALE lease is a crashed compactor's: the next compact steals it
    // and proceeds; release deletes the lease so writers resume.
    f.setTimes(lease,
      System.currentTimeMillis() - graft.store.BucketedState.LeaseTtlMs - 60000L, -1)
    BucketedState.compact(spark, root, "c0", "s", numBuckets = 2)
    assert(BucketedState.versions(spark, root) == Seq("c0"))
    assert(!f.exists(lease))
    BucketedState.write(v0, root, "b2", "s", numBuckets = 2)
    assert(BucketedState.versions(spark, root) == Seq("b2", "c0"))
  }

  test("leaseInfo + forceReleaseLease: refused on a live lease, allowed on a stale one (r18)") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_fr_") + "/sigs"
    BucketedState.write((1 to 20).map(i => (i.toLong, s"a$i")).toDF("id", "s"),
      root, "b0", "s", numBuckets = 2)
    // No lease: info None, force-release a no-op.
    assert(BucketedState.leaseInfo(spark, root).isEmpty)
    assert(!BucketedState.forceReleaseLease(spark, root))
    // A FRESH lease (heartbeating holder): visible to the operator,
    // refused by the escape hatch — yanking it would abort a live fold.
    val lease = new org.apache.hadoop.fs.Path(root, ".compact_lease")
    val f = fsOf(lease)
    val out = f.create(lease, false)
    out.write("holder-token".getBytes("UTF-8")); out.close()
    val live = BucketedState.leaseInfo(spark, root).get
    assert(!live.stale && live.holderToken == "holder-token" &&
      live.ageMs < graft.store.BucketedState.LeaseTtlMs)
    val e = intercept[IllegalStateException] {
      BucketedState.forceReleaseLease(spark, root)
    }
    assert(e.getMessage.contains("FRESH"), e.getMessage)
    assert(f.exists(lease))
    // Stale (holder dead past the TTL): info says stealable, the
    // escape hatch releases immediately, writers resume.
    f.setTimes(lease,
      System.currentTimeMillis() - graft.store.BucketedState.LeaseTtlMs - 60000L, -1)
    assert(BucketedState.leaseInfo(spark, root).get.stale)
    assert(BucketedState.forceReleaseLease(spark, root))
    assert(!f.exists(lease))
    BucketedState.write((21 to 30).map(i => (i.toLong, s"a$i")).toDF("id", "s"),
      root, "b1", "s", numBuckets = 2)
    assert(BucketedState.versions(spark, root) == Seq("b0", "b1"))
  }

  test("ownsLeaseRobust: survives a transiently unreadable lease, rejects a foreign token (r18)") {
    val root = TempDirs.create("graft_bstate_hb_")
    val lease = new org.apache.hadoop.fs.Path(root, ".compact_lease")
    val f = fsOf(lease)
    // Foreign token: confirmed loss, immediate false (no retry stall).
    val out = f.create(lease, false)
    out.write("someone-else".getBytes("UTF-8")); out.close()
    val t0 = System.nanoTime()
    assert(!graft.store.BucketedState.ownsLeaseRobust(spark, lease, "mine"))
    assert((System.nanoTime() - t0) / 1e6 < 1000,
      "confirmed foreign token must not burn the retry budget")
    // Momentarily MISSING lease (a TTL-stealer's rename-inspect-restore
    // window, or an IO flake): the r17 check concluded "lost" instantly
    // and the heartbeat died; the robust check retries into the restore.
    f.delete(lease, false)
    val restorer = new Thread(() => {
      Thread.sleep(400)
      val o = f.create(lease, false)
      o.write("mine".getBytes("UTF-8")); o.close()
    })
    restorer.start()
    assert(graft.store.BucketedState.ownsLeaseRobust(spark, lease, "mine"),
      "ownership must survive the transient unreadable window")
    restorer.join()
    // Persistently missing: concluded lost after the bounded retries.
    f.delete(lease, false)
    assert(!graft.store.BucketedState.ownsLeaseRobust(spark, lease, "mine"))
  }

  test("retire leaves a done-manifest: a reader's stale listing can never double-serve (r18)") {
    import spark.implicits._
    // The r17 residual race (ADVICE low): the fold is STAGED before the
    // pending manifest lands, so manifest-write -> sidecar-commit ->
    // dir-deletes -> manifest-delete are only a few metadata ops — a
    // reader could list retired dirs + the successor and find the
    // pending manifest gone on BOTH reads, double-counting every folded
    // row. r18's retire() RENAMES the manifest to _compaction_done
    // instead of deleting it; versions() consults it whenever no pending
    // manifest spans the listing. Reconstruct that reader's exact view
    // by hand: successor + retired dirs all sidecar-complete, no pending
    // manifest, done-manifest naming the retirement.
    val root = TempDirs.create("graft_bstate_dm_") + "/sigs"
    val rows = (1 to 60).map(i => (i.toLong, s"a$i")).toDF("id", "s")
    BucketedState.write(rows.where(col("id") <= 30), root, "b0", "s", 2)
    BucketedState.write(rows.where(col("id") > 30), root, "b1", "s", 2)
    BucketedState.write(rows, root, "m0", "s", 2) // the staged+published fold
    val done = new org.apache.hadoop.fs.Path(root, "_compaction_done")
    val out = fsOf(done).create(done, true)
    out.write("successor=m0\nretired=b0,b1".getBytes("UTF-8")); out.close()
    assert(BucketedState.versions(spark, root) == Seq("m0"),
      "stale listing must be filtered by the done-manifest")
    assert(BucketedState.family(spark, root).count() == 60L)
    // The real lifecycle writes it too: a completed compact leaves the
    // done tombstone behind (and no pending manifest).
    val root2 = TempDirs.create("graft_bstate_dm2_") + "/sigs"
    BucketedState.write(rows.where(col("id") <= 30), root2, "b0", "s", 2)
    BucketedState.write(rows.where(col("id") > 30), root2, "b1", "s", 2)
    BucketedState.compact(spark, root2, "c0", "s", numBuckets = 2)
    val f2 = fsOf(done)
    assert(f2.exists(new org.apache.hadoop.fs.Path(root2, "_compaction_done")))
    assert(!f2.exists(new org.apache.hadoop.fs.Path(root2, "_compaction")))
    assert(BucketedState.versions(spark, root2) == Seq("c0"))
    // Recycled-label guard: a NEW slice re-using a retired label must
    // not stay hidden by the tombstone — write() scrubs it.
    BucketedState.write(rows.where(col("id") <= 10), root2, "b0", "s", 2)
    assert(BucketedState.versions(spark, root2) == Seq("b0", "c0"))
    assert(BucketedState.family(spark, root2).count() == 70L)
  }

  test("family(exclude): a replayed batch reads the state minus its own slice (r18)") {
    import spark.implicits._
    // The replay-read discipline behind dedupBatchAgainstStore: a
    // half-committed batch re-runs with its own stale slice still live;
    // its freq/count contribution is re-supplied fresh, so the family
    // read must serve state-minus-own or the batch double-counts
    // against the shingle hot cap (a shingle with prior df p and batch
    // df d, p + d <= cap < p + 2d, flips hot on replay only).
    val root = TempDirs.create("graft_bstate_fx_") + "/freqs"
    BucketedState.write(Seq(("a", 3L), ("b", 1L)).toDF("s", "df"),
      root, "b0", "s", 2)
    BucketedState.write(Seq(("a", 2L), ("c", 5L)).toDF("s", "df"),
      root, "b1", "s", 2)
    def sums(ex: Set[String]) =
      BucketedState.family(spark, root, exclude = ex)
        .groupBy("s").agg(org.apache.spark.sql.functions.sum("df").as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums(Set.empty) == Map("a" -> 5L, "b" -> 1L, "c" -> 5L))
    assert(sums(Set("b1")) == Map("a" -> 3L, "b" -> 1L),
      "the excluded slice must not contribute to the family aggregate")
    intercept[IllegalArgumentException] {
      BucketedState.family(spark, root, exclude = Set("b0", "b1"))
    }
  }

  test("compact replayed with a published label after NEW slices landed: error names recovery") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_rl_") + "/sigs"
    BucketedState.write((1 to 50).map(i => (i.toLong, s"a$i")).toDF("id", "s"),
      root, "b0", "s", numBuckets = 2)
    BucketedState.compact(spark, root, "c0", "s", numBuckets = 2)
    // New slices land, then an operator replays the OLD fold label: the
    // refusal is correct (the old fold's rows are live; folding them
    // "again" under the same name would be a no-op label collision) and
    // the message must say what to do instead of a bare "exists".
    BucketedState.write((51 to 80).map(i => (i.toLong, s"a$i")).toDF("id", "s"),
      root, "b1", "s", numBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      BucketedState.compact(spark, root, "c0", "s", numBuckets = 2)
    }
    assert(e.getMessage.contains("pick a NEW label"), e.getMessage)
  }

  test("dedupIncrementalSliced == dedupIncremental, any slicing of the state") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val uniq = "one two three four five six seven eight nine ten"
    val novel = "completely different words entirely fresh content arrives here now"
    val old = Seq(
      (0L, base), (1L, base + " lambda"), (2L, uniq),
      (3L, novel + " tail"), (4L, uniq + " extra")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, base + " lambda"), (11L, uniq), (12L, novel), (13L, novel)
    ).toDF("doc_id", "text")
    val sigAll = Dedup.shingleSignatures(old, "doc_id", "text")
    val single = Dedup.dedupIncremental(fresh, sigAll, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Slices partition the prior corpus BY DOC (the contract): any such
    // split must reproduce the single-frame result bit for bit.
    for (cut <- Seq(1L, 2L, 4L)) {
      val slices = Seq(
        sigAll.where(col("id") < cut), sigAll.where(col("id") >= cut))
      val sliced = Dedup.dedupIncrementalSliced(fresh, slices,
        "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sliced == single, s"cut=$cut sliced=$sliced single=$single")
    }
    // Empty state: the sliced op with no slices equals dedup against an
    // empty history (= one-shot dedup of the batch).
    val noState = Dedup.dedupIncrementalSliced(fresh, Seq.empty,
      "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = Dedup.dedupByJaccard(fresh, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(noState == oneShot)
    // And through the REAL layout: bucketed slices from disk.
    val root = TempDirs.create("graft_bstate_dd_") + "/sigs"
    BucketedState.write(sigAll.where(col("id") < 2L), root, "b0", "s", 2)
    BucketedState.write(sigAll.where(col("id") >= 2L), root, "b1", "s", 2)
    val viaDisk = Dedup.dedupIncrementalSliced(fresh,
      BucketedState.slices(spark, root), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaDisk == single)
  }

  test("freq slices: family aggregate + hot-set join run with ZERO state-side Exchange") {
    import spark.implicits._
    // Three overlapping per-batch frequency slices (same shingles across
    // slices — the shape that FORCES a summing fold) stored bucketed.
    val root = TempDirs.create("graft_bstate_fq_") + "/freqs"
    val mk = (off: Int) => (0 until 400).map(i => (s"sh${(i + off) % 500}", 1L + i % 3))
      .toDF("s", "df").groupBy("s").agg(sum("df").as("df"))
    val parts = Seq(mk(0), mk(100), mk(250))
    parts.zipWithIndex.foreach { case (p, i) =>
      BucketedState.write(p, root, s"b$i", "s", numBuckets = 4)
    }
    def stateAgg() = BucketedState.family(spark, root)
      .groupBy("s").agg(sum("df").as("df"))
    // Correctness: the family aggregate == union + groupBy sum, and the
    // compaction fold states the same frame.
    val expect = parts.reduce(_ unionByName _).groupBy("s")
      .agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stateAgg().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
    assert(Dedup.foldShingleFreqSlices(BucketedState.slices(spark, root))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // The vocabulary aggregate alone: ONE bucketed scan spanning all
      // three slice partitions, aggregated IN PLACE — the only Exchange
      // in the plan is the final count's single-partition agg.
      val foldPlan = {
        val f = stateAgg().groupBy().count()
        f.count()
        f.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      }
      // (That the scan spans all three slices is pinned by the
      // correctness assert above — 500 distinct shingles only exist
      // across the partitions; the plan shows one CatalogFileIndex.)
      assert(foldPlan.contains("Bucketed: true"),
        s"family read must scan bucketed:\n$foldPlan")
      assert(foldPlan.split("\n").count(_.contains("Exchange")) == 1,
        s"state aggregate must add no Exchange:\n$foldPlan")
      // The ingest's hot-set leg: state aggregate FULL OUTER batch
      // freqs. Exactly one more Exchange — the batch side; the
      // vocabulary state stays in place end to end.
      val batchFreqs = (0 until 50).map(i => (s"sh${i * 7 % 500}", 2L))
        .toDF("s", "df").groupBy("s").agg(sum("df").as("df"))
      val hot = Dedup.hotShingles(stateAgg(), batchFreqs,
        maxShingleDocFreq = 3L)
      val hotCount = hot.groupBy().count()
      hotCount.count()
      val hotPlan = hotCount.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val hotExchanges = hotPlan.split("\n").count(_.contains("Exchange"))
      assert(hotExchanges == 2,
        s"hot set must shuffle ONLY the batch side (+count agg), got " +
          s"$hotExchanges:\n$hotPlan")
      // And the hot SET is the prev∪batch sum over the cap.
      val hotSet = hot.collect().map(_.getString(0)).toSet
      val batchMap = batchFreqs.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expectHot = (expect.keySet ++ batchMap.keySet).filter(s =>
        expect.getOrElse(s, 0L) + batchMap.getOrElse(s, 0L) > 3L)
      assert(hotSet == expectHot)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("family refuses mixed bucket specs (a wrong trusted partitioning is silent)") {
    import spark.implicits._
    val root = TempDirs.create("graft_bstate_mx_") + "/freqs"
    BucketedState.write((1 to 50).map(i => (s"a$i", 1L)).toDF("s", "df"),
      root, "b0", "s", numBuckets = 2)
    BucketedState.write((1 to 50).map(i => (s"b$i", 1L)).toDF("s", "df"),
      root, "b1", "s", numBuckets = 4)
    val ex = intercept[IllegalArgumentException] {
      BucketedState.family(spark, root)
    }
    assert(ex.getMessage.contains("bucket spec"), ex.getMessage)
    // Per-slice reads are immune (each registers its own spec)…
    assert(BucketedState.slices(spark, root).map(_.count()).sum == 100L)
    // …and compacting to one spec unblocks the family read.
    BucketedState.compact(spark, root, "c0", "s", numBuckets = 4,
      fold = graft.ops.Dedup.foldShingleFreqSlices)
    assert(BucketedState.family(spark, root).count() == 100L)
  }

  test("prevSigCounts path == derived counts, hot-cap adjustment exact") {
    import spark.implicits._
    // The OpsSpec corpus-wide-cap fixture: the "spam" trigram crosses
    // the doc-freq cap only corpus-wide (4 old + 4 new > cap 6), and
    // whether docs 10/11 pair depends EXACTLY on the capped counts
    // (with the hot trigram Jaccard = 0.8 >= threshold; without, 7/9 <
    // threshold). If the raw-minus-hot-hits adjustment were off by one
    // shingle, doc 11's fate flips.
    val spam = "spam spam spam spam spam"
    def doc(tag: String) = s"$spam $tag"
    val old = Seq(
      (0L, doc("a1 a2 a3 a4")), (1L, doc("b1 b2 b3 b4")),
      (2L, doc("c1 c2 c3 c4")), (3L, doc("d1 d2 d3 d4"))).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, doc("w1 w2 w3 w4 w5 w6 w7 x9")),
      (11L, doc("w1 w2 w3 w4 w5 w6 w7 y9")),
      (12L, doc("e1 e2 e3 e4"))).toDF("doc_id", "text")
    val cap = 6L
    val sigAll = Dedup.shingleSignatures(old, "doc_id", "text")
    val slices = Seq(
      sigAll.where(col("id") < 2L), sigAll.where(col("id") >= 2L))
    val freqs = Some(Dedup.shingleDocFreqs(sigAll))
    def kept(counts: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.dedupIncrementalSliced(fresh, slices, "doc_id", "text",
        maxShingleDocFreq = cap, prevShingleFreqs = freqs,
        prevSigCounts = counts)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val derived = kept(None)
    val supplied = kept(Some(Dedup.shingleSignatureCounts(sigAll)))
    assert(derived == supplied && derived == Set(10L, 11L, 12L),
      s"derived=$derived supplied=$supplied (cap must spare doc 11)")
    // Cap off: the raw counts pass through unadjusted and doc 11 drops
    // (the hot trigram pushes the pair to 0.8).
    val uncapped = Dedup.dedupIncrementalSliced(fresh, slices,
      "doc_id", "text", maxShingleDocFreq = 0L,
      prevSigCounts = Some(Dedup.shingleSignatureCounts(sigAll)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uncapped == Set(10L, 12L), s"uncapped=$uncapped")
  }
}
