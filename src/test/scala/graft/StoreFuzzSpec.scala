package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.hadoop.CrashInjector
import graft.store.{BucketedState, Store}

/** Crash-schedule fuzzer for the store/state layer (VERDICT r18 #5).
  *
  * The store's durability protocols (staging-dir publish, `_last`
  * pointer, compaction leases, bucketed-state manifest/tombstone, fold
  * lifecycle) are rename-step state machines over the filesystem.
  * Rounds 15–18 found 17 real races in them ONE AT A TIME by
  * adversarial reading; this spec mechanizes the search: every mutating
  * filesystem operation under the fuzzed root is a potential KILL
  * POINT ([[graft.hadoop.CrashInjector]] — first `k` mutations succeed,
  * the (k+1)-th and every later one fail, modeling a process crash
  * where nothing more is ever written, cleanup included), and a
  * schedule is one protocol run killed at a random point, then
  * recovered the way the protocol documents (replay the op; TTL-steal a
  * crashed holder's lease by backdating its mtime — the clock is not
  * what's under test).
  *
  * Standing invariants asserted after EVERY schedule:
  *   - no partial table readable: every read surface (`get`,
  *     `getMerged`, `versions`/`slice`/`family`) either serves a
  *     complete pre-op or complete post-op state, never a torn one;
  *   - single-serving: no row is served from two places (the bucketed
  *     compaction swap is atomic — old slices and the folded successor
  *     are never BOTH live);
  *   - replay converges: rerunning the op after the crash (same labels)
  *     lands the exact post-op state.
  *
  * Schedule counts default to ~1000 across the six protocols
  * (GRAFT_FUZZ_SCHEDULES overrides the total); the RNG seed is fixed
  * so a red run replays. Fixtures are tiny (4-row frames) on purpose:
  * the protocols under test are metadata state machines — their step
  * DOMAIN, not their data volume, is the coverage target.
  */
class StoreFuzzSpec extends SparkSpec {

  private lazy val hconf = spark.sparkContext.hadoopConfiguration
  private val totalSchedules =
    sys.env.getOrElse("GRAFT_FUZZ_SCHEDULES", "1000").toInt
  private def share(weight: Double): Int =
    math.max(1, (totalSchedules * weight).toInt)

  private def frame(tag: Long): DataFrame = {
    import spark.implicits._
    (0L until 4L).map(i => (i, i + tag)).toDF("k", "v").coalesce(1)
  }
  private def rows(d: DataFrame): Seq[String] =
    d.select("k", "v").collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}")
      .sorted.toSeq
  private def expected(tag: Long): Seq[String] =
    (0L until 4L).map(i => s"$i:${i + tag}").sorted

  /** Run `op` with a crash injected after `k` mutations under `prefix`;
    * returns the thrown error, if any. The injector stays armed for the
    * whole call (later mutations keep failing — crash semantics) and is
    * disarmed before returning.
    */
  private def crashed(prefix: String, k: Int)(op: => Unit): Option[Throwable] = {
    CrashInjector.arm(prefix, k)
    try { op; None }
    catch { case t: Throwable => Some(t) }
    finally CrashInjector.disarm()
  }

  /** Count the mutation domain of `op` under `prefix` (no injection). */
  private def countMutations(prefix: String)(op: => Unit): Int = {
    CrashInjector.arm(prefix, Int.MaxValue)
    try { op; CrashInjector.mutationsSeen }
    finally CrashInjector.disarm()
  }

  /** Backdate every compaction-lease file directly under `dir` past its
    * TTL, simulating the wall-clock elapse that lets a recoverer steal a
    * crashed holder's lease (both Store and BucketedState leases share
    * the ".compact_lease" prefix).
    */
  private def backdateLeases(dir: String): Unit = {
    val p = new Path(dir)
    val f = p.getFileSystem(hconf)
    if (f.exists(p)) f.listStatus(p).foreach { st =>
      if (st.getPath.getName.startsWith(".compact_lease"))
        f.setTimes(st.getPath,
          System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
    }
  }

  private def quietly[A](body: => A): A = {
    // Injected failures make Spark log multi-screen ERROR stacks per
    // schedule; silence them for the fuzz loops only.
    spark.sparkContext.setLogLevel("OFF")
    try body finally spark.sparkContext.setLogLevel("WARN")
  }

  private val rnd = new scala.util.Random(20260817L)
  private def killPoint(domain: Int): Int = rnd.nextInt(domain + 2)

  // ------------------------------------------------------------------
  // Protocol 1: Store.load (staging publish + _last pointer)
  // ------------------------------------------------------------------
  test(s"fuzz: Store.load crash at any step serves v0 xor v1, replay converges") {
    val root = TempDirs.create("graft_fuzz_load_")
    val store = new Store(spark, root)
    val domain = countMutations(root) {
      store.load(frame(100L), "cnt/t", externalKey = "v1")
    }
    assert(domain > 3, s"load mutation domain unexpectedly small: $domain")
    val n = share(0.25)
    quietly {
      for (i <- 0 until n) {
        val name = s"fz/load_$i"
        store.load(frame(0L), name, externalKey = "v0")
        val k = killPoint(domain)
        crashed(root, k)(store.load(frame(100L), name, externalKey = "v1"))
        // No partial state on any read surface.
        val last = rows(store.get(name, useLast = true))
        assert(last == expected(0L) || last == expected(100L),
          s"schedule $i k=$k: torn last-version read: $last")
        val full = rows(store.get(name))
        assert(full == expected(0L) ||
          full == (expected(0L) ++ expected(100L)).sorted,
          s"schedule $i k=$k: torn accumulate read: $full")
        if (last == expected(100L))
          assert(full == (expected(0L) ++ expected(100L)).sorted,
            s"schedule $i k=$k: _last points at v1 but v1 not in history")
        assert(store.list(Some(name)).count(_.name == name) == 1)
        // Replay discipline: load is ACCUMULATE, so the caller checks
        // what landed before re-running. v1 present in history but
        // `_last` stale (the crash window between mergeMove and the
        // pointer write) → repair the POINTER (rollback — its documented
        // job); v1 absent → re-load. A blind re-load of published data
        // would legitimately append a second copy.
        if (full == (expected(0L) ++ expected(100L)).sorted) {
          if (last != expected(100L)) store.rollback(name, "v1")
        } else store.load(frame(100L), name, externalKey = "v1")
        assert(rows(store.get(name, useLast = true)) == expected(100L),
          s"schedule $i k=$k: replay did not serve v1")
        assert(rows(store.get(name)) == (expected(0L) ++ expected(100L)).sorted,
          s"schedule $i k=$k: v1 not served exactly once after recovery")
        // A LATER load must not resurrect crashed staging debris.
        store.load(frame(200L), name, externalKey = "v2")
        assert(rows(store.get(name)) ==
          (expected(0L) ++ expected(100L) ++ expected(200L)).sorted,
          s"schedule $i k=$k: later load disturbed by crash debris")
      }
    }
  }

  // ------------------------------------------------------------------
  // Protocol 2: Store.merge (CDC merge version)
  // ------------------------------------------------------------------
  test("fuzz: Store.merge crash serves pre xor post CDC state, replay converges") {
    import spark.implicits._
    val root = TempDirs.create("graft_fuzz_merge_")
    val store = new Store(spark, root)
    def updates: DataFrame =
      Seq((1L, 100L), (5L, 105L)).toDF("k", "v").coalesce(1)
    val preRows = expected(0L)
    val postRows = Seq("0:0", "1:100", "2:2", "3:3", "5:105").sorted
    // getMerged resolves each key from the HIGHEST version label, so
    // the delta label must sort above the base label ("b0" < "m1").
    locally {
      store.load(frame(0L), "cnt/m", externalKey = "b0")
    }
    val domain = countMutations(root) {
      store.merge(updates, "cnt/m", Seq("k"), externalKey = "m1")
    }
    val n = share(0.15)
    quietly {
      for (i <- 0 until n) {
        val name = s"fz/merge_$i"
        store.load(frame(0L), name, externalKey = "b0")
        val k = killPoint(domain)
        crashed(root, k)(store.merge(updates, name, Seq("k"), externalKey = "m1"))
        val got = rows(store.getMerged(name))
        assert(got == preRows || got == postRows,
          s"schedule $i k=$k: torn merged read: $got")
        store.merge(updates, name, Seq("k"), externalKey = "m1")
        assert(rows(store.getMerged(name)) == postRows,
          s"schedule $i k=$k: merge replay did not converge")
      }
    }
  }

  // ------------------------------------------------------------------
  // Protocol 3: Store.compact (physical rewrite, content-invariant)
  // ------------------------------------------------------------------
  test("fuzz: Store.compact crash never changes served content, replay completes") {
    val root = TempDirs.create("graft_fuzz_cpt_")
    val store = new Store(spark, root)
    locally {
      // Two loads into ONE version label → multiple files to compact.
      store.load(frame(0L), "cnt/c", externalKey = "v0")
      store.load(frame(50L), "cnt/c", externalKey = "v0")
    }
    val domain = countMutations(root) {
      store.compact("cnt/c", externalKey = Some("v0"))
    }
    val n = share(0.15)
    quietly {
      for (i <- 0 until n) {
        val name = s"fz/cpt_$i"
        store.load(frame(0L), name, externalKey = "v0")
        store.load(frame(50L), name, externalKey = "v0") // second file, same version
        val want = (expected(0L) ++ expected(50L)).sorted
        val k = killPoint(domain)
        crashed(root, k)(store.compact(name, externalKey = Some("v0")))
        // Post-crash reads either serve the EXACT content or refuse
        // LOUDLY (a kill inside the swap window leaves the version in
        // hidden staging — the read guard names the recovery instead of
        // silently serving fewer rows). Never a third state.
        val served =
          try Some(rows(store.get(name)))
          catch {
            case e: Store.GetError
                if e.getMessage.contains("mid-crashed-compaction-swap") =>
              None
          }
        served.foreach(s => assert(s == want,
          s"schedule $i k=$k: compact crash changed content: $s"))
        backdateLeases(s"$root/$name")
        // Replay heals the crashed swap first, then compacts.
        store.compact(name, externalKey = Some("v0"))
        assert(rows(store.get(name)) == want,
          s"schedule $i k=$k: compact replay changed content")
      }
    }
  }

  // ------------------------------------------------------------------
  // Protocol 4: Store.clone (staged copy + single publish rename)
  // ------------------------------------------------------------------
  test("fuzz: Store.clone crash leaves target absent xor complete") {
    val root = TempDirs.create("graft_fuzz_cln_")
    val store = new Store(spark, root)
    locally { store.load(frame(0L), "cnt/src", externalKey = "v0") }
    val domain = countMutations(root) { store.clone("cnt/src", "cnt/dst") }
    val n = share(0.15)
    quietly {
      for (i <- 0 until n) {
        val src = s"fz/clsrc_$i"
        val dst = s"fz/cldst_$i"
        store.load(frame(0L), src, externalKey = "v0")
        val k = killPoint(domain)
        crashed(root, k)(store.clone(src, dst))
        val published = store.list(Some(dst)).exists(_.name == dst)
        if (published)
          assert(rows(store.get(dst, useLast = true)) == expected(0L),
            s"schedule $i k=$k: published clone is partial")
        else {
          // Not published → recovery is simply cloning again.
          store.clone(src, dst)
          assert(rows(store.get(dst, useLast = true)) == expected(0L),
            s"schedule $i k=$k: clone replay did not converge")
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Protocol 5: BucketedState.write (bucketed slice + sidecar publish)
  // ------------------------------------------------------------------
  test("fuzz: BucketedState.write crash leaves version invisible xor complete") {
    val base = TempDirs.create("graft_fuzz_bsw_")
    val domain = countMutations(base) {
      BucketedState.write(frame(0L), s"$base/cnt", "b0", "k", numBuckets = 2)
    }
    val n = share(0.15)
    quietly {
      for (i <- 0 until n) {
        val root = s"$base/fz_$i"
        BucketedState.write(frame(0L), root, "b0", "k", numBuckets = 2)
        val k = killPoint(domain)
        crashed(base, k)(
          BucketedState.write(frame(100L), root, "b1", "k", numBuckets = 2))
        val vs = BucketedState.versions(spark, root).sorted
        assert(vs == Seq("b0") || vs == Seq("b0", "b1"),
          s"schedule $i k=$k: unexpected live set $vs")
        val want = if (vs == Seq("b0")) expected(0L)
          else (expected(0L) ++ expected(100L)).sorted
        assert(rows(BucketedState.family(spark, root)) == want,
          s"schedule $i k=$k: family read torn")
        // Replay the batch write (the streaming replay contract).
        backdateLeases(root)
        BucketedState.write(frame(100L), root, "b1", "k", numBuckets = 2)
        assert(BucketedState.versions(spark, root).sorted == Seq("b0", "b1"))
        assert(rows(BucketedState.family(spark, root)) ==
          (expected(0L) ++ expected(100L)).sorted,
          s"schedule $i k=$k: write replay did not converge")
      }
    }
  }

  // ------------------------------------------------------------------
  // Protocol 6: BucketedState.compact (fold + manifest + publish + retire)
  // ------------------------------------------------------------------
  test("fuzz: BucketedState.compact crash is single-serving, steal+replay converges") {
    val base = TempDirs.create("graft_fuzz_bsc_")
    val both = (expected(0L) ++ expected(100L)).sorted
    // Count the COMPACT's own mutation domain — the slice builds are
    // setup, not part of the schedule's kill-point space.
    val cntRoot = s"$base/cnt"
    BucketedState.write(frame(0L), cntRoot, "b0", "k", numBuckets = 2)
    BucketedState.write(frame(100L), cntRoot, "b1", "k", numBuckets = 2)
    val domain = countMutations(base) {
      BucketedState.compact(spark, cntRoot, "m0", "k", numBuckets = 2)
    }
    val n = share(0.15)
    quietly {
      for (i <- 0 until n) {
        val root = s"$base/fz_$i"
        BucketedState.write(frame(0L), root, "b0", "k", numBuckets = 2)
        BucketedState.write(frame(100L), root, "b1", "k", numBuckets = 2)
        val k = killPoint(domain)
        crashed(base, k)(
          BucketedState.compact(spark, root, "m0", "k", numBuckets = 2))
        // Single-serving: whatever the crash point, the live set serves
        // every row EXACTLY once — the swap is atomic, old slices and
        // the folded successor are never both live.
        val vs = BucketedState.versions(spark, root).sorted
        assert(vs == Seq("b0", "b1") || vs == Seq("m0"),
          s"schedule $i k=$k: mixed live set $vs")
        assert(rows(BucketedState.family(spark, root)) == both,
          s"schedule $i k=$k: family over $vs not single-serving")
        // Recovery: TTL elapses (backdate), a new compactor steals and
        // finishes (or redoes) the fold.
        backdateLeases(root)
        BucketedState.compact(spark, root, "m0", "k", numBuckets = 2)
        assert(BucketedState.versions(spark, root) == Seq("m0"),
          s"schedule $i k=$k: steal+replay did not finish the fold")
        assert(rows(BucketedState.family(spark, root)) == both,
          s"schedule $i k=$k: folded content wrong")
      }
    }
  }
}
