package graft.plans

import graft.SparkSuite

class ScaleSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {

  // replica temp dirs are per-run (concurrency-safe — ADVICE r7) and
  // cheap to rebuild at sf0.001, so delete them on suite exit instead of
  // accumulating /tmp garbage across CI runs
  private val replicaDirs = scala.collection.mutable.ArrayBuffer[String]()
  override def afterAll(): Unit = {
    replicaDirs.foreach { d =>
      val root = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    super.afterAll()
  }

  test("bucketed join plan has no shuffle Exchange between scan and join") {
    // force a sort-merge join (disable broadcast) to prove the bucketed
    // layout, not broadcast, is what eliminates the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.ScalePack.queries("sc2_bucketed_join")(spark, sf)
      val physical = df.queryExecution.executedPlan.toString
      val joinIdx = physical.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$physical")
      // the only exchange allowed in the whole plan is the final
      // aggregation's — the join inputs read bucketed scans directly
      val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
      assert(exchanges <= 1, s"bucketed join should not shuffle its inputs:\n$physical")
      assert(physical.contains("Bucketed: true"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted skew join shuffles on (key, salt) and equals the plain join") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = graft.queries.ScalePack.queries("sc8_salted_skew_join")(spark, sf)
      val physical = salted.queryExecution.executedPlan.toString
      // the join inputs must be hash-partitioned on BOTH the key and the
      // salt — that compound partitioning is what spreads a hot key
      assert("hashpartitioning\\(l_suppkey[^)]*salt".r.findFirstIn(physical).isDefined,
        s"fact side must shuffle on (l_suppkey, salt):\n$physical")
      val li = graft.Tables.lineitem(spark, sf)
      val sup = graft.Tables.supplier(spark, sf)
      val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      assert(salted.exceptAll(plain).count() === 0L)
      assert(plain.exceptAll(salted).count() === 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals plain aggregation") {
    import org.apache.spark.sql.functions._
    val salted = graft.queries.ScalePack.queries("sc1_salted_agg")(spark, sf)
    val plain = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }

  // ---- adaptive-LSH recall at the 10× replica (VERDICT r6 #6) -------------
  //
  // The n3/d10 recall frames assert their bounds at fixture scale, where the
  // adaptive knobs sit at their floors (b=8, probe depth 1 / 0). These tests
  // rebuild the ScaleProbe 10× replica of sf0.001 (cached across runs by its
  // build-version file) and re-assert the SAME bounds where the knobs
  // actually move (n≈5k → b=10, so lshTopK runs depth-2 probing and the d10
  // pair miner runs its depth-1 Hamming probe) — a knob regression that only
  // bites at scale now fails CI instead of waiting for a probe reading.
  // Everything is deterministic (seeded planes, fixed fixture, r6-rounded
  // tiebreaks), so tight bounds carry no flake risk.

  // per-run temp dir (ADVICE r7): a fixed shared path lets two concurrent
  // test JVMs race ScaleProbe.build (one reads the other's partial write);
  // the build-version file guards staleness, not concurrency. The rebuild
  // is cheap at sf0.001 and the JVM-unique dir removes the race entirely.
  private def buildReplica(copies: Int): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_scalespec_x$copies").toString
    replicaDirs += out
    graft.ScaleProbe.build(spark, sf, out, copies)
    out
  }
  private lazy val x10dir: String = buildReplica(10)

  test("n3 adaptive lshTopK holds its recall frame at the 10× replica") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, x10dir)
    val n = emb.count()
    assert(n >= 5000, s"replica must be 10× the 500-vector fixture, got $n")
    val qs = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = sets(graft.ann.Similarity.bruteForceTopK(emb, qs, k = 5))
    val found = sets(graft.ann.Similarity.lshTopK(spark, emb, qs, k = 5))
    val recall = truth.map { case (q, t) =>
      found.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    info(f"n3 10x mean recall@5 = $recall%.3f over ${truth.size} queries")
    // measured 0.770 on the current fixture; 0.50 leaves reseed headroom
    // while still catching a lost probe depth (≈0.4 without Hamming-2)
    assert(recall >= 0.50, f"10x recall $recall%.3f below the n3 frame bound")
  }

  test("n9 filtered IVF holds the n4 recall frame against the FILTERED truth at the 10× replica") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, x10dir)
    val qs = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // exact same-label truth (the n9 frame's definition, at replica scale)
    val q = qs.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      col("label"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    val truth = sets(q.join(c, "label").filter(col("qid") =!= col("cid"))
      .withColumn("sim",
        graft.Num.r6(graft.ann.Similarity.cosine(col("qe"), col("ce"))))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5))
    val found = sets(graft.ann.Ivf.topKFiltered(spark, emb, qs, k = 5))
    val recall = truth.map { case (qid, t) =>
      found.getOrElse(qid, Set.empty[Long]).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    info(f"n9 10x mean filtered recall@5 = $recall%.3f over ${truth.size} queries")
    // the label filter constrains truth and candidates symmetrically, so
    // the unfiltered IVF frame bound carries over; every neighbor must
    // also carry its query's label (the hard exactness invariant)
    assert(recall >= 0.30, f"10x filtered recall $recall%.3f below the n9 bound")
    val lbl = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    found.foreach { case (qid, cs) =>
      cs.foreach(cid => assert(lbl(qid) == lbl(cid),
        s"neighbor $cid label ${lbl(cid)} != query $qid label ${lbl(qid)}"))
    }
  }

  test("n4 adaptive IVF holds its recall floor at a 30× replica") {
    import org.apache.spark.sql.functions._
    // VERDICT r7 #6: the 30× IVF reading (recall@5 0.560 at the 63k-vector
    // sf0.1 replica) lived only in SCALE.md prose — a knob regression that
    // only bites deep in the floor-engaged regime tripped a probe reading,
    // not a test. This pins the SAME bound on a seeded downscale that
    // preserves the regime: 30× of the 500-vector fixture → n = 15 000, so
    // nlist = ⌈√n⌉ = 123 and the nprobe = ⌈nlist/6⌉ floor term is the
    // binding one (√nlist = 12 < 21 = ⌈nlist/6⌉), exactly as at 63k.
    // (This pin is what exposed the old 1/8 floor's zero margin: it
    // measured 0.488 against the ≥0.5 contract; 1/6 reads 0.592.)
    // Embeddings-only build: replicating every fact table to assert one
    // ANN bound would pay ~20× the build I/O for nothing.
    val out = java.nio.file.Files
      .createTempDirectory("graft_scalespec_x30emb").toString
    replicaDirs += out
    graft.ScaleProbe.build(spark, sf, out, 30, Set("embeddings"))
    val emb = graft.Tables.embeddings(spark, out)
    val n = emb.count()
    assert(n >= 15000, s"replica must be 30× the 500-vector fixture, got $n")
    // base-copy query set (fixed |Q| across scale points — SCALE.md
    // fairness rule); recall judged against the FULL 30× corpus
    val qs = emb.filter(
      col("vec_id") < lit(100000000L) && pmod(col("vec_id"), lit(10)) === 0)
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = sets(graft.ann.Similarity.bruteForceTopK(emb, qs, k = 5))
    val found = sets(graft.ann.Ivf.topK(spark, emb, qs, k = 5))
    val recall = truth.map { case (q, t) =>
      found.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    info(f"n4 30x mean recall@5 = $recall%.3f over ${truth.size} queries")
    assert(recall >= 0.50, f"30x recall $recall%.3f below the n4 floor contract")
  }

  test("n7 IVF-PQ holds its recall frame at the 10× replica") {
    import org.apache.spark.sql.functions._
    // n7 stacks the IVF probe miss on the PQ code distortion; its frame
    // bound (0.25) is looser than n4's, but the same knob regressions —
    // a lost recall floor OR a degenerate codebook — bite only once the
    // adaptive knobs move off their fixture floors, so pin here too.
    val emb = graft.Tables.embeddings(spark, x10dir)
    val qs = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = sets(graft.ann.Similarity.bruteForceTopK(emb, qs, k = 5))
    val found = sets(graft.ann.IvfPq.topK(spark, emb, qs, k = 5))
    val recall = truth.map { case (q, t) =>
      found.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    info(f"n7 10x mean recall@5 = $recall%.3f over ${truth.size} queries")
    // measured 0.452 (residual codes, ks=64, refine=16); the pre-residual
    // ks=16/refine=8 cut read 0.294 — this bound catches that regression
    assert(recall >= 0.30, f"10x recall $recall%.3f below the n7 frame bound")
  }

  test("d10 pair miner holds its planted-pair recall frame at the 10× replica") {
    import org.apache.spark.sql.functions._
    val aug = graft.queries.AnnPack.withVectorNearDups(spark, x10dir)
    val off = graft.queries.AnnPack.DupIdOffset
    // planted truth computed LINEARLY (pair each original with its planted
    // twin, exact cosine ≥ threshold) — no O(n²) exhaustive pass in CI
    val orig = aug.filter(col("vec_id") < off)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val dups = aug.filter(col("vec_id") >= off)
      .select((col("vec_id") - off).as("vec_a"),
        col("vec_id").as("vec_b"), col("embedding").as("eb"))
    val truth = orig.join(dups, "vec_a")
      .withColumn("cos", graft.Num.r6(
        graft.ann.Similarity.cosine(col("ea"), col("eb"))))
      .filter(col("cos") >= 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "replica must contain planted near-dups")
    val found = graft.ann.Similarity.neardupPairsLsh(spark, aug, threshold = 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(truth)
    val recall = found.size.toDouble / truth.size
    info(f"d10 10x planted-pair recall = $recall%.3f over ${truth.size} pairs")
    // measured 0.996 on the current fixture (ADVICE r6: ≈0.70 at b=16
    // without the depth-scaled probe — the regression this bound catches)
    assert(recall >= 0.80, f"10x planted recall $recall%.3f below the d10 frame bound")
  }
}
