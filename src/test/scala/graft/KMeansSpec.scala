package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans
import graft.operators.KMeans._

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two obvious 2-D clusters around (0,0) and (10,10).
  private lazy val tiny = Seq(
    (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)),
    (4L, Seq(10.0, 10.0)), (5L, Seq(11.0, 10.0)), (6L, Seq(10.0, 11.0))
  ).toDF("id", "features")

  test("assign: every point goes to its nearest centroid") {
    val cents: Centroids = Array(1 -> Array(0.0, 0.0), 2 -> Array(10.0, 10.0))
    val got = KMeans.assign(tiny, "features", cents)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2, 6L -> 2))
  }

  test("assign: equidistant tie breaks to the lowest centroid id (SURVEY §7.4.2)") {
    val cents: Centroids = Array(1 -> Array(0.0, 0.0), 2 -> Array(2.0, 0.0))
    val got = Seq((1L, Seq(1.0, 0.0))).toDF("id", "features")
    val cl = KMeans.assign(got, "features", cents).select("cluster").as[Int].head()
    assert(cl == 1)
    // and with ids reversed in the input array, still the lowest id
    val rev: Centroids = Array(2 -> Array(2.0, 0.0), 1 -> Array(0.0, 0.0))
    val cl2 = KMeans.assign(got, "features", rev).select("cluster").as[Int].head()
    assert(cl2 == 1)
  }

  test("step: new centroid is the element-wise mean of its members (KMeans.java:184-198)") {
    val cents: Centroids = Array(1 -> Array(0.0, 0.0), 2 -> Array(10.0, 10.0))
    val next = KMeans.step(tiny.select($"features".cast("array<double>").as("features")),
      "features", cents)
    val m = next.toMap
    assert(m(1).toSeq == Seq(1.0 / 3, 1.0 / 3))
    assert(m(2).toSeq == Seq(31.0 / 3, 31.0 / 3))
  }

  test("step: empty cluster vanishes by default, kept with keepEmpty (SURVEY §7.4.3)") {
    val far: Centroids = Array(
      1 -> Array(0.0, 0.0), 2 -> Array(10.0, 10.0), 3 -> Array(1000.0, 1000.0))
    val dropped = KMeans.step(tiny, "features", far)
    assert(dropped.map(_._1).toSeq == Seq(1, 2))
    val kept = KMeans.step(tiny, "features", far, keepEmpty = true)
    assert(kept.map(_._1).toSeq == Seq(1, 2, 3))
    assert(kept.toMap.apply(3).toSeq == Seq(1000.0, 1000.0))
  }

  test("isConverged: exact-zero semantics and size mismatch (KMeans.java:291-310)") {
    val a: Centroids = Array(1 -> Array(1.0, 2.0), 2 -> Array(3.0, 4.0))
    val same: Centroids = Array(1 -> Array(1.0, 2.0), 2 -> Array(3.0, 4.0))
    val moved: Centroids = Array(1 -> Array(1.0, 2.0), 2 -> Array(3.0, 4.0 + 1e-9))
    val fewer: Centroids = Array(1 -> Array(1.0, 2.0))
    assert(KMeans.isConverged(a, same, 0.0))
    assert(!KMeans.isConverged(a, moved, 0.0))
    assert(KMeans.isConverged(a, moved, 1e-6))
    assert(!KMeans.isConverged(a, fewer, 1.0))
  }

  test("initCentroids: ExplicitIds renumbers 1..k in argument order (KMeans.java:597-606)") {
    val cents = KMeans.initCentroids(tiny, "id", "features", ExplicitIds(Seq(5L, 2L)))
    assert(cents.map(_._1).toSeq == Seq(1, 2))
    assert(cents(0)._2.toSeq == Seq(11.0, 10.0)) // id 5 -> cluster 1
    assert(cents(1)._2.toSeq == Seq(1.0, 0.0))   // id 2 -> cluster 2
    intercept[NoSuchElementException] {
      KMeans.initCentroids(tiny, "id", "features", ExplicitIds(Seq(99L)))
    }
  }

  test("initCentroids: FirstK takes lowest ids; RandomRows is seed-stable") {
    val fk = KMeans.initCentroids(tiny, "id", "features", FirstK(2))
    assert(fk.map(_._1).toSeq == Seq(1, 2))
    assert(fk(0)._2.toSeq == Seq(0.0, 0.0))
    val r1 = KMeans.initCentroids(tiny, "id", "features", RandomRows(2, seed = 7))
    val r2 = KMeans.initCentroids(tiny, "id", "features", RandomRows(2, seed = 7))
    assert(r1.map(_._2.toSeq).toSeq == r2.map(_._2.toSeq).toSeq)
  }

  test("fit: converges on separable data to the true means") {
    val model = KMeans.fit(tiny, "id", "features", ExplicitIds(Seq(1L, 4L)), maxIter = -1)
    assert(model.converged)
    val m = model.centroids.toMap
    assert(m(1).toSeq == Seq(1.0 / 3, 1.0 / 3))
    assert(m(2).toSeq == Seq(31.0 / 3, 31.0 / 3))
    // converged in 2 steps: step1 moves centroids, step2 confirms fixpoint
    assert(model.iterations >= 2 && model.iterations <= 3)
  }

  test("fit: trackCost records non-increasing WCSS per iteration") {
    val model = KMeans.fit(tiny, "id", "features", ExplicitIds(Seq(1L, 2L)),
      maxIter = 4, trackCost = true)
    assert(model.costHistory.length == model.iterations)
    model.costHistory.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12)
      case _ =>
    }
    // off by default
    assert(KMeans.fit(tiny, "id", "features", FirstK(2), maxIter = 1).costHistory.isEmpty)
  }

  test("fit: maxIter caps the loop") {
    val model = KMeans.fit(tiny, "id", "features", ExplicitIds(Seq(1L, 2L)), maxIter = 1)
    assert(model.iterations == 1)
  }

  test("stepSortedFold matches step within FP tolerance") {
    val cents = KMeans.initCentroids(tiny, "id", "features", FirstK(2))
    val a = KMeans.step(tiny, "features", cents)
    val b = KMeans.stepSortedFold(tiny, "features", cents)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    a.zip(b).foreach { case ((_, va), (_, vb)) =>
      va.zip(vb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
  }

  test("membershipLists: sorted ids per cluster, counts match") {
    val cents = KMeans.initCentroids(tiny, "id", "features", ExplicitIds(Seq(1L, 4L)))
    val assigned = KMeans.assign(tiny, "features", cents)
    val rows = KMeans.membershipLists(assigned, "id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq)).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2))
    rows.foreach { case (_, n, ids) =>
      assert(n == ids.length)
      assert(ids == ids.sorted)
    }
    assert(rows.flatMap(_._3).sorted.toSeq == (1L to 6L).toSeq)
  }

  test("PlusPlus init: deterministic, repartition-stable, one seed per separated blob") {
    // 4 tight, well-separated blobs of 5 points each
    val blobs = for {
      (bx, by) <- Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0))
      i <- 0 until 5
    } yield (bx, by, bx + i * 0.1, by + i * 0.1)
    val df = blobs.zipWithIndex
      .map { case ((_, _, x, y), id) => (id.toLong + 1, Seq(x, y)) }
      .toDF("id", "features")
    val c1 = KMeans.initCentroids(df, "id", "features", PlusPlus(4, seed = 42))
    val c2 = KMeans.initCentroids(df, "id", "features", PlusPlus(4, seed = 42))
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq) // deterministic
    val c3 = KMeans.initCentroids(df.repartition(7), "id", "features", PlusPlus(4, seed = 42))
    assert(c1.map(_._2.toSeq).toSeq == c3.map(_._2.toSeq).toSeq) // partitioning-independent
    // D² weighting: one seed lands in each blob (blob = rounded /100)
    val blobsHit = c1.map { case (_, v) =>
      (math.round(v(0) / 100.0), math.round(v(1) / 100.0))
    }.toSet
    assert(blobsHit.size == 4, s"expected one seed per blob, got ${c1.map(_._2.toSeq).toSeq}")
    // different seed picks (almost surely) different points
    val c4 = KMeans.initCentroids(df, "id", "features", PlusPlus(4, seed = 7))
    assert(c1.map(_._2.toSeq).toSeq != c4.map(_._2.toSeq).toSeq)
  }

  test("Parallel init (k-means parallel): deterministic, one seed per blob, fit-compatible") {
    // 4 tight, well-separated blobs of 8 points each
    val blobs = for {
      (bx, by) <- Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0))
      i <- 0 until 8
    } yield (bx + i * 0.1, by + i * 0.1)
    val df = blobs.zipWithIndex
      .map { case ((x, y), id) => (id.toLong + 1, Seq(x, y)) }
      .toDF("id", "features")
    val c1 = KMeans.initCentroids(df, "id", "features", Parallel(4, seed = 42, rounds = 3))
    val c2 = KMeans.initCentroids(df, "id", "features", Parallel(4, seed = 42, rounds = 3))
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq) // deterministic rerun
    assert(c1.map(_._1).toSeq == Seq(1, 2, 3, 4))                // renumbered 1..k
    // oversampling + weighted reduction: one seed per separated blob
    val blobsHit = c1.map { case (_, v) =>
      (math.round(v(0) / 100.0), math.round(v(1) / 100.0))
    }.toSet
    assert(blobsHit.size == 4, s"expected one seed per blob, got ${c1.map(_._2.toSeq).toSeq}")
    // the init feeds fit() like any other; converges on the blobs
    val m = KMeans.fit(df, "id", "features", Parallel(4, seed = 42, rounds = 3), maxIter = -1)
    assert(m.converged && m.centroids.length == 4)
    // too few distinct points refuses loudly
    val dup = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(1.0, 1.0))).toDF("id", "features")
    intercept[IllegalArgumentException] {
      KMeans.initCentroids(dup, "id", "features", Parallel(3, seed = 1, rounds = 4))
    }
  }

  test("Parallel init, sortedCost parity mode: partitioning-independent, agrees with default") {
    val blobs = for {
      (bx, by) <- Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0))
      i <- 0 until 8
    } yield (bx + i * 0.1, by + i * 0.1)
    val df = blobs.zipWithIndex
      .map { case ((x, y), id) => (id.toLong + 1, Seq(x, y)) }
      .toDF("id", "features")
    val sorted1 = KMeans.initCentroids(df, "id", "features",
      Parallel(4, seed = 42, rounds = 3, sortedCost = true))
    // the point of the mode: bit-identical under ANY partitioning —
    // the default's partial-agg cost sum cannot promise this
    val sorted2 = KMeans.initCentroids(df.repartition(7), "id", "features",
      Parallel(4, seed = 42, rounds = 3, sortedCost = true))
    assert(sorted1.map(_._2.toSeq).toSeq == sorted2.map(_._2.toSeq).toSeq)
    // on a small input both cost paths compute the same double (the
    // boundary-coin divergence is a ~2^-50 event), so the chains agree
    val default = KMeans.initCentroids(df, "id", "features",
      Parallel(4, seed = 42, rounds = 3))
    assert(sorted1.map(_._2.toSeq).toSeq == default.map(_._2.toSeq).toSeq)
  }

  test("fit: SSE is non-increasing across iterations (Lloyd invariant)") {
    val df = tiny.select($"id", $"features".cast("array<double>").as("features")).cache()
    var cents = KMeans.initCentroids(df, "id", "features", ExplicitIds(Seq(1L, 2L)))
    def sse(c: Centroids): Double =
      df.select(KMeans.minSqDistColumn(c, $"features").as("m"))
        .agg(org.apache.spark.sql.functions.sum($"m")).as[Double].head()
    var prev = sse(cents)
    for (_ <- 1 to 4) {
      cents = KMeans.step(df, "features", cents)
      val cur = sse(cents)
      assert(cur <= prev + 1e-12)
      prev = cur
    }
    df.unpersist()
  }

  test("native assign/minSqDist kernels == HOF twins, bit for bit") {
    // review r15: assignColumn/minSqDistColumn moved to native
    // primitive kernels (NearestCentroidExpr/MinSqDistToSetExpr) —
    // every Lloyd pass, IVF build, SemDeDup cell and cost row rides
    // them, so the selection must match the array_min-over-struct HOF
    // exactly, including ties (lowest cid) and arbitrary cid values
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val feats = graft.functions.VectorOps.toDouble(col("embedding"))
    // non-contiguous, non-1-based cids: k-means++ seeds use row ids
    val cents: KMeans.Centroids =
      KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
        .map { case (cid, v) => (cid * 37 + 5, v) }
    val a = emb.select(col("vec_id"),
        KMeans.assignColumn(cents, feats).as("c"),
        KMeans.minSqDistColumn(cents, feats).as("d")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val b = emb.select(col("vec_id"),
        KMeans.assignColumnHof(cents, feats).as("c"),
        KMeans.minSqDistColumnHof(cents, feats).as("d")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(a.nonEmpty && a.keySet == b.keySet)
    a.foreach { case (id, (c, d)) =>
      assert(c == b(id)._1, s"assign mismatch for $id: $c vs ${b(id)._1}")
      assert(java.lang.Double.doubleToLongBits(d) ==
        java.lang.Double.doubleToLongBits(b(id)._2),
        s"minSqDist mismatch for $id: $d vs ${b(id)._2}")
    }
    // equidistant tie → lowest cid on both paths
    import spark.implicits._
    val tie = Seq((1L, Seq(0.0, 0.0))).toDF("id", "v")
    val tieCents: KMeans.Centroids =
      Array(7 -> Array(1.0, 0.0), 3 -> Array(-1.0, 0.0))
    assert(tie.select(KMeans.assignColumn(tieCents, col("v")))
      .collect()(0).getInt(0) == 3)
    assert(tie.select(KMeans.assignColumnHof(tieCents, col("v")))
      .collect()(0).getInt(0) == 3)
    // malformed vector (wrong length): HOF's struct min sees all-null
    // dists → lowest cid; the kernel mirrors; minSqDist nulls on both
    val bad = Seq((1L, Seq(0.0, 0.0, 0.0))).toDF("id", "v")
    val hofC = bad.select(KMeans.assignColumnHof(tieCents, col("v")))
      .collect()(0)
    val natC = bad.select(KMeans.assignColumn(tieCents, col("v")))
      .collect()(0)
    assert(natC.getInt(0) == 3 && hofC.getInt(0) == natC.getInt(0))
    assert(bad.select(KMeans.minSqDistColumn(tieCents, col("v")))
      .collect()(0).isNullAt(0))
    assert(bad.select(KMeans.minSqDistColumnHof(tieCents, col("v")))
      .collect()(0).isNullAt(0))
    // NULL vector (review r15): the HOF's struct min sees all-null
    // dists → lowest cid, so the kernel must NOT take the usual
    // nullSafeEval short-circuit to NULL — a NULL assignment would
    // route the row into the never-probed __HIVE_DEFAULT_PARTITION__
    // cell of every partitioned index instead of cell cids(0).
    // minSqDist nulls on both (array_min skips nulls; all null → null)
    val nul = Seq((1L, null: Seq[Double])).toDF("id", "v")
    val hofN = nul.select(KMeans.assignColumnHof(tieCents, col("v")))
      .collect()(0)
    val natN = nul.select(KMeans.assignColumn(tieCents, col("v")))
      .collect()(0)
    assert(!natN.isNullAt(0) && natN.getInt(0) == 3,
      s"native assign on NULL vector: ${natN}")
    assert(!hofN.isNullAt(0) && hofN.getInt(0) == natN.getInt(0),
      s"HOF assign on NULL vector: ${hofN}")
    assert(nul.select(KMeans.minSqDistColumn(tieCents, col("v")))
      .collect()(0).isNullAt(0))
    assert(nul.select(KMeans.minSqDistColumnHof(tieCents, col("v")))
      .collect()(0).isNullAt(0))
  }
}
