package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

/** Filtered ANN on the persisted indexes (VERDICT r17 item 1): the
  * metadata predicate must land INSIDE the pruned cell scan — before
  * ADC, composed with partition pruning and the tombstone mask — and
  * the shortlist must be sized post-filter, so recall under a
  * selective predicate matches an exact filtered search instead of
  * silently degrading the way post-filtering a top-k would. */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val cents =
    KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
  private lazy val model = Similarity.trainPQ(emb, "vec_id", "embedding",
    d = 64, m = 4, k = 16, maxIter = 0)

  test("plan audit: filter pushes into the pruned scan, before ADC, with the tombstone mask") {
    val dir = java.nio.file.Files.createTempDirectory("flt_plan").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, dir,
      metaCols = Seq("label"))
    Similarity.deleteFromIvfPqIndex(spark,
      emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id", dir)
    // equality predicate: pushable to the parquet reader, so the spec
    // can pin PushedFilters (arithmetic predicates like label % 2 = 0
    // evaluate in the Filter node above the scan — still pre-ADC, the
    // behavioral pins below cover that shape)
    val served = Similarity.ivfPqTopKIndexed(spark, dir,
      emb.orderBy("vec_id").limit(3), "vec_id", "embedding",
      cents, model, nprobe = 2, k = 5,
      filter = Some(col("label") === 2))
    val plan = served.queryExecution.executedPlan.toString
    // cell partition pruning survives the filter
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell pruning lost under the metadata filter:\n$plan")
    // the label predicate reaches the parquet reader as a pushed filter
    assert(plan.contains("EqualTo(label,2)"),
      s"metadata predicate did not reach the scan's PushedFilters:\n$plan")
    // tombstone mask still composes
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone mask must stay a broadcast anti-join under the filter:\n$plan")
    // every served hit satisfies the predicate AND is not tombstoned
    val hits = served.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .collect()
    assert(hits.nonEmpty)
    assert(hits.forall(r => r.getAs[Int]("label") == 2),
      "a served hit violates the metadata predicate")
    assert(hits.forall(r => r.getAs[Long]("vec_id") % 7 != 3),
      "a tombstoned id leaked through the filtered serve")
  }

  test("recall at two selectivities: filtered indexed rerank ≈ exact filtered search, full k rows") {
    val dir = java.nio.file.Files.createTempDirectory("flt_rec").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, dir,
      metaCols = Seq("label"))
    val probes = emb.orderBy("vec_id").limit(5)
    // selectivity ~1/2 and ~1/10 over the 10-valued label column
    for ((pred, sqlPred, name) <- Seq(
      (col("label") % 2 === 0, (l: Int) => l % 2 == 0, "~1/2"),
      (col("label") === 5, (l: Int) => l == 5, "~1/10"))) {
      val exact = Similarity.topKCosine(emb.filter(pred), "vec_id", "embedding",
        probes, "vec_id", "embedding", k = 10)
      // nprobe = all 8 cells: the recall being measured is the FILTER
      // path's (shortlist truncation + rerank), not cell pruning's —
      // and with every qualifying row visible, full-k is guaranteed
      // whenever ≥k rows qualify corpus-wide
      val approx = Similarity.ivfPqTopKIndexedRerank(spark, dir,
        emb, "vec_id", "embedding", probes, "vec_id", "embedding",
        cents, model, nprobe = 8, k = 10, shortlist = 100,
        filter = Some(pred))
      // full k: the shortlist is sized post-filter, so every probe
      // gets k qualifying hits — a post-filtered top-k would go short
      val counts = approx.groupBy("probe_id").count().collect()
      assert(counts.length == 5 && counts.forall(_.getLong(1) == 10L),
        s"filtered serve at selectivity $name returned short lists: " +
          counts.mkString(", "))
      // all results qualify
      val labels = approx.join(emb.select(col("vec_id"), col("label")), "vec_id")
        .collect()
      assert(labels.forall(r => sqlPred(r.getAs[Int]("label"))),
        s"unqualified hit at selectivity $name")
      val rec = Similarity.annRecall(approx, exact)
        .agg((sum(col("n_hit")).cast("double") /
          sum(col("n_exact")).cast("double")).as("r")).head().getDouble(0)
      assert(rec >= 0.6,
        s"filtered recall at selectivity $name collapsed: $rec — the " +
          "filter is degrading the search instead of pruning it")
    }
  }

  test("append carries the index's metadata columns; a narrower batch refuses") {
    val dir = java.nio.file.Files.createTempDirectory("flt_app").toString + "/i"
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 3 =!= 0),
      "vec_id", "embedding", cents, model, dir, metaCols = Seq("label"))
    // narrower batch: refuses loudly, names the column
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndex(spark,
        emb.filter(col("vec_id") % 3 === 0).select("vec_id", "embedding"),
        "vec_id", "embedding", model, dir)
    }
    assert(e.getMessage.contains("label"), e.getMessage)
    // full-width batch appends, and the appended rows are filterable
    Similarity.appendIvfPqIndex(spark, emb.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", model, dir)
    val served = Similarity.ivfPqTopKIndexed(spark, dir,
      emb.orderBy("vec_id").limit(3), "vec_id", "embedding",
      cents, model, nprobe = 8, k = 200,
      filter = Some(col("label") % 2 === 0))
    val appendedServed = served.filter(col("vec_id") % 3 === 0).count()
    assert(appendedServed > 0,
      "appended rows never surface through the filtered serve — their " +
        "metadata column was dropped")
  }

  test("float IVF: filtered serve matches an exact filtered search over probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("flt_ivf").toString + "/i"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, dir,
      metaCols = Seq("label"))
    val probes = emb.orderBy("vec_id").limit(3)
    val served = Similarity.ivfTopKIndexed(spark, dir, probes,
      "vec_id", "embedding", cents, nprobe = 8, k = 10,
      filter = Some(col("label") % 2 === 0))
    // nprobe = all cells ⇒ the filtered serve IS the exact filtered
    // search — bit-for-bit
    val exact = Similarity.topKCosine(emb.filter(col("label") % 2 === 0),
      "vec_id", "embedding", probes, "vec_id", "embedding", k = 10)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(key(served) == key(exact),
      "full-nprobe filtered IVF serve must equal the exact filtered search")
  }

  test("metadata column names cannot shadow index columns") {
    val bad = emb.withColumn("cell", col("label"))
    val e = intercept[IllegalArgumentException] {
      Similarity.buildIvfPqIndex(bad, "vec_id", "embedding", cents, model,
        java.nio.file.Files.createTempDirectory("flt_bad").toString + "/i",
        metaCols = Seq("cell"))
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
  }
}
