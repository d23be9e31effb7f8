package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the companion surface to
  * Dedup's component operators (near-dup pair graphs, citation /
  * link graphs, user-interaction graphs). Everything here is
  * edge-list relational algebra: joins + grouped aggregations per
  * round, never a driver-side adjacency structure, so the operators
  * inherit Spark's shuffle-partitioned scaling directly.
  */
object Graph {

  /** PageRank with a FIXED number of power iterations (public
    * formula, Brin & Page 1998): pr'(v) = (1-d)/N + d · Σ_{u→v}
    * pr(u)/outdeg(u). Fixed-iteration (not convergence-tested)
    * because training-data curation uses the ranking, not the exact
    * stationary point — 3-5 rounds separate hubs from leaves, and a
    * fixed round count keeps the result a pure function of the
    * input (the oracle gate unrolls the same rounds in SQL).
    *
    * undirected=true symmetrizes the edge list first (each edge
    * counts in both directions — the natural reading for near-dup /
    * similarity graphs, where rank measures how centrally a document
    * sits in its duplicate neighborhood). Directed inputs keep their
    * orientation: dangling nodes (outdeg 0) contribute nothing and
    * their mass is NOT redistributed — the simplified public variant,
    * stated here so the choice is visible; nodes with no in-edges
    * settle at the teleport floor (1-d)/N.
    *
    * Scale shape: per round ONE hash join (edges × current ranks on
    * src) + ONE grouped sum on dst — the same shuffle pair as a
    * relational group-by, repeated `iters` times on a CACHED edge
    * list (registered under Dedup's cache lifecycle). Degrees are
    * computed once. No collect except the single node count N (one
    * scalar). sortedFold=true folds each node's contributions in
    * ascending order (collect_list + sorted sequential fold) —
    * bit-exact vs DuckDB, correctness gates only; false is the
    * distributed partial-agg scale path.
    *
    * Output: (id, pr, degree) for every node in the edge list. */
  /** Shared edge prologue: named endpoints, self-loops dropped,
    * optionally symmetrized, dedup'd — UNPINNED (callers that read
    * the list more than once pin it). `castLong` aligns endpoint
    * types with long-keyed seed relations (the bfsDistance-family
    * convention). One implementation (review r15): six operators
    * used to inline drifting copies of this block, and the drift is
    * exactly what produced labelComplete's seed-cast-without-
    * edge-cast silent no-op. */
  private def edgeList(edges: DataFrame, srcCol: String, dstCol: String,
                       undirected: Boolean,
                       castLong: Boolean = false): DataFrame = {
    if (castLong) {
      // loud, not silent: a string/UUID endpoint would cast to NULL
      // and the self-loop filter would then drop every edge — an
      // EMPTY graph with no error (review r15); hash non-numeric ids
      // to longs upstream
      graft.functions.TopKAgg.requireLongCastableId(edges, srcCol, "Graph")
      graft.functions.TopKAgg.requireLongCastableId(edges, dstCol, "Graph")
    }
    val (s, d) =
      if (castLong) (col(srcCol).cast("long"), col(dstCol).cast("long"))
      else (col(srcCol), col(dstCol))
    val base = edges.select(s.as("src"), d.as("dst"))
      .filter(col("src") =!= col("dst"))
    val oriented =
      if (undirected) base.union(base.select(col("dst").as("src"), col("src").as("dst")))
      else base
    oriented.distinct()
  }

  /** Shared rank-iteration prep: dedup'd (optionally symmetrized)
    * edge list + per-node out-degrees, both pinned — the opening
    * moves of pageRank and personalizedPageRank. */
  private def rankPrep(edges: DataFrame, srcCol: String, dstCol: String,
                       undirected: Boolean): (DataFrame, DataFrame) = {
    val e = Dedup.pin(edgeList(edges, srcCol, dstCol, undirected))
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("long").as("degree"))
      .withColumnRenamed("src", "id")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val degs = Dedup.pin(nodes.join(outDeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("degree"), lit(0L)).as("degree")))
    (e, degs)
  }

  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 3, damping: Double = 0.85,
               undirected: Boolean = true, sortedFold: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0, 1), got $damping")
    val (e, degs) = rankPrep(edges, srcCol, dstCol, undirected)
    val n = degs.count()
    require(n > 0, "pageRank on an empty edge list")
    val tele = (1.0 - damping) / n.toDouble
    // degree rides INSIDE the iterated frame (r18): the old loop
    // re-joined ranks to the degree table every round just to read
    // pr/degree, and the final result joined it once more — one join
    // per round plus one at the end, all removable by carrying the
    // (long) column through the checkpointed frame. Arithmetic is
    // untouched, so every pr is bit-identical.
    var ranks = degs.select(col("id"), lit(1.0 / n.toDouble).as("pr"), col("degree"))
    for (i <- 1 to iters) {
      val contribs = e.join(
        ranks.filter(col("degree") > 0L)
          .select(col("id").as("src"), (col("pr") / col("degree")).as("c")),
        Seq("src"))
        .select(col("dst").as("id"), col("c"))
      val sums =
        if (sortedFold)
          contribs.groupBy("id").agg(
            graft.functions.VectorOps.foldSum(array_sort(collect_list(col("c")))).as("s"))
        else contribs.groupBy("id").agg(sum(col("c")).as("s"))
      // per-round eager checkpoint (the labelPropagation/kCore
      // lesson): ranks' lineage otherwise nests one join tree per
      // round, and iters may legitimately be 50. The FINAL round
      // stays lazy (r19): its only consumer is the returned plan, so
      // checkpointing it would materialize the frame once and read it
      // back once for nothing — one barrier fewer, values identical
      ranks = degs.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(tele) + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"),
          col("degree"))
      if (i < iters) ranks = ranks.localCheckpoint(eager = true)
    }
    ranks.select(col("id"), col("pr"), col("degree"))
  }

  /** Personalized PageRank (Haveliwala 2002 / Jeh & Widom 2003's
    * topic-sensitive teleport): identical power iteration to
    * pageRank, but teleport mass lands ONLY on the seed set — so rank
    * measures proximity to the seeds rather than global centrality.
    * The curation read: "which documents sit near the known-gold (or
    * known-bad) set in the similarity graph", with multi-hop mass
    * where bfsDistance gives only hop counts.
    *
    * pr'(v) = (1−d)·s(v) + d·Σ_{u→v} pr(u)/outdeg(u), with
    * s(v) = 1/|S| for seeds and 0 elsewhere; pr₀ = s. Same simplified
    * public variant as pageRank (dangling mass not redistributed —
    * with the teleport restricted to seeds, non-seed sinks simply
    * absorb less), same fixed-iteration determinism contract.
    *
    * Scale shape: pageRank's per-round join+agg pair exactly, plus a
    * ONE-TIME broadcast left-join of the seed list (probe-sized) onto
    * the node table. sortedFold as in pageRank: bit-exact oracle
    * twin vs distributed partial-agg scale path.
    *
    * Output: (id, pr, degree) for every node of the edge list. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, seedCol: String,
                           srcCol: String = "src", dstCol: String = "dst",
                           iters: Int = 3, damping: Double = 0.85,
                           undirected: Boolean = true,
                           sortedFold: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0, 1), got $damping")
    val (e, degs) = rankPrep(edges, srcCol, dstCol, undirected)
    // seeds restricted to nodes actually in the graph — teleporting to
    // an absent node would silently leak (1−d)/|S| of mass nowhere
    val seedIds = seeds.select(col(seedCol).as("id")).distinct()
      .join(degs.select("id"), Seq("id"))
    val nS = seedIds.count()
    require(nS > 0, "personalizedPageRank needs at least one seed present in the graph")
    val sv = Dedup.pin(degs
      .join(broadcast(seedIds.withColumn("__s0", lit(1.0 / nS.toDouble))), Seq("id"), "left")
      .select(col("id"), col("degree"), coalesce(col("__s0"), lit(0.0)).as("__s")))
    // degree and the seed vector ride INSIDE the iterated frame (r18,
    // the pageRank rewrite): one join per round instead of two, and
    // the final degree join disappears; arithmetic untouched, every
    // pr bit-identical.
    var ranks = sv.select(col("id"), col("__s").as("pr"), col("degree"))
    for (i <- 1 to iters) {
      val contribs = e.join(
        ranks.filter(col("degree") > 0L)
          .select(col("id").as("src"), (col("pr") / col("degree")).as("c")),
        Seq("src"))
        .select(col("dst").as("id"), col("c"))
      val sums =
        if (sortedFold)
          contribs.groupBy("id").agg(
            graft.functions.VectorOps.foldSum(array_sort(collect_list(col("c")))).as("s"))
        else contribs.groupBy("id").agg(sum(col("c")).as("s"))
      // final round lazy — single consumer, see pageRank (r19)
      ranks = sv.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) * col("__s")
            + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"),
          col("degree"))
      if (i < iters) ranks = ranks.localCheckpoint(eager = true)
    }
    ranks.select(col("id"), col("pr"), col("degree"))
  }

  /** Label propagation communities (Raghavan et al. 2007, the
    * synchronous fixed-round variant): every node starts as its own
    * label; each round it adopts the most frequent label among its
    * NEIGHBORS, ties broken by the smaller label — both rules exact
    * integer/ordering decisions, so R rounds are a pure function of
    * the edge list (the oracle unrolls the same rounds). Communities
    * differ from connected components on bridge topologies: a thin
    * bridge between two dense blobs keeps one component but two
    * labels. Fixed rounds, not convergence: synchronous LPA can
    * oscillate on bipartite structures, and curation wants a
    * deterministic result, not a lucky fixed point.
    *
    * Scale shape: per round one hash join (edges × labels on src) +
    * one (dst, label) count + one min_by-struct argmax — the exact
    * shuffle pattern of pageRank with the sum swapped for a mode.
    * Nodes with no in-neighbors (directed case) keep their label via
    * the left join. Output: (id, label) after `rounds` rounds. */
  def labelPropagation(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
                       rounds: Int = 2, undirected: Boolean = true): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1, 50], got $rounds")
    val e = Dedup.pin(edgeList(edges, srcCol, dstCol, undirected))
    val nodes = Dedup.pin(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    var labels = nodes.select(col("id"), col("id").as("label"))
    for (r <- 1 to rounds) {
      val votes = e.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("__c"))
      val winners = votes.groupBy("dst")
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l"))).as("__b"))
        .select(col("dst").as("id"), col("__b.l").as("label"))
      // each round reads the previous labels twice (votes + keep-old)
      // — checkpoint cuts the 2^rounds lineage, as in the component
      // loops. labels' id set IS the node set (invariant from the
      // init + this left join), so anchoring on labels directly saves
      // the separate nodes join each round (r18).
      labels = labels.withColumnRenamed("label", "__old")
        .join(winners.withColumnRenamed("label", "__new"), Seq("id"), "left")
        .select(col("id"), coalesce(col("__new"), col("__old")).as("label"))
      // final round lazy — its only consumer is the returned plan,
      // which reads the (checkpointed) previous frame twice, a
      // bounded lineage (r19; see pageRank)
      labels = if (r < rounds) labels.localCheckpoint(eager = true) else labels
    }
    labels
  }

  /** Semi-supervised label completion (clamped-seed label
    * propagation, Zhu & Ghahramani 2002's discrete cousin): known
    * labels stay FIXED, unlabeled nodes take the mode of their
    * neighbors' current labels each synchronous round — the curation
    * move that in-fills missing metadata (lang, source class,
    * quality tier) across a near-duplicate graph, on the premise
    * that near-dups share it. Differs from labelPropagation (the
    * unsupervised community detector) in both the seed clamp and the
    * null-start: only seed-derived labels ever propagate, so every
    * inferred label traces to ground truth ≤ rounds hops away.
    *
    * Determinism: mode tie-break = (count desc, label asc) via the
    * same min-struct fold as labelPropagation; integer counting
    * only, no FP. Nodes that never see a labeled neighbor keep NULL
    * (visibly un-inferred, not defaulted).
    *
    * Scale shape: per round ONE join (edges × labeled nodes) + one
    * grouped count + one mode pick — labelPropagation's exact
    * shuffle shape; localCheckpoint per round cuts the doubling
    * lineage. Output: (id, label, is_seed). */
  def labelComplete(edges: DataFrame, srcCol: String, dstCol: String,
                    seeds: DataFrame, idCol: String, labelCol: String,
                    rounds: Int = 2, undirected: Boolean = true): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1, 50], got $rounds")
    graft.functions.TopKAgg.requireLongCastableId(seeds, idCol,
      "Graph.labelComplete")
    // castLong on BOTH edges and seeds (review r15): seeds were cast
    // to long while edge endpoints kept their source type, so an
    // id-type mismatch could make every seed join miss and the
    // operator return all-NULL labels with no error — the
    // bfsDistance-family convention is one long id domain throughout
    val e = Dedup.pin(edgeList(edges, srcCol, dstCol, undirected,
      castLong = true))
    val nodes = Dedup.pin(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    val sd = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("string").as("__seed"))
    var labels = nodes.join(sd, Seq("id"), "left")
      .select(col("id"), col("__seed").as("label"),
        col("__seed").isNotNull.cast("int").as("is_seed"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val votes = e.join(labels.filter(col("label").isNotNull)
          .select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("__c"))
      val winners = votes.groupBy("dst")
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l"))).as("__b"))
        .select(col("dst").as("id"), col("__b.l").as("__new"))
      labels = labels.join(winners, Seq("id"), "left")
        .select(col("id"),
          when(col("is_seed") === 1, col("label"))
            .otherwise(coalesce(col("__new"), col("label"))).as("label"),
          col("is_seed"))
        .localCheckpoint(eager = true)
    }
    labels
  }

  /** Degree distribution of an edge list: per-node degree plus the
    * node count at each degree — the one-pass profile that decides
    * whether a graph op needs a skew guard (a power-law head means
    * the top hub's adjacency dwarfs the mean; feed maxBucket /
    * salting decisions from this, don't guess). Two grouped
    * aggregations, both partial-agg friendly.
    * Output: (degree, n_nodes) ascending. */
  def degreeHistogram(edges: DataFrame, srcCol: String = "src",
                      dstCol: String = "dst",
                      undirected: Boolean = true): DataFrame = {
    val e = edgeList(edges, srcCol, dstCol, undirected)
    // anchor on the full node set so pure sinks count at degree 0
    // (review r15: grouping the out-endpoint alone silently dropped
    // zero-out-degree nodes in the directed case, under-reporting
    // node count to exactly the skew decisions this profile feeds;
    // in undirected mode symmetrization makes this a no-op)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val deg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("degree"))
    nodes.join(deg, Seq("id"), "left")
      .select(coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).cast("long").as("n_nodes"))
      .orderBy("degree")
  }

  /** Degree assortativity coefficient (Newman 2002, eq. 4): the
    * Pearson correlation of the degrees at either end of an edge —
    * positive for hub-to-hub graphs (social), negative for hub-to-
    * leaf (near-dup stars, infrastructure). One scalar that says
    * whether dense cores or star shapes dominate — the triage number
    * read before choosing between kCore and components.
    *
    * Exactness: every sum (Σd_u·d_v, Σd_u, Σd_u² over the symmetric
    * edge list) is an exact INTEGER — order-free distributed partial
    * aggs, no FP until the single final Pearson expression (fixed
    * operand order, engine-identical). The product sums run in
    * decimal(38,0), the repo's exact-integer convention (dailyTrend,
    * pearsonByKey): raw long arithmetic silently WRAPS at realistic
    * graph scale (review r15 — Σd_u·d_v passes Long.MaxValue near
    * 1e8 symmetric rows with a 1e5-degree hub, and Spark wraps where
    * the DuckDB oracle errors, a silent cross-engine divergence).
    * The normal-equation CROSS terms (m2·Σd², Σd·Σd) square once
    * more on top of the 38-digit sums, so they run in DOUBLE after
    * the exact sums — on both engines, identical operand order —
    * which moves the overflow bound from the sums' PRODUCTS (past 38
    * digits in the band where DuckDB's HUGEINT still computes but
    * Spark's decimal(38,0) errors/nulls — ADVICE r15) to the sums
    * themselves, with double's ±inf semantics engine-identical
    * beyond 1e308. NULL when the graph is degree-regular (zero
    * variance — the coefficient is undefined).
    *
    * Scale shape: one grouped degree count, one join of edges
    * against degrees per endpoint, ONE single-row aggregate. No
    * windows, no collects.
    * Output: one row (m_edges, r). */
  def assortativity(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val base = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val sym = base.union(base.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("id"))
      .agg(count(lit(1)).cast("long").as("d"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val agg = sym
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .agg(count(lit(1)).cast("long").as("m2"),
        sum(dec(col("da")) * dec(col("db"))).as("sxy"),
        sum(dec(col("da"))).as("sx"),
        sum(dec(col("db"))).as("sy"),
        sum(dec(col("da")) * dec(col("da"))).as("sxx"),
        sum(dec(col("db")) * dec(col("db"))).as("syy"))
    def dbl(c: Column) = c.cast("double")
    val varX = dbl(col("m2")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))
    val varY = dbl(col("m2")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy"))
    agg.select(expr("m2 DIV 2").as("m_edges"),
      when(col("m2") > 0L && varX > 0.0 && varY > 0.0,
        (dbl(col("m2")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy")))
          / sqrt(varX * varY)).as("r"))
  }

  /** k-core extraction by iterative peeling (Seidman 1983; the
    * Batagelj-Zaveršnik distributed formulation): repeatedly delete
    * every vertex whose CURRENT degree is < k until none remains —
    * the standard "dense sub-community" filter (a near-dup cluster's
    * 2-core is its genuinely interlinked middle; degree alone
    * over-keeps stars, components under-split).
    *
    * Bounded semantics for cross-engine replay: peel exactly `rounds`
    * rounds (the oracle unrolls the same count); peeling is monotone
    * — each round only removes vertices — so reaching the fixpoint
    * early makes later rounds no-ops, and the early-exit below (via
    * a 1-scalar surviving-vertex count per round, the K-Means-
    * convergence posture) changes nothing. With rounds ≥ the peel
    * depth the result IS the exact k-core.
    *
    * Scale shape: per round ONE grouped degree count + TWO semi-joins
    * of the edge list against the survivor set — the connected-
    * components shuffle pattern — with a localCheckpoint per round
    * (the components lesson: round r's plan otherwise nests r join
    * trees). No windows, no driver-side adjacency; the only collects
    * are one scalar per round.
    * Output: (id, core_degree) for every vertex still standing after
    * `rounds` peels — degree measured within the surviving subgraph. */
  def kCore(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
            k: Int = 2, rounds: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1, 50], got $rounds")
    val base = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    var cur = base.union(base.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var prevCount = -1L
    var r = 0
    while (r < rounds && prevCount != 0L) {
      val deg = cur.groupBy("a").agg(count(lit(1)).as("__d"))
      val keep = deg.filter(col("__d") >= k).select("a")
      val n = keep.count()
      if (n == prevCount) {
        r = rounds // fixpoint: survivors stable, further peels are no-ops
      } else {
        prevCount = n
        cur = cur.join(keep, Seq("a"), "left_semi")
          .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
          .select("a", "b")
          .localCheckpoint()
        r += 1
      }
    }
    cur.groupBy(col("a").as("id"))
      .agg(count(lit(1)).cast("long").as("core_degree"))
  }

  /** Per-vertex triangle counts + local clustering coefficient over
    * an undirected simple graph (self-loops dropped, edges
    * deduplicated ignoring direction). cc(v) = 2·t(v) / (d(v)·(d(v)−1))
    * — exact-integer inputs, ONE IEEE division, NULL for degree < 2.
    *
    * The n³ trap and its standard fix (Suri & Vassilvitskii, WWW'11
    * — "degree orientation"): counting wedges at every vertex costs
    * Σ d(v)², quadratic at a celebrity vertex. Orienting each edge
    * from its (degree, id)-SMALLER endpoint to the larger makes every
    * triangle countable exactly once at its lowest-degree corner, and
    * bounds out-degrees by O(√m) — wedge work falls to Σ d_out(v)² =
    * O(m^1.5) regardless of skew.
    *
    * Scale shape: degrees = one grouped count; orientation is a
    * rowwise flip after a broadcast-free degree join; wedges = one
    * self-join of the oriented adjacency on the pivot; closure = one
    * hash join of wedges against oriented edges; per-vertex counts =
    * one explode + grouped sum. No windows, no driver-side adjacency,
    * no cartesian products. The oriented edge list is cached under
    * Dedup's releaseCaches() lifecycle (it feeds the wedge self-join
    * twice and the closure probe).
    *
    * Output: (id, degree, triangles, clustering) for every vertex of
    * the simple graph. */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val base = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    // canonical undirected edge set: (min, max), dedup
    val undup = base.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    val sym = undup.union(undup.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("id"))
      .agg(count(lit(1)).cast("long").as("degree"))
    // orient a→b iff (deg(a), a) < (deg(b), b)
    val withDeg = undup
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
    val oriented = Dedup.pin(withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("lo"), col("b").as("hi")))
        .otherwise(struct(col("b").as("lo"), col("a").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi")))
    // wedges at the pivot (lowest-(degree,id) corner of any triangle)
    val wedges = oriented.select(col("lo"), col("hi").as("x"))
      .join(oriented.select(col("lo"), col("hi").as("y")), Seq("lo"))
      .filter(col("x") < col("y"))
    // closure: the third side in EITHER orientation
    val closing = oriented.select(col("lo").as("x"), col("hi").as("y"))
      .union(oriented.select(col("hi").as("x"), col("lo").as("y")))
    val tris = wedges.join(closing, Seq("x", "y"))
      .select(col("lo"), col("x"), col("y"))
    val perVertex = tris
      .select(explode(array(col("lo"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).cast("long").as("triangles"))
    deg.join(perVertex, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          (col("triangles") * 2L).cast("double")
            / (col("degree") * (col("degree") - 1L)).cast("double")))
  }

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg,
    * CIKM'03): for every NON-adjacent vertex pair (a < b) with at
    * least `minCommon` shared neighbors, emit the shared-neighbor
    * count and the neighborhood-Jaccard score cn / (d(a)+d(b)−cn) —
    * the classic "these two documents aren't linked but sit in the
    * same duplicate neighborhood" candidate generator (the missing
    * edges a transitive-closure dedup would add, scored).
    *
    * Exactness: cn and both degrees are order-free integer counts;
    * Jaccard is ONE IEEE division of exact longs, so every row
    * hash-matches the SQL replay.
    *
    * Scale shape: wedges = one self-join of the symmetric adjacency
    * on the center vertex z (cost Σ d(z)² — the wedge bound shared
    * with triangleCounts; `maxDegree` drops celebrity centers, the
    * standard mitigation since a hub's co-membership carries no
    * signal); adjacency removal = one left-anti join against the
    * canonical edge set; degree decoration = two hash joins. No
    * windows, no collects, no cartesian products.
    *
    * Output: (id1, id2, cn, jaccard) with id1 < id2, non-adjacent,
    * cn ≥ minCommon. */
  def commonNeighbors(edges: DataFrame, srcCol: String = "src",
                      dstCol: String = "dst", minCommon: Long = 1L,
                      maxDegree: Long = Long.MaxValue): DataFrame = {
    val base = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val undup = Dedup.pin(base)
    val sym = undup.union(undup.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("id"))
      .agg(count(lit(1)).cast("long").as("d"))
    val centers =
      if (maxDegree == Long.MaxValue) sym
      else sym.join(deg.filter(col("d") <= maxDegree).select(col("id").as("a")), "a")
    val wedges = centers.select(col("a").as("z"), col("b").as("u"))
      .join(centers.select(col("a").as("z"), col("b").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
    val cn = wedges.groupBy("u", "v")
      .agg(count(lit(1)).cast("long").as("cn"))
      .filter(col("cn") >= minCommon)
    val nonAdj = cn.join(undup,
      cn("u") === undup("a") && cn("v") === undup("b"), "left_anti")
    nonAdj
      .join(deg.select(col("id").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("__dv")), "v")
      .select(col("u").as("id1"), col("v").as("id2"), col("cn"),
        (col("cn").cast("double")
          / (col("__du") + col("__dv") - col("cn")).cast("double")).as("jaccard"))
  }

  /** Multi-source BFS hop distance: for every node reachable from the
    * seed set within maxHops edges, the MINIMUM number of hops from
    * any seed (seeds themselves at 0). The curation read: "how far is
    * each document from a known-bad / known-gold set in the similarity
    * graph" — contamination blast-radius and label propagation by
    * distance both reduce to this.
    *
    * Classic frontier BFS (the Pregel formulation — Malewicz et al.
    * 2010), level-synchronous: visited nodes never re-enter the
    * frontier, so each round costs ONE hash join (frontier × edges on
    * src) + distinct + ONE left-anti against the visited set — all
    * key-partitioned shuffles of frontier-sized inputs, never the
    * whole graph. Every round's frontier is eagerly checkpointed
    * (the pageRank lesson: otherwise lineage nests one join tree per
    * hop). maxHops bounds rounds; the loop also exits as soon as a
    * frontier comes back empty (the isEmpty probe is a driver scalar,
    * same cost class as pageRank's node count).
    *
    * Output: (id, dist) — exact longs, a pure function of (edges,
    * seeds, maxHops); the oracle replays it as a bounded recursive
    * CTE with min(d) per node. */
  def bfsDistance(edges: DataFrame, seeds: DataFrame, seedCol: String,
                  srcCol: String = "src", dstCol: String = "dst",
                  maxHops: Int = 4, undirected: Boolean = true): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"maxHops must be in [1, 64], got $maxHops")
    graft.functions.TopKAgg.requireLongCastableId(seeds, seedCol,
      "Graph.bfsDistance")
    val e = Dedup.pin(edgeList(edges, srcCol, dstCol, undirected,
      castLong = true))
    var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(eager = true)
    var frontier = dist.select("id")
    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .localCheckpoint(eager = true)
      if (next.isEmpty) exhausted = true
      else {
        dist = dist.union(next).localCheckpoint(eager = true)
        frontier = next.select("id")
      }
      hop += 1
    }
    dist
  }

  /** Hop-bounded closeness centrality against a seed PANEL: for every
    * node, how many of the seeds it reaches within maxHops and the
    * total hop distance to them — closeness = n_reached / sum_dist,
    * the landmark-based centrality estimate (Cohen et al.'s landmark
    * idea: exact closeness needs all-pairs distances, O(n·m); a
    * fixed seed panel prices every node's "how central am I" at
    * |seeds| BFS sweeps, the standard approximation at graph scale).
    *
    * bfsDistance collapses the seed set to ONE wavefront (min over
    * seeds); this carries the (node, seed) pair through the frontier,
    * so each seed's distance survives separately — per-round state is
    * |nodes| × |seeds| rows, which is why the panel stays small and
    * is loudly bounded. Exactness: distances are exact hop longs;
    * closeness is ONE division of exact longs. A node reaching no
    * seed emits nothing; a seed's self-row (dist 0) counts in
    * n_reached but not sum_dist; nodes whose only reached seed is
    * themselves (sum_dist = 0) yield NULL closeness.
    *
    * Scale shape: bfsDistance's per-round join + distinct + anti-join
    * on (id, seed) keys, frontier checkpointed each round; one final
    * hash agg. Output: (id, n_reached, sum_dist, closeness). */
  def closenessBounded(edges: DataFrame, seeds: DataFrame, seedCol: String,
                       srcCol: String = "src", dstCol: String = "dst",
                       maxHops: Int = 4, undirected: Boolean = true,
                       maxSeeds: Int = 64): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"maxHops must be in [1, 64], got $maxHops")
    graft.functions.TopKAgg.requireLongCastableId(seeds, seedCol,
      "Graph.closenessBounded")
    val e = Dedup.pin(edgeList(edges, srcCol, dstCol, undirected,
      castLong = true))
    val seedIds = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .localCheckpoint(eager = true)
    val nSeeds = seedIds.count()
    require(nSeeds >= 1 && nSeeds <= maxSeeds,
      s"seed panel is $nSeeds — it multiplies frontier state; keep it in [1, $maxSeeds]")
    var dist = seedIds.select(col("id"), col("id").as("seed"))
      .withColumn("dist", lit(0L))
      .localCheckpoint(eager = true)
    var frontier = dist.select("id", "seed")
    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"), col("seed")).distinct()
        .join(dist.select("id", "seed"), Seq("id", "seed"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .localCheckpoint(eager = true)
      if (next.isEmpty) exhausted = true
      else {
        dist = dist.union(next).localCheckpoint(eager = true)
        frontier = next.select("id", "seed")
      }
      hop += 1
    }
    dist.groupBy("id").agg(
        count(lit(1)).cast("long").as("n_reached"),
        sum(col("dist")).cast("long").as("sum_dist"))
      .select(col("id"), col("n_reached"), col("sum_dist"),
        when(col("sum_dist") > 0L,
          col("n_reached").cast("double") / col("sum_dist").cast("double")).as("closeness"))
  }

  /** Hop-bounded single/multi-source shortest paths over NON-NEGATIVE
    * integer edge weights — Bellman-Ford relaxation (the classic
    * distributed formulation: Lynch, Distributed Algorithms §4;
    * weights as longs so every cost is exact). After round h, dist(v)
    * is the minimum cost over paths of ≤ h edges — so maxHops is a
    * semantic parameter (bounded-horizon distance), not just a
    * safety cap, and the oracle's path-enumerating recursive CTE with
    * the same hop bound computes the identical function.
    *
    * Scale shape: per round ONE hash join (current dists × edges on
    * src) + ONE min-aggregate on dst — the pageRank shuffle pair with
    * sum→min — on a pinned edge list, dists checkpointed per round.
    * Unlike bfsDistance there is no frontier shrink (a cheaper path
    * can re-improve an already-reached node), so each round joins the
    * full reached set; maxHops bounds total work.
    *
    * Output: (id, dist) for every node reachable within maxHops. */
  def ssspBounded(edges: DataFrame, seeds: DataFrame, seedCol: String,
                  srcCol: String = "src", dstCol: String = "dst",
                  wCol: String = "w", maxHops: Int = 4,
                  undirected: Boolean = true): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"maxHops must be in [1, 64], got $maxHops")
    val base = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .filter(col("src") =!= col("dst"))
    val oriented =
      if (undirected) base.union(
        base.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      else base
    val e = Dedup.pin(oriented.distinct())
    // the NON-NEGATIVE weight contract is CHECKED, not just
    // documented (review r15): with a negative weight, dist(v) after
    // h rounds keeps decreasing as maxHops grows and stops meaning
    // "shortest path"; a NULL weight makes dist + w NULL and the
    // edge silently vanishes from min(). One aggregate over the
    // already-pinned edge list — the same loud-refusal posture as
    // every other data contract in this file.
    val wRow = e.agg(count(lit(1)).as("__n"), count(col("w")).as("__nw"),
      min(col("w")).as("__mn")).head()
    if (wRow.getLong(0) > 0L) {
      require(wRow.getLong(1) == wRow.getLong(0),
        s"ssspBounded: ${wRow.getLong(0) - wRow.getLong(1)} edges have NULL " +
          s"'$wCol' — they would silently drop from every path; filter or " +
          "default them explicitly")
      require(wRow.getLong(2) >= 0L,
        s"ssspBounded: negative edge weight ${wRow.getLong(2)} in '$wCol' — " +
          "bounded Bellman-Ford distances are only shortest paths under " +
          "non-negative weights")
    }
    var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(eager = true)
    for (_ <- 1 to maxHops) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint(eager = true)
    }
    dist
  }

  /** HITS hubs & authorities (Kleinberg 1999) with a fixed number of
    * mutual-reinforcement rounds on a DIRECTED edge list: per round,
    * auth'(v) = Σ_{u→v} hub(u) then hub'(u) = Σ_{u→v} auth'(v) —
    * the bipartite-taste dual of pageRank (a good hub points at good
    * authorities; on a customer→product graph, hub = breadth of
    * taste, authority = breadth of appeal). Scores are UNNORMALIZED:
    * the per-round L1/L2 normalizer is a rank-invariant global
    * scalar, and computing it exactly would mean folding every node's
    * score into one row — the one shape this file never ships.
    * Magnitudes stay bounded (≈ degree^iters) for the fixed small
    * round counts this is for.
    *
    * Scale shape (r19 rewrite — VERDICT r18 item 2, the suite's worst
    * 8-vs-32-core scaler): scores iterate SPARSE. A node absent from
    * a round's sum frame holds exact 0.0, and adding 0.0 to any
    * non-negative partial sum is bit-exact identity (0.0+0.0 = 0.0,
    * 0.0+x = x; array_sort puts the zeros FIRST, so every later
    * partial sum is unchanged too) — the same IEEE-no-op argument the
    * old per-round re-anchor comment already made, now used to DELETE
    * the re-anchor: per round ONE hash join + grouped sum over the
    * pinned edge list (pageRank's shape), not join+sum+node-anchor
    * twice. The zeros materialize once, in the final lazy plan
    * (node-list left joins + coalesce 0). Only frames a LATER round
    * consumes are checkpointed: the intermediate auth frame inlines
    * into its round's hub job (lineage depth stays ≤ 2 joins from the
    * last checkpoint), the last round's auth frame is checkpointed
    * because the output reads it too. Net per round: 2 joins + 1
    * eager barrier fewer at ANY scale — and at bench scale, fewer of
    * the tiny-task barriers that made 32 cores 3.7× slower than 8.
    * sortedFold as in pageRank: true = bit-exact oracle twin, false =
    * partial-agg scale path; both modes are bit-identical to the
    * dense iteration (GraphSpec pins it).
    *
    * Output: (id, auth, hub) for every node. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2, sortedFold: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    val e = Dedup.pin(edgeList(edges, srcCol, dstCol, undirected = false,
      castLong = true))
    val nodes = Dedup.pin(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    def foldedSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (sortedFold)
        graft.functions.VectorOps.foldSum(array_sort(collect_list(c)))
      else sum(c)
    // auths is DERIVED from hubs at the top of every round — HITS has
    // no meaningful initial auth vector, so none is seeded (review
    // r15: the old lit(0.0) auth init was dead, overwritten before
    // first read); the fold makes that structural
    val init = nodes.select(col("id"), lit(1.0).as("hub"))
    val (auths, hubs) = (1 to iters).foldLeft((init, init)) {
      case ((_, hubsPrev), round) =>
        val aSums = e.join(hubsPrev.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id")).agg(foldedSum(col("hub")).as("auth"))
        // checkpoint only what two consumers read: the final round's
        // auth frame feeds both this round's hub sums and the output
        val a = if (round == iters) aSums.localCheckpoint(eager = true)
                else aSums
        val hSums0 = e.join(a.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id")).agg(foldedSum(col("auth")).as("hub"))
        // the final round's hub frame has one consumer (the returned
        // plan) — leave it lazy, like pageRank's final round (r19)
        val hSums = if (round == iters) hSums0
                    else hSums0.localCheckpoint(eager = true)
        (a, hSums)
    }
    nodes.join(auths, Seq("id"), "left").join(hubs, Seq("id"), "left")
      .select(col("id"), coalesce(col("auth"), lit(0.0)).as("auth"),
        coalesce(col("hub"), lit(0.0)).as("hub"))
  }
}
